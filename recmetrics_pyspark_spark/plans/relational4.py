"""Round-3 TPC-H-shaped plans: the four classic correlation patterns
still missing from the relational surface — groupwise-min join-back
(Q2), outer-join count distribution (Q13), avg-correlated scalar
subquery (Q17), and exists / not-exists double correlation (Q21) —
adapted to the testdata schema (no partsupp / receiptdate / comment;
each query keeps the reference shape's join topology and correlation
structure, which is what exercises the optimizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..sources.io import load_table


def _r6(c):
    return F.round(c, 6)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — groupwise minimum with join-back: for each
    small part, the supplier rows achieving the part's minimum
    extended price (the correlated scalar-min subquery, decorrelated
    into a grouped aggregate + equi-join, which is exactly what an
    optimizer should do with Q2).

    Scale: the per-part min is a fact-scale aggregate onto part scale;
    the join-back is fact ⋈ broadcast(part-scale min table); dims
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    sup = load_table(spark, sf_dir, "supplier")
    costs = li.join(
        broadcast(part.select("p_partkey", "p_name")),
        li.l_partkey == F.col("p_partkey"),
    )
    min_cost = costs.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        costs.join(
            broadcast(min_cost),
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("s_name").alias("supplier"),
            F.col("s_acctbal").alias("acctbal"),
            _r6(F.col("min_price")).alias("min_price"),
        )
        .orderBy(F.asc("p_partkey"), F.asc("supplier"))
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — outer join + double aggregation: count
    non-urgent orders per customer INCLUDING zero-order customers
    (left join), then the distribution of customers per order count.

    Scale: one customer⋈orders shuffle (orders filtered at the scan),
    then two key-scale aggregates."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — avg-correlated scalar subquery: yearly-ized
    revenue of Brand#1 lineitems whose quantity is below 20% of that
    part's average quantity. The correlation decorrelates into a
    per-part avg + broadcast join back onto the fact.

    Scale: per-part avg is fact→part-scale; the brand filter prunes the
    join-back side to a broadcastable slice."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    )
    branded = li.join(
        broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
    )
    avg_qty = branded.groupBy(F.col("p_partkey").alias("ak")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        branded.join(broadcast(avg_qty), F.col("p_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            _r6(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q21_sole_latest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — exists + not-exists double correlation: in
    finalized multi-supplier orders, suppliers whose line ships
    strictly last (another supplier EXISTS on the order; NO OTHER
    supplier shipped later). Expressed as a left-semi join (exists)
    plus a left-anti join (not exists) — the decorrelation Spark plans
    as two shuffled semi/anti joins on the order key.

    Scale: all three join legs are fact-on-orderkey shuffles; no
    nested-loop correlation survives."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = load_table(spark, sf_dir, "supplier")
    l1 = li.join(
        orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
    ).select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = l1.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    exists_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2"))
        & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    sole_latest = exists_other.join(
        l3,
        (F.col("l_orderkey") == F.col("o3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("d3") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        sole_latest.join(broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("supplier"))
    )
