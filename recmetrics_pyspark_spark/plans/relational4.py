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
from .relational import dsum


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
            _r6(dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — conditional-aggregate market share: one
    nation's revenue fraction of the total per year (sum(CASE)/sum —
    the two-level aggregate over one join tree)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _r6(
                dsum(F.when(F.col("n_name") == "FRANCE", vol).otherwise(F.lit(0.0)))
                / dsum(vol)
            ).alias("mkt_share"),
            _r6(dsum(vol)).alias("total_volume"),
        )
        .orderBy("o_year")
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — group total vs a GLOBAL-fraction threshold
    (correlated HAVING decorrelated into a one-row broadcast): parts
    whose revenue exceeds 0.01% of all revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(vol).alias("part_value"))
    total = per_part.agg(
        (F.sum("part_value") * 0.0001).alias("cutoff")
    )
    return (
        per_part.crossJoin(broadcast(total))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select("l_partkey", _r6(F.col("part_value")).alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — view + scalar-max join-back: the supplier(s)
    achieving the maximum quarterly revenue (the revenue 'view' is a
    grouped aggregate; the max is a one-row broadcast; equality
    join-back returns all argmax rows)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        _r6(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "l_suppkey",
            F.col("s_name").alias("supplier"),
            "total_revenue",
        )
        .orderBy("l_suppkey")
    )


def q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — distinct-count after an anti join: suppliers
    per (brand, type-prefix, size) over small parts, EXCLUDING
    below-average-balance suppliers (the NOT IN decorrelated into a
    broadcast left-anti join)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    sup = load_table(spark, sf_dir, "supplier")
    bal_cut = sup.agg(F.avg("s_acctbal").alias("cut"))
    excluded = sup.crossJoin(broadcast(bal_cut)).filter(
        F.col("s_acctbal") < F.col("cut")
    )
    kept = li.join(
        excluded.select("s_suppkey"),
        li.l_suppkey == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        kept.join(broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            F.substring("p_type", 1, 6).alias("p_type_prefix"),
            "p_size",
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            "p_brand",
            "p_type_prefix",
            "p_size",
        )
    )


def q20_candidate_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — nested semi-join chain: suppliers who shipped
    a high-quantity line (≥ 45) of a small part in 1996 (part-filter →
    lineitem-filter → supplier semi join, each leg pruning the next)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_quantity") >= 45)
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    sup = load_table(spark, sf_dir, "supplier")
    qualifying = li.join(
        broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    return (
        sup.join(
            qualifying.select(F.col("l_suppkey").alias("qk")).distinct(),
            sup.s_suppkey == F.col("qk"),
            "left_semi",
        )
        .select(
            "s_suppkey", F.col("s_name").alias("supplier"), "s_acctbal"
        )
        .orderBy("s_suppkey")
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
