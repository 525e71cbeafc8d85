"""Relational query plans over the testdata star schema.

The reference exposes no general query surface (SURVEY.md §2.2: no
filters/WHERE on the Spark path at all) — it gets select/join/groupBy
implicitly through PySpark. Our engine makes the full relational surface
first-class: scan → filter (pushed to parquet) → project (pruned) →
join (broadcast dims) → aggregate (partial+final) → window → sort/limit,
all declarative so Catalyst + AQE choose the physical plan.

Each function takes (spark, sf_dir) and returns a lazy DataFrame; the
matching DuckDB oracle SQL lives in ``__spark_entry__.oracle_sql``.
Aggregate outputs are rounded to 6 decimals so engine/oracle float
summation-order differences cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..sources.io import load_table


def _r6(c):
    return F.round(c, 6)


def dsum(c):
    """Order-independent big sum: cast each addend to DECIMAL(18,6)
    (per-row, deterministic IEEE→decimal rounding), sum in DECIMAL
    (associative — partial-aggregation order can't change the result),
    return DOUBLE. Plain double sums over ~10⁶ rows differ between
    engines in the last ulp, which at 10⁹-scale totals IS the 6th
    decimal — measured: q1's sf0.1 sum_disc_price hash-diverged from
    the DuckDB oracle by 1e-6 until this. At 100 TB this is the only
    reproducible way to aggregate currency."""
    return F.sum(c.cast("decimal(18,6)")).cast("double")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy on lineitem.

    Filter + the 4 sums/3 avgs all stay in whole-stage codegen; partial
    aggregation makes the shuffle carry only |returnflag × linestatus|
    rows per task regardless of input size. Sums and averages run in
    DECIMAL (see dsum) so the result is identical under any partial-
    aggregation order — TPC-H money is decimal semantics anyway."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r6(dsum(F.col("l_quantity"))).alias("sum_qty"),
            _r6(dsum(F.col("l_extendedprice"))).alias("sum_base_price"),
            _r6(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price"
            ),
            _r6(
                dsum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            _r6(dsum(F.col("l_quantity")) / n).alias("avg_qty"),
            _r6(dsum(F.col("l_extendedprice")) / n).alias("avg_price"),
            _r6(dsum(F.col("l_discount")) / n).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered 3-way join + top-N by revenue.

    customer is small relative to lineitem → broadcast; orders×lineitem
    is the one real shuffle, on l_orderkey.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _r6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join through nation/region.

    region/nation/customer/supplier are all dimension-sized → broadcast
    chain; only orders⋈lineitem shuffles.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _r6(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate must
    appear in the parquet PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_r6(dsum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-items revenue per customer, top 20."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1993-10-01"))
        & (F.col("o_orderdate") < F.lit("1994-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            _r6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: having-filter on an aggregate, then join back.

    The inner aggregate keyed on l_orderkey reuses the same hash
    partitioning as the subsequent join — no extra shuffle under AQE.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            _r6(F.col("sum_qty")).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: top-3 parts by revenue within each brand.

    Per-group top-k via row_number over a partitioned window — the same
    pattern the reference needs ALS's recommendForAllUsers for
    (usage_examples.ipynb cells 34-35); partitionBy keeps it parallel.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            _r6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .join(broadcast(part), F.col("l_partkey") == part.p_partkey)
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        rev.withColumn("brand_rank", F.row_number().over(w))
        .filter(F.col("brand_rank") <= 3)
        .select("p_brand", "p_partkey", "revenue", "brand_rank")
        .orderBy("p_brand", "brand_rank")
    )


def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders with at least one
    returned lineitem, counted per priority. left_semi never
    duplicates or widens rows, so no distinct needed afterwards."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1993-07-01"))
        & (F.col("o_orderdate") < F.lit("1993-10-01"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )
