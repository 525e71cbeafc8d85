"""Further TPC-H-shaped plans adapted to the testdata schema (it lacks
partsupp/shipmode/commitdate, so the classic queries are re-expressed
over the columns that exist while keeping each query's *shape*: the
join topology, correlation pattern, or predicate structure that makes
it interesting to an optimizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..sources.io import load_table
from .relational import dsum


def _r6(c):
    return F.round(c, 6)


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation × customer-nation trade volume
    per year (two independent dim paths onto the same fact rows)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            _r6(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "volume"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp → profit ≈ discounted revenue minus
    a retail-price cost proxy), grouped by supplier nation and year."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("ol")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .join(broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(
            _r6(
                dsum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - F.col("p_retailprice") * F.col("l_quantity") * 0.1
                )
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


def q12_priority_by_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts (high/low priority) over a
    date-windowed fact join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01"))
        & (F.col("l_shipdate") < F.lit("1995-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio (share of revenue from
    'PROMO%'-typed parts) in one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            _r6(
                F.lit(100.0)
                * dsum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0)))
                / dsum(rev)
            ).alias("promo_revenue_pct")
        )
    )


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive brand/size/quantity clauses —
    the disjunctive-predicate pushdown stress test."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(broadcast(part), li.l_partkey == part.p_partkey)
    clause1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 20))
    )
    clause2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity").between(10, 40))
    )
    # decimal sum: order-independent at any scale (see relational.dsum)
    return j.filter(clause1 | clause2).agg(
        _r6(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window surface (lag/lead): per event, seconds since the
    user's previous event and until the next one. Ties broken by
    event_id so both engines sequence identically."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    return ev.select(
        "user_id",
        "event_id",
        (sec - F.lag(sec).over(w)).alias("gap_prev_s"),
        (F.lead(sec).over(w) - sec).alias("gap_next_s"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube): flag
    totals and status totals in one pass, no cross terms."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _r6(dsum(F.col("l_extendedprice"))).alias("sum_price"),
        )
    )


def q_user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the distinct event types each user produced,
    as a canonical sorted comma-joined string (portable across engines,
    unlike raw array stringification)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("event_type")), ","
            ).alias("event_types"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: explode tokens, count, rank top 50 — the
    text-pipeline token-frequency primitive (map-side partial counts
    keep the shuffle at |vocab|)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 50)
    )


def q_correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: Pearson correlation and sample
    covariance between quantity and price per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            _r6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
            _r6(F.covar_samp("l_quantity", "l_extendedprice")).alias(
                "covar_qty_price"
            ),
            _r6(F.stddev_samp("l_extendedprice")).alias("std_price"),
            _r6(F.var_samp("l_quantity")).alias("var_qty"),
        )
        .orderBy("l_returnflag")
    )


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier trimming (winsorize-by-filter): per-group [p05, p95]
    bounds from an exact percentile aggregate, broadcast back to filter
    the fact rows, then stats over the surviving mass — the data-
    cleaning prefilter pattern, two aggregates and one broadcast join."""
    li = load_table(spark, sf_dir, "lineitem")
    # array-form percentile: one sort buffer for both bounds (the same
    # measured ~2x as q_quantiles_by_flag / quantiles_approx)
    bounds = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.05, 0.95))"
        ).alias("ps")
    ).select(
        "l_returnflag",
        F.col("ps")[0].alias("p05"),
        F.col("ps")[1].alias("p95"),
    )
    trimmed = li.join(broadcast(bounds), "l_returnflag").filter(
        (F.col("l_extendedprice") >= F.col("p05"))
        & (F.col("l_extendedprice") <= F.col("p95"))
    )
    return (
        trimmed.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            _r6(F.avg("l_extendedprice")).alias("trimmed_mean"),
            _r6(F.min("l_extendedprice")).alias("trimmed_min"),
            _r6(F.max("l_extendedprice")).alias("trimmed_max"),
        )
        .orderBy("l_returnflag")
    )


def q_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: close part-name pairs (edit distance ≤ 4)
    within (brand, size) blocks — the blocked-levenshtein entity-
    resolution pattern; blocking keeps the candidate set at cell
    occupancy, never catalog²."""
    part = load_table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_brand"), F.col("p_size"),
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_brand"), F.col("p_size"),
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"),
    )
    pairs = (
        a.join(b, ["p_brand", "p_size"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 4)
    )
    return (
        pairs.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_close_pairs"),
            F.round(F.avg("dist"), 6).alias("avg_dist"),
            F.min("dist").alias("min_dist"),
        )
        .orderBy("p_brand")
    )


def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction (portable subset): pull the numeric id out
    of c_name, verify it round-trips to the key, bucket by last digit."""
    cust = load_table(spark, sf_dir, "customer")
    extracted = cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1)
        .cast("long")
        .alias("name_id"),
    )
    return (
        extracted.withColumn(
            "id_matches", F.col("name_id") == F.col("c_custkey")
        )
        .groupBy((F.col("c_custkey") % 10).alias("last_digit"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("id_matches").cast("long")).alias("n_matching"),
        )
        .orderBy("last_digit")
    )


def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame window: per order day, revenue summed over a 3-day
    trailing RANGE (value-based frame over the day number — includes
    absent days implicitly, unlike a rows frame)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day"),
    ).agg(F.round(dsum(F.col("o_totalprice")), 6).alias("revenue"))
    daily = daily.withColumn(
        "day_num", (F.unix_timestamp("day") / 86400).cast("long")
    )
    w = Window.orderBy("day_num").rangeBetween(-2, 0)
    return daily.select(
        "day",
        "revenue",
        F.round(F.sum("revenue").over(w), 6).alias("rolling_3d_revenue"),
    )


def q_pivot_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static pivot: explicit value list, so no driver-side distinct
    scan and no column-explosion cliff — the scale-safe form of the
    reference's dynamic groupBy().pivot() (SURVEY §4.3.6). Quantity
    totals per nation × returnflag."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 6))
        .select(
            "n_name",
            F.col("A").alias("qty_a"),
            F.col("N").alias("qty_n"),
            F.col("R").alias("qty_r"),
        )
        .orderBy("n_name")
    )


def q_customer_spend_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-analytics surface: rank / percent_rank / cume_dist /
    ntile over per-customer total spend. One aggregate then one
    global-ordered window over the (customer-sized) aggregate."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 6).alias("total_spend")
    )
    w = Window.orderBy(F.desc("total_spend"), F.asc("o_custkey"))
    return spend.select(
        "o_custkey",
        "total_spend",
        F.rank().over(w).cast("long").alias("spend_rank"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


def q_events_resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap filling: hourly event counts per
    type over the DENSE calendar (empty hours present with 0) —
    the downsample-then-densify op dashboards and models need.

    The dense axis is generated (sequence over the observed bound, a
    2-row aggregate), cross-joined with the type dimension, then
    left-joined with the sparse counts: no driver-side calendar, and
    the generated side is |hours| × |types| — bounded by time range,
    not data volume."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    types = ev.select("event_type").distinct()
    dense = hours.crossJoin(broadcast(types))
    return dense.join(counts, ["hour_start", "event_type"], "left").select(
        "hour_start",
        "event_type",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    per week-offset of later activity — two aggregates and one
    broadcast join (the cohort table is user-sized)."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        active.join(broadcast(first), "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel over the event stream: users who signed
    up, then clicked at or after their first signup, then purchased at
    or after that first click. Three chained min-aggregates, each
    broadcast back onto the (filtered) events — no sessionization state,
    no window over the full stream."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(broadcast(s), "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(broadcast(c), "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(broadcast(c.agg(F.count(F.lit(1)).alias("n_click_after"))))
        .crossJoin(
            broadcast(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
        )
    )


def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar correlated aggregate (above-average
    balance) + NOT EXISTS, grouped by a derived key. The scalar avg is
    a broadcast 1-row cross join, the NOT EXISTS a left_anti."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 18, 1).alias("name_digit"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            _r6(dsum(F.col("c_acctbal"))).alias("total_bal"),
        )
        .orderBy("name_digit")
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-sequence mining: per user (ordered by ts with
    event_id tiebreak), count each (event_type → next event_type)
    transition and its conditional probability — the Markov-matrix view
    of the event stream. One window pass + one aggregate; the
    transition table is |types|² (broadcast-scale) at any corpus size."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wf), 6).alias("p"),
    )


def q_first_last_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-history frame: first/last order date and the
    price of those orders, via first_value/last_value over an
    UNBOUNDED-to-UNBOUNDED frame (the default last_value frame stops at
    CURRENT ROW — a classic silent-wrong-answer; the explicit frame is
    the point of this query). Window partitions by customer, so state
    is per-customer and the plan is one shuffle at any scale."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.first("o_orderdate").over(w).alias("first_date"),
            F.last("o_orderdate").over(w).alias("last_date"),
            F.round(F.first("o_totalprice").over(w), 6).alias("first_price"),
            F.round(F.last("o_totalprice").over(w), 6).alias("last_price"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_orders"),
        )
        .distinct()
    )


def q_revenue_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE calendar days whose
    daily revenue beats the all-time daily median; top-10 streaks by
    length. The island key is the classic date − row_number trick; both
    windows run over the DAY-level aggregate (calendar-bounded, a few
    thousand rows at any SF), never the order table. Daily revenue is
    rounded before the median compare so the above/below classification
    is bit-stable across engines."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy("o_orderdate").agg(
        F.round(F.sum("o_totalprice"), 6).alias("rev")
    )
    med = daily.agg(F.percentile("rev", F.lit(0.5)).alias("m"))
    hot = daily.crossJoin(broadcast(med)).filter(F.col("rev") > F.col("m"))
    w = Window.orderBy("o_orderdate")
    isl = hot.withColumn("rn", F.row_number().over(w)).withColumn(
        "grp", F.expr("date_sub(o_orderdate, rn)")
    )
    streaks = isl.groupBy("grp").agg(
        F.min("o_orderdate").alias("streak_start"),
        F.max("o_orderdate").alias("streak_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.sum("rev"), 6).alias("total_rev"),
    )
    wtop = Window.orderBy(F.desc("n_days"), F.asc("streak_start"))
    return (
        streaks.withColumn("rnk", F.row_number().over(wtop).cast("bigint"))
        .filter(F.col("rnk") <= 10)
        .select("streak_start", "streak_end", "n_days", "total_rev", "rnk")
    )
