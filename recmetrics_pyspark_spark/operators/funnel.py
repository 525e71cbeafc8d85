"""Product-analytics operators over event streams: ordered funnels and
cohort retention — the two queries every event warehouse runs daily.

Reference parity note: the reference engine's event-table workflows
(SURVEY.md §2.11 sessionization / window families) stop at sessions;
these extend the same events surface with the standard conversion
analyses, built purely from joins/aggregates so Catalyst plans them
like any other relational query.

Scale design (100 TB of events):
- funnel_conversion: one per-user conditional aggregate per step, each
  a (user)-keyed shuffle whose input SHRINKS step over step (only
  users that completed step k-1 are joined against step-k events, and
  the step-k event scan is filtered to that step's event type before
  the join). No windows, no per-user sort, no event×event self-join.
- cohort_retention: one distinct over (user, week) — activity
  collapses to user-week grain BEFORE any join — plus a user-scale
  first-event aggregate; the cohort table joins user-keyed. Output is
  cohorts × offsets (calendar-bounded, tiny at any corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    col_user: str = "user_id",
    col_ts: str = "ts",
    col_type: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: a user converts step k iff they have a
    step-k event at or after their earliest step-(k-1) conversion
    time (first-touch semantics: each step binds to the EARLIEST
    qualifying event, the standard warehouse funnel definition).

    Returns one row per step: ``step_idx``, ``step``, ``n_users``,
    ``rate_from_first`` and ``rate_from_prev`` (conversion rates,
    rounded; 1.0 for the first step).

    Each step is one filtered aggregate joined user-keyed against the
    previous step's (user, ts) table — the per-step join input is
    bounded by the surviving user set, so the funnel narrows the work
    exactly as it narrows the users. Entirely declarative: the whole
    funnel is ONE returned plan (no per-step driver actions); each
    step's survivor table is lazily localCheckpoint-ed so the union of
    step counts pays every join once, not once per downstream step —
    and, unlike ``.persist()``, the checkpoint blocks are reclaimed by
    the ContextCleaner once the returned DataFrame is garbage
    collected, so repeated funnel calls in a long session never
    accumulate entries in the CacheManager. The final rate
    computation windows over ≤ len(steps) rows — constant.

    Cluster-deployment tradeoff: ``localCheckpoint`` TRUNCATES lineage
    — its blocks live only on executors, so an executor loss mid-job
    fails the job (no recompute path) where ``.persist()`` would
    recover from lineage. On a multi-tenant cluster with preemption,
    prefer reliable ``sparkContext.setCheckpointDir`` + ``.checkpoint``
    or ``.persist()`` with an explicit ``unpersist`` after collection;
    local/driver-session use (this repo's bench/driver harness) keeps
    the reclaimable localCheckpoint."""
    if not steps:
        raise ValueError("steps must be non-empty")
    from pyspark.sql.window import Window

    ev = events.select(
        F.col(col_user).alias("u"),
        F.col(col_ts).alias("t"),
        F.col(col_type).alias("et"),
    )
    # step 1: earliest matching event per user
    cur = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t0"))
        .localCheckpoint(eager=False)
    )
    step_tables = [cur]
    for step in steps[1:]:
        nxt = ev.filter(F.col("et") == step).select(
            "u", F.col("t").alias("t_step")
        )
        cur = (
            cur.join(nxt, "u")
            .filter(F.col("t_step") >= F.col("t0"))
            .groupBy("u")
            .agg(F.min("t_step").alias("t0"))
            .localCheckpoint(eager=False)
        )
        step_tables.append(cur)
    reach = step_tables[0].select("u", F.lit(1).alias("step_idx"))
    for i, t in enumerate(step_tables[1:], start=2):
        reach = reach.unionByName(
            t.select("u", F.lit(i).alias("step_idx"))
        )
    per_step = reach.groupBy("step_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    names = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step_idx INT, step STRING",
    )
    w_all = Window.partitionBy(F.lit(1))
    w_ord = w_all.orderBy("step_idx")
    return (
        # LEFT join from the complete step list: a step no user
        # converted still emits its row with n_users=0 (its rates are
        # 0, or NULL when the previous step is also empty — 0/0, the
        # same NULL both engines produce)
        names.join(per_step, "step_idx", "left")
        .withColumn(
            "n_users", F.coalesce("n_users", F.lit(0).cast("bigint"))
        )
        .select(
            "step_idx",
            "step",
            "n_users",
            # try_divide: an empty step divides by 0 (NULL on both
            # engines) — plain `/` would raise under ANSI mode
            F.round(
                F.try_divide(
                    F.col("n_users"),
                    F.max(
                        F.when(F.col("step_idx") == 1, F.col("n_users"))
                    ).over(w_all),
                ),
                6,
            ).alias("rate_from_first"),
            F.round(
                F.try_divide(
                    F.col("n_users"),
                    F.coalesce(
                        F.lag("n_users").over(w_ord), F.col("n_users")
                    ),
                ),
                6,
            ).alias("rate_from_prev"),
        )
        .orderBy("step_idx")
    )


def cohort_retention(
    events: DataFrame,
    cohort_type: str = "signup",
    col_user: str = "user_id",
    col_ts: str = "ts",
    col_type: str = "event_type",
    max_offset: int = 8,
) -> DataFrame:
    """Weekly cohort retention matrix: cohort = calendar week
    (Monday-truncated) of the user's FIRST ``cohort_type`` event;
    retention at offset k = share of the cohort with ANY event in
    cohort week + k. Offset 0 is 1.0 by construction (the cohort
    event itself is activity). Returns (cohort_week, week_offset,
    n_active, cohort_size, retention) for offsets 0..max_offset
    observed in the data."""
    ev = events.select(
        F.col(col_user).alias("u"),
        F.date_trunc("week", F.col(col_ts)).cast("date").alias("wk"),
        F.col(col_type).alias("et"),
    )
    cohorts = (
        ev.filter(F.col("et") == cohort_type)
        .groupBy("u")
        .agg(F.min("wk").alias("cohort_week"))
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    # user-week activity grain FIRST: the big table collapses before
    # the user-keyed cohort join
    active = ev.select("u", "wk").distinct()
    return (
        active.join(cohorts, "u")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("wk"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
            "u",
        )
        .filter(
            (F.col("week_offset") >= 0)
            & (F.col("week_offset") <= max_offset)
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("u").alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


def rfm_segments(
    orders: DataFrame,
    col_cust: str = "o_custkey",
    col_date: str = "o_orderdate",
    col_amount: str = "o_totalprice",
    n_bins: int = 5,
) -> DataFrame:
    """RFM customer segmentation: quintile-bin every customer on
    Recency (days since last order, vs the corpus max date), Frequency
    (order count) and Monetary (total spend), then report segment
    occupancy and average spend — the classic CRM segmentation, built
    the scale-safe way:

    - per-customer aggregate is the ONLY corpus-scale shuffle;
    - the 3×(n_bins-1) quantile cutoffs are ONE exact-percentile
      aggregate row broadcast back (the quantile_normalize /
      balanced_sample rule: never a per-dimension ntile window sort);
    - binning is a scan-side array comparison (count of cutoffs below
      the value);
    - monetary is summed in DECIMAL(18,6) so segment averages are
      partition-order independent.

    Bin index = raw quantile bin (0..n_bins-1) on each dimension —
    note recency bin 0 is the MOST recent customers (fewest days)."""
    per = orders.groupBy(col_cust).agg(
        F.max(col_date).alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.col(col_amount).cast("decimal(18,6)")).alias("m_dec"),
    )
    mx = orders.agg(F.max(col_date).alias("max_date"))
    rfm = per.crossJoin(F.broadcast(mx)).select(
        F.col(col_cust),
        F.datediff("max_date", "last_order").alias("recency_days"),
        "frequency",
        F.round(F.col("m_dec").cast("double"), 2).alias("monetary"),
        "m_dec",
    )
    qs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    cuts = rfm.agg(
        F.expr(f"percentile(recency_days, array({qs}))").alias("rc"),
        F.expr(f"percentile(frequency, array({qs}))").alias("fc"),
        F.expr(f"percentile(monetary, array({qs}))").alias("mc"),
    )

    def _bin(col, cuts_col):
        return (
            F.size(F.filter(cuts_col, lambda c: F.col(col) > c))
            .cast("int")
        )

    return (
        rfm.crossJoin(F.broadcast(cuts))
        .select(
            _bin("recency_days", "rc").alias("r_bin"),
            _bin("frequency", "fc").alias("f_bin"),
            _bin("monetary", "mc").alias("m_bin"),
            "m_dec",
        )
        .groupBy("r_bin", "f_bin", "m_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                F.sum("m_dec").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_monetary"),
        )
        .orderBy("r_bin", "f_bin", "m_bin")
    )


def conversion_latency(
    events: DataFrame,
    step_from: str = "view",
    step_to: str = "purchase",
    col_user: str = "user_id",
    col_ts: str = "ts",
    col_type: str = "event_type",
) -> DataFrame:
    """Time-to-convert distribution: for every user, latency from the
    FIRST ``step_from`` event to the first ``step_to`` event at or
    after it (same strict ordering as funnel_conversion's step
    binding), reported as one summary row — converted-user count and
    exact latency percentiles (p25/p50/p75/p90, seconds) plus the
    mean.

    Scale shape: two user-keyed aggregates (the second's input is
    pre-filtered to users who completed ``step_from``), then a ONE-ROW
    percentile aggregate over user-scale latencies — integer seconds,
    summed in DECIMAL for the mean, so every output is
    partition-order independent."""
    ev = events.select(
        F.col(col_user).alias("u"),
        F.col(col_ts).alias("t"),
        F.col(col_type).alias("et"),
    )
    first_a = (
        ev.filter(F.col("et") == step_from)
        .groupBy("u")
        .agg(F.min("t").alias("t0"))
    )
    lat = (
        first_a.join(
            ev.filter(F.col("et") == step_to).select(
                "u", F.col("t").alias("t1")
            ),
            "u",
        )
        .filter(F.col("t1") >= F.col("t0"))
        .groupBy("u")
        # t0 is constant within the group (one first_a row per user);
        # min() just picks it deterministically
        .agg(F.min("t1").alias("t1"), F.min("t0").alias("t0"))
        .select(
            (
                F.unix_timestamp("t1") - F.unix_timestamp("t0")
            ).alias("latency_sec")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(latency_sec, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(latency_sec, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(latency_sec, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(latency_sec, 0.9)"), 6).alias("p90"),
        F.round(
            F.sum(F.col("latency_sec").cast("decimal(18,6)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mean_sec"),
    )


def wow_trending(
    events: DataFrame,
    event_type: str = "purchase",
    top_k: int = 20,
    col_ts: str = "ts",
    col_type: str = "event_type",
    col_key: str = "user_id",
) -> DataFrame:
    """Week-over-week trending keys: weekly event counts per key with
    the delta and ratio against the key's PREVIOUS observed week
    (lag over the key-partitioned week series), ranked by absolute
    delta — the "top risers/fallers" feed every analytics dashboard
    carries.

    Scale shape: events collapse to (key, week) grain in one
    aggregate; the lag window runs over the key×weeks table
    (calendar-bounded groups); global top-k via orderBy+limit.
    ``ratio`` is NULL for a key's first observed week (both engines).
    Deltas are exact integers."""
    from pyspark.sql.window import Window

    weekly = (
        events.filter(F.col(col_type) == event_type)
        .groupBy(
            F.col(col_key).alias("key"),
            F.date_trunc("week", F.col(col_ts)).cast("date").alias("wk"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wlag = Window.partitionBy("key").orderBy("wk")
    wk_rank = Window.orderBy(
        F.desc(F.abs(F.col("delta"))), F.asc("key"), F.asc("wk")
    )
    scored = weekly.select(
        "key",
        F.col("wk").cast("string").alias("week"),
        "n",
        (F.col("n") - F.lag("n").over(wlag)).alias("delta"),
        F.round(
            F.try_divide(F.col("n"), F.lag("n").over(wlag)), 6
        ).alias("ratio"),
    ).filter(F.col("delta").isNotNull())
    return (
        scored.orderBy(
            F.desc(F.abs(F.col("delta"))), F.asc("key"), F.asc("week")
        )
        .limit(top_k)
        .withColumn(
            "rnk",
            F.row_number()
            .over(
                Window.orderBy(
                    F.desc(F.abs(F.col("delta"))),
                    F.asc("key"),
                    F.asc("week"),
                )
            )
            .cast("bigint"),
        )
    )


def churn_training_set(
    events: DataFrame,
    horizon_days: int = 7,
    col_user: str = "user_id",
    col_ts: str = "ts",
    col_type: str = "event_type",
) -> DataFrame:
    """Leakage-safe churn-model training set: features come strictly
    from BEFORE the cutoff (corpus max timestamp minus
    ``horizon_days``), the label strictly from AFTER it — the split
    that makes the label learnable instead of leaked. Per user with
    any pre-cutoff activity:

    - features: total events, purchases, distinct active days, days
      from last pre-cutoff event to the cutoff (recency)
    - label ``churned``: TRUE iff the user has NO event in the
      horizon window (cutoff, max].

    Scale shape: the cutoff is a one-row broadcast (max aggregate);
    feature and label aggregates are each ONE user-keyed shuffle over
    a scan-side-filtered pass, joined user-keyed. Exact integers
    everywhere — no float in the table at all."""
    bounds = events.agg(
        F.max(col_ts).alias("max_ts"),
    ).select(
        "max_ts",
        F.timestamp_add(
            "DAY", F.lit(-horizon_days), F.col("max_ts")
        ).alias("cutoff"),
    )
    ev = events.select(
        F.col(col_user).alias("u"),
        F.col(col_ts).alias("t"),
        F.col(col_type).alias("et"),
    ).crossJoin(F.broadcast(bounds))
    feats = (
        ev.filter(F.col("t") < F.col("cutoff"))
        .groupBy("u")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.when(F.col("et") == "purchase", 1).otherwise(0)
            ).cast("bigint").alias("n_purchases"),
            F.count_distinct(F.to_date("t")).cast("bigint").alias(
                "n_active_days"
            ),
            F.datediff(
                F.to_date(F.max("cutoff")), F.to_date(F.max("t"))
            ).cast("int").alias("recency_days"),
        )
    )
    active_after = (
        ev.filter(F.col("t") >= F.col("cutoff"))
        .select("u")
        .distinct()
        .withColumn("seen_after", F.lit(1))
    )
    return (
        feats.join(active_after, "u", "left")
        .select(
            F.col("u").alias("user_id"),
            "n_events",
            "n_purchases",
            "n_active_days",
            "recency_days",
            F.col("seen_after").isNull().alias("churned"),
        )
        .orderBy("user_id")
    )


def repurchase_intervals(
    purchases: DataFrame,
    k: int = 20,
    col_user: str = "user",
    col_item: str = "item",
    col_date: str = "dt",
) -> DataFrame:
    """Per-item repurchase cadence: the distribution of day gaps
    between a user's CONSECUTIVE purchases of the same item — the
    replenishment signal behind reorder reminders and
    inventory-cadence forecasts, which no existing retention query
    (cohort, KM survival, RFM) exposes at item grain.

    Per (user, item), purchase dates collapse to distinct days first
    (multi-line orders are one purchase event); gaps come from one
    lag window over each user-item day sequence. Items aggregate to
    n_repurchases (gap count), avg_gap_days (exact integer sum, one
    double division) and median_gap_days (exact interpolated
    percentile over integer gaps — x.0/x.5 doubles, engine-portable).
    Top ``k`` items by repurchase volume, ties by item id.

    Scale shape: one (user, item, day) distinct, one lag window
    bounded per user-item group, one item-scale aggregate, global
    top-k via orderBy+limit. The window never crosses entities, so
    skew is bounded by one user's history of one item."""
    from pyspark.sql.window import Window

    ud = purchases.select(
        F.col(col_user).alias("u"),
        F.col(col_item).alias("i"),
        F.col(col_date).cast("date").alias("d"),
    ).distinct()
    w = Window.partitionBy("u", "i").orderBy("d")
    gaps = (
        ud.withColumn("prev_d", F.lag("d").over(w))
        .filter(F.col("prev_d").isNotNull())
        .select("i", F.datediff("d", "prev_d").cast("bigint").alias("gap"))
    )
    from .ranking import ranked_topk

    agg = gaps.groupBy(F.col("i").alias("item")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_repurchases"),
        F.round(
            F.sum("gap").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_gap_days"),
        F.expr("percentile(gap, 0.5)").alias("median_gap_days"),
    )
    return ranked_topk(
        agg, [F.desc("n_repurchases"), F.asc("item")], k
    )


def cohort_ltv(
    events: DataFrame,
    cohort_type: str = "signup",
    value_type: str = "purchase",
    col_user: str = "user_id",
    col_ts: str = "ts",
    col_type: str = "event_type",
    col_value: str = "value",
    max_offset: int = 8,
) -> DataFrame:
    """Weekly-cohort cumulative revenue (LTV curve): cohort = week of
    the user's first ``cohort_type`` event; at each week offset, the
    cohort's CUMULATIVE ``value_type`` revenue and its per-user LTV
    (cum revenue / cohort size) — the revenue-weighted companion of
    ``cohort_retention``'s activity counts.

    Offsets with no revenue emit no row; the next observed offset's
    cumulative total is still correct (the running sum is over
    observed rows in offset order). Revenue is summed in
    DECIMAL(18,6) end to end — weekly sums, the cohort-scale running
    sum, and only the final per-user division is double.

    Scale shape: revenue collapses to (user, week) grain in one
    aggregate before the user-keyed cohort join; the cumulative
    window runs over cohorts × offsets (calendar-bounded)."""
    from pyspark.sql.window import Window

    ev = events.select(
        F.col(col_user).alias("u"),
        F.date_trunc("week", F.col(col_ts)).cast("date").alias("wk"),
        F.col(col_type).alias("et"),
        F.col(col_value).alias("v"),
    )
    cohorts = (
        ev.filter(F.col("et") == cohort_type)
        .groupBy("u")
        .agg(F.min("wk").alias("cohort_week"))
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    rev = (
        ev.filter(F.col("et") == value_type)
        .groupBy("u", "wk")
        .agg(
            F.sum(F.col("v").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("wrev")
        )
    )
    w_cum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(cohorts, "u")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("wk"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
            "wrev",
        )
        .filter(
            (F.col("week_offset") >= 0)
            & (F.col("week_offset") <= max_offset)
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.sum("wrev").cast("decimal(18,6)").alias("orev"))
        .withColumn(
            "cum_revenue_dec",
            F.sum("orev").over(w_cum).cast("decimal(18,6)"),
        )
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_size",
            F.round(F.col("cum_revenue_dec").cast("double"), 6).alias(
                "cum_revenue"
            ),
            F.round(
                F.col("cum_revenue_dec").cast("double")
                / F.col("cohort_size"),
                6,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def session_summary(
    events: DataFrame,
    gap_minutes: int = 30,
    col_user: str = "user_id",
    col_ts: str = "ts",
) -> DataFrame:
    """One-row session-quality summary over the inactivity-gap
    sessionization (the KPI header above events_sessions' per-session
    rows): session count, mean events per session, bounce rate (share
    of single-event sessions), exact mean and interpolated median
    session duration in seconds.

    Sessions are user-keyed gap splits (a >gap_minutes silence starts
    a new session) — one lag window + one running sum per user, the
    same definition as streaming/windows.py::assign_session_ids.
    Durations are exact integer MICROSECOND spans (matching the
    sessionizer's split precision — a sub-second session contributes
    its true fractional seconds, not 0) divided once at the end;
    one-row output.

    Scale shape: one user-partitioned window pass over the events, one
    session-scale aggregate, one one-row reduction — nothing wider
    than the event table shuffles, and window skew is bounded by one
    user's history."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("u").orderBy("t")
    sessions = (
        events.select(F.col(col_user).alias("u"), F.col(col_ts).alias("t"))
        .withColumn("prev_t", F.lag("t").over(w))
        .withColumn(
            "new_s",
            # MICROSECOND gap, exactly assign_session_ids' definition:
            # ts carries sub-second precision, and a second-granularity
            # diff would merge sessions the sessionizer splits
            F.when(
                F.col("prev_t").isNull()
                | (
                    F.expr("timestampdiff(MICROSECOND, prev_t, t)")
                    > gap_minutes * 60 * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                Window.partitionBy("u").orderBy("t").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .groupBy("u", "sid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            # NTZ parquet timestamps need the explicit cast (identity
            # in this engine's fixed UTC session timezone)
            (
                F.unix_micros(F.max("t").cast("timestamp"))
                - F.unix_micros(F.min("t").cast("timestamp"))
            ).cast("bigint").alias("dur_us"),
        )
    )
    # exact BIGINT microsecond sums; the /1e6 unit conversion happens
    # once per output scalar (identical IEEE op order on the oracle)
    return sessions.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.round(
            F.sum("n_events").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_events_per_session"),
        F.round(
            F.sum(
                F.when(F.col("n_events") == 1, 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
        F.round(
            F.sum("dur_us").cast("double")
            / F.count(F.lit(1))
            / F.lit(1_000_000.0),
            6,
        ).alias("avg_duration_sec"),
        (
            F.expr("percentile(dur_us, 0.5)") / F.lit(1_000_000.0)
        ).alias("median_duration_sec"),
    )


def user_lifecycle_stages(
    events: DataFrame,
    col_user: str = "user_id",
    col_ts: str = "ts",
) -> DataFrame:
    """Weekly growth accounting: per calendar week, how many active
    users are NEW (first-ever week), RETAINED (also active the prior
    week), RESURRECTED (previously seen, inactive last week), and how
    many CHURNED INTO this week (active last week, absent now) — the
    standard startup growth-accounting table (new + retained +
    resurrected − churned = WoW active delta).

    All work happens at USER-WEEK grain: one distinct collapse of the
    event stream, one user-scale first-week aggregate, one equi-join
    against the prior week's activity (u, wk−7), and one anti-join for
    churn. Weeks are Monday-truncated dates. Output rows are the
    UNION of activity weeks and churn-target weeks up to the last
    observed activity week — an interior fully-dead week still emits
    its row (all zeros except n_churned), so the growth identity
    holds across gaps; only the week AFTER the last observed week,
    where the final cohort's churn would land, is out of frame. Exact
    integer counts throughout."""
    act = events.select(
        F.col(col_user).alias("u"),
        F.date_trunc("week", F.col(col_ts)).cast("date").alias("wk"),
    ).distinct()
    firstwk = act.groupBy("u").agg(F.min("wk").alias("first_wk"))
    prev = act.select(
        "u", F.date_add("wk", 7).alias("wk"), F.lit(1).alias("was_prev")
    )
    staged = (
        act.join(firstwk, "u")
        .join(prev, ["u", "wk"], "left")
        .groupBy("wk")
        .agg(
            F.sum(
                F.when(F.col("first_wk") == F.col("wk"), 1).otherwise(0)
            ).cast("bigint").alias("n_new"),
            F.sum(
                F.when(F.col("was_prev").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_retained"),
            F.sum(
                F.when(
                    (F.col("first_wk") < F.col("wk"))
                    & F.col("was_prev").isNull(),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_resurrected"),
        )
    )
    churned = (
        prev.select("u", "wk")
        .join(act, ["u", "wk"], "left_anti")
        .groupBy("wk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    # FULL join so churn into an interior dead week (no activity rows)
    # still surfaces; the one-row max-week broadcast crops the week
    # after the final observed week, which is out of frame
    max_wk = act.agg(F.max("wk").alias("max_wk"))
    zero = F.lit(0).cast("bigint")
    return (
        staged.join(churned, "wk", "full")
        .crossJoin(F.broadcast(max_wk))
        .filter(F.col("wk") <= F.col("max_wk"))
        .select(
            F.col("wk").cast("string").alias("week"),
            F.coalesce("n_new", zero).alias("n_new"),
            F.coalesce("n_retained", zero).alias("n_retained"),
            F.coalesce("n_resurrected", zero).alias("n_resurrected"),
            F.coalesce("n_churned", zero).alias("n_churned"),
        )
        .orderBy("week")
    )


def revenue_concentration(
    orders: DataFrame,
    col_cust: str = "o_custkey",
    col_amount: str = "o_totalprice",
    top_fractions=(0.01, 0.1, 0.2, 0.5),
) -> DataFrame:
    """Customer revenue Pareto: for each top fraction f, the revenue
    threshold (the (1−f) percentile of per-customer revenue), how many
    customers clear it, and their share of total revenue — the
    "top 1% of customers drive X% of GMV" table, the customer-side
    twin of popularity_concentration's item Gini.

    Per-customer revenue sums in DECIMAL; thresholds are interpolated
    percentiles of the double cast (both engines compute them
    identically); the selected-revenue sums go back through DECIMAL so
    shares are partial-aggregation-order independent.

    Scale shape: one customer-scale aggregate, one one-row percentile
    aggregate broadcast back, one conditional-sum aggregate —
    len(top_fractions) output rows, no global sort, no window."""
    per = orders.groupBy(F.col(col_cust).alias("c")).agg(
        F.sum(F.col(col_amount).cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("rev_dec")
    ).withColumn("rev", F.col("rev_dec").cast("double"))
    qs = ", ".join(str(1.0 - f) for f in top_fractions)
    thr = per.agg(
        F.expr(f"percentile(rev, array({qs}))").alias("thrs"),
        F.sum("rev_dec").cast("decimal(18,6)").alias("tot_dec"),
    )
    joined = per.crossJoin(F.broadcast(thr))
    aggs = []
    for i, f in enumerate(top_fractions):
        t = F.expr(f"element_at(thrs, {i + 1})")
        aggs += [
            F.round(F.max(t), 6).alias(f"__thr_{i}"),
            F.sum(F.when(F.col("rev") >= t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"__n_{i}"),
            F.round(
                F.sum(
                    F.when(F.col("rev") >= t, F.col("rev_dec")).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                ).cast("double")
                / F.max(F.col("tot_dec")).cast("double"),
                6,
            ).alias(f"__share_{i}"),
        ]
    wide = joined.agg(*aggs)
    stack = ", ".join(
        f"{f}D, __thr_{i}, __n_{i}, __share_{i}"
        for i, f in enumerate(top_fractions)
    )
    return wide.selectExpr(
        f"stack({len(top_fractions)}, {stack}) AS "
        "(top_fraction, rev_threshold, n_customers, revenue_share)"
    ).orderBy("top_fraction")


def bot_activity_flags(
    events: DataFrame,
    col_user: str = "user_id",
    col_ts: str = "ts",
    min_events: int = 20,
    burst_threshold: int = 10,
    rate_threshold_per_min: float = 6.0,
) -> DataFrame:
    """Bot/abuse screen over the event stream: per sufficiently-active
    user, the activity-rate diagnostics a training-data pipeline reads
    before events feed recommendations or behavioral corpora —
    inhuman sustained rates and bursts are the standard spam signals
    (engagement farms distort every popularity-derived statistic
    downstream, so this filter runs FIRST).

    Per user: event count, active span, sustained events-per-active-
    minute, and the maximum 10-second burst (the count of events in
    any half-open [t, t+10s) window anchored at an event). A user is
    flagged when the burst reaches ``burst_threshold`` or the
    sustained rate exceeds ``rate_threshold_per_min``. The span is
    exact BIGINT microseconds; only the rate division is a rounded
    double (try_divide: a zero-span user — single event, OR several
    events all sharing one timestamp — reads NULL ``events_per_min``).
    The rate FLAG uses the multiplicative form
    ``n_events·60e6 > threshold·active_us``, so a MULTI-event
    zero-span user (an unboundedly fast burst, the most bot-like
    signature there is) IS rate-flagged even though the displayed
    rate is NULL — deliberate: NULL there means "division undefined
    (infinite)", not "no evidence". A single-event user would satisfy
    the same inequality, but the ``min_events`` floor (default 20)
    excludes them before the flag applies — keep min_events ≥ 2 if
    you lower it. The burst window is a RANGE frame
    over microsecond epochs — exact integer bounds, no timestamp
    rounding ambiguity between engines.

    Scale shape: one shuffle on the user key serves BOTH the burst
    window and the per-user aggregate; the RANGE frame is
    event-scale but strictly per-user and forward-bounded (10 s), so
    a hot user costs O(events-in-10s) per row, not O(n²); output is
    user-scale, filtered to ``min_events``. No joins, no driver
    actions."""
    from pyspark.sql.window import Window

    # NTZ parquet timestamps need the explicit cast (identity in this
    # engine's fixed UTC session timezone) before unix_micros
    mu = F.expr(f"unix_micros(CAST({col_ts} AS TIMESTAMP))")
    base = events.select(F.col(col_user).alias("u"), mu.alias("mu"))
    w_burst = (
        Window.partitionBy("u")
        .orderBy("mu")
        .rangeBetween(0, 9_999_999)
    )
    per_event = base.withColumn(
        "burst", F.count(F.lit(1)).over(w_burst)
    )
    per_user = per_event.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("mu") - F.min("mu")).cast("bigint").alias("active_us"),
        F.max("burst").cast("bigint").alias("max_burst_10s"),
    )
    rate = F.round(
        F.try_divide(
            F.col("n_events").cast("double") * 60_000_000.0,
            F.col("active_us").cast("double"),
        ),
        6,
    )
    return (
        per_user.filter(F.col("n_events") >= min_events)
        .select(
            F.col("u").alias("user_id"),
            "n_events",
            F.round(
                F.col("active_us").cast("double") / 1_000_000.0, 6
            ).alias("active_secs"),
            rate.alias("events_per_min"),
            "max_burst_10s",
            F.when(
                (F.col("max_burst_10s") >= burst_threshold)
                | (
                    F.col("n_events").cast("double") * 60_000_000.0
                    > F.lit(float(rate_threshold_per_min))
                    * F.col("active_us").cast("double")
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_bot"),
        )
        .orderBy("user_id")
    )


def peak_concurrency(
    events: DataFrame,
    gap_minutes: int = 30,
    col_user: str = "user_id",
    col_ts: str = "ts",
) -> DataFrame:
    """Peak simultaneous sessions per day — the capacity-planning
    number (connection pools, serving replicas) that daily/rolling
    actives can't give you: 10k daily users at 100 concurrent is a
    different system than 10k at 5k concurrent.

    Sessions are the same user-keyed microsecond-gap splits as
    ``session_summary`` / ``assign_session_ids``. Each session
    interval [first event, last event] (inclusive) splits at day
    boundaries; within each day a classic +1/−1 sweep over the
    distinct event-time points gives concurrency(t) = sessions
    started ≤ t minus sessions ended < t, and the day's peak is the
    max. All arithmetic is exact BIGINT microseconds.

    Scale shape: one user-key shuffle (sessionize), one session-scale
    aggregate, a bounded day-split explode (sessions span ≤ gap-bound
    days — almost always 1-2 segments), then a DAY-PARTITIONED sweep
    window: the global-sort trap is structurally avoided because
    boundary-crossing sessions are pre-split, so no window ever
    orders more than one day's points. Output rows = observed days."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("u").orderBy("t")
    sess = (
        events.select(
            F.col(col_user).alias("u"), F.col(col_ts).alias("t")
        )
        .withColumn("prev_t", F.lag("t").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_t").isNull()
                | (
                    F.expr("timestampdiff(MICROSECOND, prev_t, t)")
                    > gap_minutes * 60 * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("u", "sid")
        .agg(
            F.expr("unix_micros(CAST(min(t) AS TIMESTAMP))").alias(
                "s_us"
            ),
            F.expr("unix_micros(CAST(max(t) AS TIMESTAMP))").alias(
                "e_us"
            ),
            F.to_date(F.min("t")).alias("s_day"),
            F.to_date(F.max("t")).alias("e_day"),
        )
    )
    segs = sess.select(
        F.explode(
            F.expr("sequence(s_day, e_day)")
        ).alias("day"),
        "s_us",
        "e_us",
    ).select(
        "day",
        F.greatest(
            F.col("s_us"),
            F.expr("unix_micros(CAST(day AS TIMESTAMP))"),
        ).alias("a_us"),
        F.least(
            F.col("e_us"),
            F.expr(
                "unix_micros(CAST(date_add(day, 1) AS TIMESTAMP)) - 1"
            ),
        ).alias("b_us"),
    )
    # both sweep points leave each segment in ONE explode (a union
    # would duplicate the whole sessionize subtree), and the per-day
    # session count falls out of the same aggregate (n_sessions =
    # Σ start-points), so the session build runs exactly once
    points = (
        segs.select(
            "day",
            F.explode(
                F.array(
                    F.struct(
                        F.col("a_us").alias("p"),
                        F.lit(1).alias("is_s"),
                    ),
                    F.struct(
                        F.col("b_us").alias("p"),
                        F.lit(0).alias("is_s"),
                    ),
                )
            ).alias("e"),
        )
        .select("day", "e.p", "e.is_s")
        .groupBy("day", "p")
        .agg(
            F.sum("is_s").cast("bigint").alias("s_cnt"),
            F.sum(1 - F.col("is_s")).cast("bigint").alias("e_cnt"),
        )
    )
    w_day = Window.partitionBy("day").orderBy("p").rowsBetween(
        Window.unboundedPreceding, 0
    )
    active = points.select(
        "day",
        "s_cnt",
        (
            F.sum("s_cnt").over(w_day)
            - (F.sum("e_cnt").over(w_day) - F.col("e_cnt"))
        ).alias("active"),
    )
    return (
        active.groupBy("day")
        .agg(
            F.max("active").cast("bigint").alias("peak_concurrent"),
            F.sum("s_cnt").cast("bigint").alias("n_sessions"),
        )
        .select(
            F.col("day").cast("string").alias("day"),
            "peak_concurrent",
            "n_sessions",
        )
        .orderBy("day")
    )
