"""Time-series smoothing/forecasting over keyed daily aggregates.

Holt's linear-trend exponential smoothing (level + trend), run as an
array-local fold per key: the daily series packs into one sorted array
per key (day-scale, bounded by the calendar range) and the recurrence
executes inside a single higher-order ``aggregate`` — the same
zero-per-step-jobs pattern as MMR's greedy loop. The DuckDB oracle
replays the identical fold with ``list_reduce``, so the IEEE
expression trees match term for term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_forecast(
    df: DataFrame,
    col_key: str,
    col_ts: str,
    col_val: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
) -> DataFrame:
    """Per-key Holt double exponential smoothing with an
    ``horizon``-step linear forecast.

        level' = α·x + (1−α)·(level + trend)
        trend' = β·(level' − level) + (1−β)·trend
        forecast_h = level' + h·trend'

    Scale shape: one (key, day) aggregate (daily sums carried in
    DECIMAL so partial-aggregation order can't move a bit), one
    key-scale pack into a day-sorted array, then the entire recurrence
    is a scan-local fold — sequential in TIME, parallel in KEYS, which
    is the only parallelism a per-key recurrence can have. State per
    key is two doubles; nothing beyond the daily table ever shuffles.

    The fold seeds from the first observation (level = x₀, trend = 0)
    and consumes the rest in day order — exactly ``list_reduce`` over
    the transformed series, which is what the oracle runs."""
    daily = (
        df.groupBy(
            F.col(col_key).alias("key"),
            F.to_date(F.col(col_ts)).alias("day"),
        )
        .agg(
            F.sum(F.col(col_val).cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    series = daily.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("day").alias("last_day"),
        F.expr(
            "transform(sort_array(collect_list(struct(day, v))), p -> p.v)"
        ).alias("vs"),
    )
    a, b = repr(float(alpha)), repr(float(beta))
    one_a, one_b = repr(1.0 - float(alpha)), repr(1.0 - float(beta))
    fold = f"""
aggregate(
  slice(transform(vs, v0 -> struct(v0 AS level, CAST(0.0 AS DOUBLE) AS trend)),
        2, size(vs) - 1),
  struct(element_at(vs, 1) AS level, CAST(0.0 AS DOUBLE) AS trend),
  (acc, x) -> struct(
    {a} * x.level + {one_a} * (acc.level + acc.trend) AS level,
    {b} * (({a} * x.level + {one_a} * (acc.level + acc.trend))
           - acc.level) + {one_b} * acc.trend AS trend)
)
"""
    return series.withColumn("st", F.expr(fold)).select(
        F.col("key").alias(col_key),
        "n_days",
        "last_day",
        F.round(F.col("st.level"), 6).alias("level"),
        F.round(F.col("st.trend"), 6).alias("trend"),
        F.round(
            F.col("st.level") + F.lit(float(horizon)) * F.col("st.trend"), 6
        ).alias(f"forecast_{horizon}"),
    )


def _daily(df: DataFrame, col_key: str, col_ts: str, col_val: str):
    """(key, day, v) with order-independent DECIMAL daily sums."""
    return (
        df.groupBy(
            F.col(col_key).alias("key"),
            F.to_date(F.col(col_ts)).alias("day"),
        )
        .agg(
            F.sum(F.col(col_val).cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )


def cusum_changepoint(
    df: DataFrame,
    col_key: str,
    col_ts: str,
    col_val: str,
) -> DataFrame:
    """CUSUM changepoint detection per key: the day where the
    cumulative deviation from the series mean peaks — the standard
    level-shift locator a monitoring pipeline runs over metric feeds.

    All windows partition BY KEY over the day-scale daily table
    (calendar-bounded groups), and the running sum consumes values in
    day order, so the float accumulation is sequential and
    deterministic — the oracle replays the identical window. The mean
    comes from a DECIMAL sum so partial-aggregation order can't move
    it. Output: (key, changepoint_day, max_abs_cusum, mean_daily)."""
    from pyspark.sql.window import Window

    daily = _daily(df, col_key, col_ts, col_val)
    stats = daily.groupBy("key").agg(
        (
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_v")
    )
    wrun = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wpick = Window.partitionBy("key").orderBy(
        F.desc("abs_cusum"), F.asc("day")
    )
    return (
        daily.join(F.broadcast(stats), "key")
        .withColumn(
            "cusum", F.sum(F.col("v") - F.col("mean_v")).over(wrun)
        )
        .withColumn("abs_cusum", F.abs(F.col("cusum")))
        .withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("key").alias(col_key),
            F.col("day").alias("changepoint_day"),
            F.round("abs_cusum", 6).alias("max_abs_cusum"),
            F.round("mean_v", 6).alias("mean_daily"),
        )
    )


def seasonal_profile(
    df: DataFrame,
    col_key: str,
    col_ts: str,
    col_val: str,
) -> DataFrame:
    """Day-of-week seasonality profile per key: mean daily value per
    ISO weekday and its share of the key's weekly total — the
    seasonality audit run before trusting any daily-grain comparison.

    Two aggregates over the day-scale daily table (key×7 output rows);
    the per-key total arrives by a broadcast join, never a window.
    ISO weekday (1 = Monday) is used because Spark's ``dayofweek`` and
    DuckDB's ``dayofweek`` disagree on Sunday's index."""
    daily = _daily(df, col_key, col_ts, col_val)
    dow = daily.groupBy(
        "key", (F.weekday("day") + 1).alias("iso_dow")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_v"),
    )
    # tot = Σ_dow mean_v as a dow-ORDERED sequential fold: a plain
    # double sum would depend on partial-aggregation order (7 values,
    # but 7 doubles is enough to flip the 15th digit); the oracle
    # replays the same left fold with list_reduce
    tot = dow.groupBy("key").agg(
        F.expr(
            "aggregate(transform(sort_array(collect_list("
            "struct(iso_dow, mean_v))), p -> p.mean_v),"
            " CAST(0.0 AS DOUBLE), (a2, x2) -> a2 + x2)"
        ).alias("tot_v")
    )
    return (
        dow.join(F.broadcast(tot), "key")
        .select(
            F.col("key").alias(col_key),
            "iso_dow",
            "n_days",
            F.round("mean_v", 6).alias("mean_daily_value"),
            # try_divide: an all-zero series has tot_v = 0 — shares
            # are undefined (NULL on both engines), not a crash
            F.round(
                F.try_divide(F.col("mean_v"), F.col("tot_v")), 6
            ).alias("dow_share"),
        )
    )


def trailing_window_anomaly(
    df: DataFrame,
    col_key: str,
    col_ts: str,
    col_val: str,
    window_days: int = 7,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Trailing-window anomaly detection per key: each day's value is
    z-scored against the mean/stddev of the PRIOR ``window_days`` days
    (the current day excluded — a spike must not absorb itself into
    its own baseline), and days with |z| ≥ ``z_threshold`` are
    flagged — the standard daily-metric monitor.

    Windows partition by key over the day-scale daily table
    (calendar-bounded groups; the daily sums are DECIMAL so the table
    itself is partition-order exact); the trailing frame is ROWS
    BETWEEN window_days PRECEDING AND 1 PRECEDING, replayed
    identically by the oracle. Days with fewer than 2 prior days or a
    zero baseline stddev get a NULL z (insufficient history, both
    engines agree). Output: (key, day, v, base_mean, base_std,
    z_score, is_anomaly) for days WITH a defined z."""
    from pyspark.sql.window import Window

    daily = _daily(df, col_key, col_ts, col_val)
    wtrail = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    # double BEFORE the window stats: Spark would average the DECIMAL
    # exactly while DuckDB's avg is double — identical double inputs
    # keep both engines on the same arithmetic
    daily_d = daily.select(
        "key", "day", F.col("v").cast("double").alias("v")
    )
    base = daily_d.select(
        "key",
        "day",
        F.round("v", 6).alias("v"),
        F.round(F.avg("v").over(wtrail), 6).alias("base_mean"),
        F.round(F.stddev_samp("v").over(wtrail), 6).alias("base_std"),
    )
    z = F.round(
        (F.col("v") - F.col("base_mean")) / F.col("base_std"), 6
    )
    return (
        base.filter(
            F.col("base_std").isNotNull() & (F.col("base_std") > 0)
        )
        .select(
            "key",
            "day",
            "v",
            "base_mean",
            "base_std",
            z.alias("z_score"),
            (F.abs(z) >= z_threshold).alias("is_anomaly"),
        )
        .orderBy("key", "day")
    )


def trend_slope_topk(
    df: DataFrame,
    col_key: str,
    col_date: str,
    k: int = 20,
) -> DataFrame:
    """Per-key linear activity trend: ordinary-least-squares slope of
    daily event counts against the day index, ranked to the ``k``
    steepest risers — the batch twin of ``wow_trending`` for gradual
    drift (a key can trend hard without ever having a big
    week-over-week jump).

        slope(key) = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    over that key's OBSERVED days (x = days since the corpus' first
    date, y = that day's event count; days with no activity are
    absent, not zero-filled — zero-filling is calendar × keys fan-out
    and belongs to a densify step if wanted). Every Σ is an exact
    BIGINT sum, so the single closed-form double division is computed
    from identical integers on any engine; slope is NULL for
    single-day keys (0/0 via try_divide).

    Scale shape: one (key, day) aggregate, one one-row min-date
    broadcast, one key-scale aggregate, global top-k via orderBy+limit
    — no windows, no self-joins, nothing wider than the daily grain
    shuffles."""
    daily = df.groupBy(
        F.col(col_key).alias("key"),
        F.col(col_date).cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    d0 = daily.agg(F.min("d").alias("d0"))
    xy = daily.crossJoin(F.broadcast(d0)).select(
        "key",
        F.datediff("d", "d0").cast("bigint").alias("x"),
        F.col("y").cast("bigint").alias("y"),
    )
    agg = xy.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = F.round(
        F.try_divide(
            (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double"),
            (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("double"),
        ),
        6,
    )
    from .ranking import ranked_topk

    sl = agg.select(
        "key",
        "n_days",
        F.col("sy").alias("n_events"),
        slope.alias("slope"),
    ).filter(F.col("slope").isNotNull())
    return ranked_topk(sl, [F.desc("slope"), F.asc("key")], k)


def daily_autocorrelation(
    df: DataFrame,
    col_ts: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Lag-k autocorrelation of the DAILY event-count series for
    k = 1..max_lag — the weekly-seasonality diagnostic that picks the
    window for seasonal_profile / trailing_window_anomaly:

        acf(k) = Σ_t (y_t − ȳ)(y_{t+k} − ȳ) / Σ_t (y_t − ȳ)²

    over observed days (a pair contributes only when BOTH days have
    events; calendar gaps shrink n_pairs, not the denominator).

    Determinism: ȳ is one double division of exact integer sums; each
    cross-product and squared deviation is pre-rounded to
    DECIMAL(38,6) and summed exactly, so the day-scale reductions are
    partial-aggregation-order independent; acf is one double division,
    rounded. The element width is (38,6), not (18,6): a day with ~1e6
    events puts dm² near 1e12, which already exhausts (18,6)'s 12
    integer digits — (38,6) holds dm up to ~1e16 and the sum stays
    exact on both engines.

    Scale shape: the corpus collapses to DAY grain in one aggregate;
    everything after is day-scale — a ×max_lag explode keyed by target
    day makes the lag pairing an EQUI-join (never a date-range
    self-join), and the output is max_lag rows."""
    daily = df.groupBy(F.to_date(col_ts).alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    mu = daily.agg(
        (F.sum("y") / F.count(F.lit(1))).alias("mu")
    )
    dm = daily.crossJoin(F.broadcast(mu)).select(
        "d", (F.col("y") - F.col("mu")).alias("dm")
    )
    den = dm.select(
        F.expr("CAST(round(dm * dm, 6) AS DECIMAL(38,6))").alias("sq")
    ).agg(F.sum("sq").alias("s0"))
    lags = dm.select(
        F.col("dm").alias("dma"),
        F.explode(
            F.sequence(F.lit(1), F.lit(max_lag))
        ).alias("k"),
        "d",
    ).select("dma", "k", F.expr("date_add(d, k)").alias("d2"))
    rhs = dm.select(F.col("d").alias("d2"), F.col("dm").alias("dmb"))
    num = (
        lags.join(rhs, "d2")
        .select(
            "k",
            F.expr(
                "CAST(round(dma * dmb, 6) AS DECIMAL(38,6))"
            ).alias("xy"),
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("xy").alias("sk"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("k").cast("int").alias("k"),
            "n_pairs",
            # try_divide: a CONSTANT daily series has s0 = 0 exactly
            # (every dm = 0) — acf is undefined, NULL on both engines
            F.round(
                F.try_divide(
                    F.col("sk").cast("double"),
                    F.col("s0").cast("double"),
                ),
                6,
            ).alias("acf"),
        )
        .orderBy("k")
    )


def seasonal_decompose_daily(
    df: DataFrame,
    col_ts: str = "ts",
    col_val: str = "value",
) -> DataFrame:
    """Classical additive seasonal decomposition of the global daily
    value series: trend = centered 7-day moving average (emitted only
    where the full window exists), seasonal = mean detrended value per
    ISO weekday, residual = value − trend − seasonal — the STL-lite
    decomposition behind "is this dip seasonal or real".

    Determinism: daily totals come from DECIMAL sums; the trend is an
    exact DECIMAL frame-sum divided once (never a float window
    average, whose accumulation order differs between engines);
    detrended values are pre-rounded to DECIMAL(18,6) before the
    seasonal means. Windows order by day over the DAY-scale table —
    calendar-bounded, the documented single-partition exception every
    day-grain operator shares.

    Output: (day, value, trend, seasonal, residual), trend-defined
    rows only, day-ordered."""
    from pyspark.sql.window import Window

    daily = df.groupBy(F.to_date(col_ts).alias("d")).agg(
        F.sum(F.col(col_val).cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("v_dec")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    trended = (
        daily.withColumn("n_frame", F.count(F.lit(1)).over(w7))
        .withColumn(
            "t_sum", F.sum("v_dec").over(w7).cast("decimal(18,6)")
        )
        .filter(F.col("n_frame") == 7)
        .select(
            "d",
            F.col("v_dec"),
            (F.col("t_sum").cast("double") / 7.0).alias("trend_raw"),
        )
        .withColumn(
            "detr",
            F.expr(
                "CAST(round(CAST(v_dec AS DOUBLE) - trend_raw, 6)"
                " AS DECIMAL(18,6))"
            ),
        )
    )
    seasonal = trended.groupBy(
        (F.weekday("d") + 1).alias("iso_dow")
    ).agg(
        (
            F.sum("detr").cast("double") / F.count(F.lit(1))
        ).alias("seasonal_raw")
    )
    return (
        trended.withColumn("iso_dow", F.weekday("d") + 1)
        .join(F.broadcast(seasonal), "iso_dow")
        .select(
            F.col("d").cast("string").alias("day"),
            F.round(F.col("v_dec").cast("double"), 6).alias("value"),
            F.round("trend_raw", 6).alias("trend"),
            F.round("seasonal_raw", 6).alias("seasonal"),
            F.round(
                F.col("v_dec").cast("double")
                - F.col("trend_raw")
                - F.col("seasonal_raw"),
                6,
            ).alias("residual"),
        )
        .orderBy("day")
    )


def gmv_mtd_report(
    orders: DataFrame,
    col_date: str = "o_orderdate",
    col_amount: str = "o_totalprice",
    last_n_days: int = 120,
) -> DataFrame:
    """Finance-style daily GMV report over the trailing ``last_n_days``
    of the order history: per day, gross revenue, the month-to-date
    running total, and the month-over-month ratio against the SAME day
    of the previous month (NULL when that day had no orders or doesn't
    exist — the standard reporting convention).

    Revenue stays DECIMAL(18,6) through the daily sums and the MTD
    window; MoM is one double division, rounded. The previous-month
    comparison is an EQUI-join on (month - 1, day-of-month) over the
    day-scale table — never a date-range join. The daily table is
    built over an extra 31-day lead-in so the output window's leading
    month still finds its comparison days (and its month-to-date
    includes pre-window days of the same month); MoM is NULL only
    when the same day of the previous month truly had no orders.

    Scale shape: one day-scale aggregate from the scan (filter pushed
    to parquet via the max-date broadcast), then day-scale windows and
    joins; output rows = observed days in the reporting window."""
    from pyspark.sql.window import Window

    mx = orders.agg(
        F.max(F.col(col_date).cast("date")).alias("max_d")
    )
    daily = (
        orders.crossJoin(F.broadcast(mx))
        .filter(
            F.col(col_date).cast("date")
            >= F.date_sub(F.col("max_d"), last_n_days + 31)
        )
        .groupBy(F.col(col_date).cast("date").alias("d"))
        .agg(
            F.sum(F.col(col_amount).cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("gmv_dec")
        )
        .withColumn("mth", F.trunc("d", "month"))
        .withColumn("dom", F.dayofmonth("d"))
    )
    w_mtd = (
        Window.partitionBy("mth")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = daily.withColumn(
        "mtd_dec", F.sum("gmv_dec").over(w_mtd).cast("decimal(18,6)")
    )
    prev = daily.select(
        F.add_months(F.col("mth"), 1).alias("mth"),
        F.col("dom"),
        F.col("gmv_dec").alias("prev_gmv_dec"),
    )
    return (
        cur.join(prev, ["mth", "dom"], "left")
        # crop the 31-day lead-in: it exists only to feed MTD/MoM
        .crossJoin(F.broadcast(mx))
        .filter(F.col("d") >= F.date_sub(F.col("max_d"), last_n_days))
        .select(
            F.col("d").cast("string").alias("day"),
            F.round(F.col("gmv_dec").cast("double"), 6).alias("gmv"),
            F.round(F.col("mtd_dec").cast("double"), 6).alias("mtd_gmv"),
            F.round(
                F.try_divide(
                    F.col("gmv_dec").cast("double"),
                    F.col("prev_gmv_dec").cast("double"),
                ),
                6,
            ).alias("mom_ratio"),
        )
        .orderBy("day")
    )


def theil_sen_trend(
    df: DataFrame,
    col_ts: str,
    col_val: str,
    last_n_days: int = 120,
) -> DataFrame:
    """Theil–Sen robust trend over the daily total of a metric: the
    MEDIAN of all pairwise day-to-day slopes — the estimator that
    shrugs off the outlier days (flash sales, outages) that wreck an
    OLS fit (``trend_slope_topk``); the standard robust companion to
    every daily KPI this module serves.

    Determinism: daily totals are order-independent DECIMAL sums cast
    to double; each pairwise slope is one IEEE division pre-rounded to
    9 decimals; the median is the interpolated 0.5 quantile both
    engines compute identically over identical doubles. The intercept
    is the median of per-day levels at the slope (median residual
    form), same guards.

    Scale shape: one day-scale aggregate from the scan (filter pushed
    via the max-date broadcast), then a DAY-scale pair join bounded by
    the calendar window (≤ last_n_days²/2 pairs — the documented
    calendar-bounded quadratic class, thousands of rows, never
    data-scale), one one-row median reduction. Nothing fact-scale
    shuffles twice."""
    mx = df.agg(
        F.max(F.to_date(F.col(col_ts))).alias("max_d")
    )
    daily = (
        df.crossJoin(F.broadcast(mx))
        .filter(
            F.to_date(F.col(col_ts))
            >= F.date_sub(F.col("max_d"), last_n_days)
        )
        .groupBy(F.to_date(F.col(col_ts)).alias("d"))
        .agg(
            F.sum(F.col(col_val).cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
        .select(
            F.datediff(F.col("d"), F.lit("1970-01-01")).alias("x"),
            "v",
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(b, F.col("a.x") < F.col("b.x"))
        .select(
            F.expr(
                "CAST(round((b.v - a.v) / CAST(b.x - a.x AS DOUBLE),"
                " 9) AS DOUBLE)"
            ).alias("s")
        )
    )
    fit = slopes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("percentile(s, 0.5)").alias("m"),
    )
    days = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr("percentile(v, 0.5)").alias("med_v"),
    )
    return (
        fit.crossJoin(F.broadcast(days))
        .select(
            "n_days",
            "n_pairs",
            F.round(F.col("m"), 6).alias("slope_per_day"),
            F.round(F.col("med_v"), 6).alias("median_level"),
        )
    )


def seasonal_residual_anomalies(
    df: DataFrame,
    col_ts: str,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Day-of-week-adjusted anomaly screen over daily event volume:
    residual = day count − its weekday's mean, scored against the
    robust MAD scale (1.4826·MAD ≈ σ under normality). Catches the
    Tuesday that behaved like a Sunday — exactly the days a trailing
    z-score (``trailing_window_anomaly``) normalizes away because its
    window mixes weekdays.

    Determinism: day counts are exact BIGINT; weekday means are one
    double division pre-rounded to 9; residuals pre-rounded to 9;
    MAD is the interpolated median both engines compute identically;
    the score division goes through try_divide (a perfectly regular
    calendar has MAD 0 → NULL scores → empty result, the "nothing
    anomalous is detectable" signal).

    Scale shape: one day-scale aggregate from the scan, a 7-row
    weekday aggregate broadcast back, a one-row MAD reduction
    broadcast — output rows = flagged days. No fact-scale second
    shuffle, no window at all."""
    daily = df.groupBy(F.to_date(F.col(col_ts)).alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    dow = daily.select(
        F.dayofweek("d").alias("dw"), F.col("n")
    ).groupBy("dw").agg(
        F.expr(
            "CAST(round(CAST(sum(n) AS DOUBLE) / count(*), 9)"
            " AS DOUBLE)"
        ).alias("dw_mean")
    )
    resid = (
        daily.withColumn("dw", F.dayofweek("d"))
        .join(F.broadcast(dow), "dw")
        .select(
            "d",
            "n",
            "dw_mean",
            F.expr(
                "CAST(round(CAST(n AS DOUBLE) - dw_mean, 9)"
                " AS DOUBLE)"
            ).alias("r"),
        )
    )
    mad = resid.agg(
        F.expr("percentile(abs(r), 0.5)").alias("mad")
    )
    return (
        resid.crossJoin(F.broadcast(mad))
        .select(
            F.col("d").cast("string").alias("day"),
            "n",
            F.round("dw_mean", 6).alias("weekday_mean"),
            F.round(
                F.try_divide(
                    F.col("r"),
                    F.lit(1.4826) * F.col("mad"),
                ),
                6,
            ).alias("robust_z"),
        )
        .filter(
            F.abs(F.col("robust_z")) > F.lit(float(z_threshold))
        )
        .orderBy("day")
    )
