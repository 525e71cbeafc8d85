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
