"""Join operators Spark's API lacks as primitives: as-of join and
range (interval) self-join — composed from built-in DataFrame ops
(SURVEY.md build rule: composition first, Pandas UDF only if semantics
demand it; these don't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the matching right row for the same
    key (time-series point-in-time lookup; DuckDB ASOF JOIN / pandas
    merge_asof semantics):

    - ``direction="backward"`` (default): the LATEST right row with
      right_ts <= left_ts;
    - ``direction="forward"``: the EARLIEST right row with
      right_ts >= left_ts (equal timestamps match in both modes);
    - ``tolerance_seconds``: matches farther than this from the left
      timestamp are nulled out (pandas merge_asof's ``tolerance``) —
      applied as a post-projection, so the plan is unchanged.

    Plan: tag + union both sides, then one partitioned sort per key with
    ``last(..., ignorenulls)`` carrying the most recent right values
    forward (scan DESCENDS for the forward direction) — a single
    shuffle on the key, no per-row range probe, no quadratic blow-up.
    The sort is within key partitions only (no global ordering), so it
    scales with the hottest key, not the table.

    Rows tie-breaking: at equal timestamps the right row sorts BEFORE
    the left row (matches the inclusive comparison); multiple right
    rows at the same (key, ts) should be pre-deduplicated by the caller
    for determinism.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction: {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    lt = left.select(
        F.col(on),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (on,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on,)],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    t_order = F.col("_t") if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(t_order, F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        F.last(F.col("_r_ts"), ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        # MICROSECOND granularity, not SECOND: Spark's timestampdiff
        # truncates whole units while other engines count boundary
        # crossings — at microseconds both are exact, so the tolerance
        # edge is engine-portable. (timestampdiff, not a double cast:
        # events timestamps are ntz and epoch-nanos exceed double's
        # mantissa — see sources/io.py.)
        gap = F.expr(
            f"abs(timestampdiff(MICROSECOND, `{right_ts}{suffix}`, _t))"
        )
        within = F.col(f"{right_ts}{suffix}").isNotNull() & (
            gap <= tolerance_seconds * 1_000_000
        )
        out = out.select(
            *[c for c in out.columns
              if not c.endswith(suffix)],
            *[
                F.when(within, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in right_cols
            ],
            F.when(within, F.col(f"{right_ts}{suffix}")).alias(
                f"{right_ts}{suffix}"
            ),
        )
    keep = (
        [on]
        + [c for c in left.columns if c != on]
        + [f"{c}{suffix}" for c in right_cols]
        + [f"{right_ts}{suffix}"]
    )
    return out.select(*keep)


def range_self_join(
    df: DataFrame,
    key: str,
    col_ts: str = "ts",
    col_id: str = "event_id",
    max_gap_seconds: int = 300,
) -> DataFrame:
    """All pairs of rows with the same key whose timestamps lie within
    ``max_gap_seconds`` of each other (id_a < id_b).

    Banded plan: bucket each row to ⌊t/gap⌋ and replicate one side into
    its neighbouring buckets — every qualifying pair shares a
    (key, bucket) cell (the pair orientation is by id, not time, so the
    replicated side must cover both directions: buckets b−1, b, b+1).
    The join is then equi on (key, bucket) and the exact predicate only
    filters within cells; work is linear in cell occupancy — the
    standard interval-join strategy, never key² unless all timestamps
    collide."""
    bucket = (F.unix_timestamp(F.col(col_ts)) / max_gap_seconds).cast("long")
    a = (
        df.select(
            F.col(key),
            F.col(col_id).alias("id_a"),
            F.col(col_ts).alias("ts_a"),
            bucket.alias("_b0"),
        )
        .withColumn(
            "_bucket",
            F.explode(
                F.array(F.col("_b0") - 1, F.col("_b0"), F.col("_b0") + 1)
            ),
        )
        .drop("_b0")
    )
    b = df.select(
        F.col(key),
        F.col(col_id).alias("id_b"),
        F.col(col_ts).alias("ts_b"),
        bucket.alias("_bucket"),
    )
    return (
        a.join(b, [key, "_bucket"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(
                    F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a")
                )
                <= max_gap_seconds
            )
        )
        .select(
            key,
            "id_a",
            "id_b",
            (F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a")).alias(
                "gap_seconds"
            ),
        )
        .distinct()
    )
