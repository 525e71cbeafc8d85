"""Event-time window aggregations over the `events` table.

The reference has no streaming surface at all (SURVEY.md §2.11); these
are the Structured-Streaming-native operators the testdata's events
stream calls for. Each function is a plain DataFrame transform, so the
SAME code runs in batch (oracle-checkable against DuckDB gaps-and-
islands / time_bucket SQL) and on a ``readStream`` input (exercised in
tests/test_streaming.py with watermarks).

Windowed aggregation state is partitioned by (key, window) — at scale
the shuffle is bounded by key-cardinality × open windows, and the
watermark bounds state retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    col_ts: str = "ts",
    size: str = "1 hour",
    key: str = "event_type",
    col_value: str = "value",
) -> DataFrame:
    """Fixed tumbling windows: count + value sum per (window, key)."""
    return (
        df.groupBy(F.window(F.col(col_ts), size).alias("win"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(col_value), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            key,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    col_ts: str = "ts",
    size: str = "1 hour",
    slide: str = "30 minutes",
    key: str = "event_type",
) -> DataFrame:
    """Sliding (hopping) windows: every event lands in size/slide
    overlapping windows; Spark expands them natively inside the window
    expression (no explicit row duplication in our plan)."""
    return (
        df.groupBy(F.window(F.col(col_ts), size, slide).alias("win"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            key,
            "n_events",
        )
    )


def session_stats(
    df: DataFrame,
    col_ts: str = "ts",
    gap: str = "10 minutes",
    key: str = "user_id",
    col_value: str = "value",
) -> DataFrame:
    """Session windows: activity runs per key closed by ``gap`` of
    silence. Session end = last event + gap (Spark semantics; the DuckDB
    oracle reproduces it with a lag/cumsum gaps-and-islands plan)."""
    return (
        df.groupBy(
            F.session_window(F.col(col_ts), gap).alias("win"), F.col(key)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(col_value), 6).alias("sum_value"),
        )
        .select(
            F.col(key),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_first_per_window(
    df: DataFrame,
    keys: list[str],
    col_ts: str = "ts",
    window: str = "hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Batch twin of ``pipeline.dedup_within_watermark``: keep the FIRST
    event per (keys, time-bucket), deterministic via (ts, tiebreak)
    ordering. In batch the "watermark horizon" becomes an explicit
    date_trunc bucket, which makes the semantics exactly SQL-mirrorable
    (the streaming variant's state horizon depends on arrival order and
    is checked by the streaming e2e tests instead). One shuffle on
    (keys, bucket); per-group state is the window's events, bounded by
    the bucket width."""
    from pyspark.sql.window import Window

    bucket = F.date_trunc(window, F.col(col_ts)).alias("bucket")
    order = [F.col(col_ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys, "bucket").orderBy(*order)
    return (
        df.select("*", bucket)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def assign_session_ids(
    df: DataFrame,
    key: str = "user_id",
    col_ts: str = "ts",
    gap_minutes: int = 30,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-EVENT session assignment — the row-level twin of
    ``session_stats``: every event gets its key's session ordinal
    (1-based), where a new session starts after ``gap_minutes`` of
    silence. Classic gaps-and-islands: one lag + one running sum over
    the SAME (key, ts) window, so the whole thing is a single shuffle
    by key and two window passes over each partition — no self-join,
    no explode. Deterministic ordering via the tiebreak column (equal
    timestamps otherwise make lag() nondeterministic)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.col(col_ts), F.col(tiebreak))
    # timestampdiff is timezone-free (works on TIMESTAMP_NTZ directly),
    # so the gap test is identical under any session timezone
    with_prev = df.select(key, tiebreak, col_ts).withColumn(
        "__prev", F.lag(F.col(col_ts)).over(w)
    )
    # MICROSECOND granularity: second-level datediff truncates toward
    # boundaries differently across engines; at the data's native
    # microsecond precision the comparison is exact everywhere
    gap_us = F.expr(f"timestampdiff(MICROSECOND, __prev, {col_ts})")
    new_sess = F.when(
        F.col("__prev").isNull() | (gap_us > gap_minutes * 60 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return with_prev.select(
        key,
        tiebreak,
        col_ts,
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint").alias("session_idx"),
    )


def enrich_with_dim(
    stream_df: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join each arriving micro-batch against
    a static dimension table. The dim side is explicitly broadcast —
    stream-static joins must never shuffle the unbounded side on the
    dim's account; the static table re-resolves per micro-batch, so a
    dim refreshed in place (overwrite of the backing files) is picked
    up without restarting the query. Stateless: no watermark, no state
    store — works in append mode on any stream."""
    return stream_df.join(F.broadcast(dim), on, how)


def windowed_topk_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    k: int = 3,
    window: str = "1 hour",
    watermark: str = "2 hours",
    col_ts: str = "ts",
    col_key: str = "event_type",
):
    """Per-window top-k serving table: tumbling counts aggregate in the
    stream (state bounded by watermark), and each micro-batch's emitted
    FINAL windows are ranked in foreachBatch (rank-over-window is not
    allowed on a streaming aggregate — ranking the append-mode output
    is the supported pattern and only touches closed windows). The
    serving parquet accumulates one top-k block per closed window.

    Scale: the streaming aggregate's shuffle is (key, window)-bounded;
    the per-batch rank runs over closed-windows × keys rows only."""
    from pyspark.sql.window import Window as W

    counts = (
        stream_df.withWatermark(col_ts, watermark)
        .groupBy(F.window(col_ts, window).alias("w"), F.col(col_key))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            col_key,
            "n",
        )
    )

    def rank_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = W.partitionBy("window_start").orderBy(
            F.desc("n"), F.asc(col_key)
        )
        (
            batch_df.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .write.mode("append").parquet(path)
        )

    return (
        counts.writeStream.outputMode("append")
        .foreachBatch(rank_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
