"""Structured Streaming plumbing: sources, watermarks, stateful dedup,
and a test/debug memory sink runner.

Streams are just unbounded DataFrames here — every operator in
``streaming.windows`` composes onto either. Late data policy is a
watermark (state cleanup + late-row drop); duplicate delivery is
handled by ``dropDuplicatesWithinWatermark`` (bounded state, unlike a
global dropDuplicates on a stream).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def stream_events(
    spark: SparkSession, events_dir: str, schema=None
) -> DataFrame:
    """File-based stream over an events parquet directory. The driver
    testdata ships single files; for a stream source pass a directory
    into which files arrive (tests stage chunks into a tmp dir)."""
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def with_watermark(
    df: DataFrame, col_ts: str = "ts", delay: str = "30 minutes"
) -> DataFrame:
    """Late-data policy: rows later than max(event time) − delay are
    dropped from stateful ops, and window/session state older than the
    watermark is evicted — this is what bounds state at 100 TB/day."""
    return df.withWatermark(col_ts, delay)


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    col_ts: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates of a key are
    suppressed as long as they arrive within the watermark horizon."""
    return df.withWatermark(col_ts, delay).dropDuplicatesWithinWatermark(keys)


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
):
    """Run a streaming query into the in-memory sink and block until all
    available input is processed; returns the StreamingQuery (stop it and
    read ``spark.table(query_name)``). Test/debug only — real sinks are
    parquet/kafka/console via the same writeStream surface."""
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.processAllAvailable()
    return q
