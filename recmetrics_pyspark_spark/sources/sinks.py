"""Sinks: parquet (partitioned), CSV, JSON — thin wrappers over the
built-in DataFrameWriter so the engine's write surface is explicit and
tested (partition layout → partition pruning on read-back is the scale
contract: a filtered read must scan only matching directories).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    order_by: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``target_files`` files, optionally range-sorted so min/max row-group
    stats enable data skipping on the sort key. Returns the row count
    (sanity check for the rewrite). Streaming sinks and incremental
    appends fragment storage; periodic compaction is what keeps scan
    task counts sane at 100 TB."""
    df = spark.read.parquet(path)
    n = df.count()
    if order_by:
        out = df.repartitionByRange(target_files, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        out = df.coalesce(target_files)
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    # atomic-ish swap: rewrite target from the compacted copy
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    return n


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table: two tables bucketed on their
    join key by the same bucket count join WITHOUT a shuffle (the
    exchange disappears from the plan) — the pre-partitioning strategy
    for repeatedly-joined 100 TB fact tables."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def zorder_value(col_x: str, col_y: str, bits: int = 16):
    """Morton (Z-order) key for two integer dimensions: interleave the
    low ``bits`` bits of each column (x in even positions, y in odd).

    Built as a sum of shift/mask terms — plain integer arithmetic that
    is bit-identical in Spark and any ANSI engine (the DuckDB oracle
    evaluates the same expression), and stays inside whole-stage
    codegen. Values must be pre-reduced to ``bits`` bits (mask or mod
    upstream); 2×16 bits keeps the key in a BIGINT."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(((CAST({col_x} AS BIGINT) >> {i}) & 1) << {2 * i})"
        )
        terms.append(
            f"(((CAST({col_y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})"
        )
    return F.expr(" + ".join(terms))


def zorder_compact(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite a table Z-ORDERED on two dimensions: range-repartition +
    sort by the Morton key so each output file covers a small rectangle
    of (x, y) space. Point/range predicates on EITHER dimension then
    prune most files from their parquet min/max footer stats — the
    multi-dimensional generalization of compact_parquet's single-key
    range sort, and the standard lakehouse layout for two-column
    selective scans over 100 TB."""
    z = zorder_value(col_x, col_y, bits).alias("__z")
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
