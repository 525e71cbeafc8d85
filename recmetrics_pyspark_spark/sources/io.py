"""Parquet sources for the driver testdata star schema (TESTDATA.md).

The reference ingests only driver-built DataFrames
(reference recmetrics_pyspark.py:264-267, usage_examples.ipynb cells 23-24);
our engine reads columnar files so Catalyst gets predicate pushdown,
column pruning, and partition pruning at the scan (check
``.explain``'s PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table; scans stay lazy for pushdown.

    `events.ts` is TIMESTAMP(NANOS) in the parquet footer, which Spark
    reads as nanos-since-epoch long under
    ``spark.sql.legacy.parquet.nanosAsLong``; convert to a microsecond
    timestamp here (lossless for this data — no sub-microsecond
    components exist).

    The conf is set at runtime (it is a runtime-settable SQL conf), so
    this works on ANY SparkSession — including a vanilla one built
    outside our session factory. Without it the read dies with
    ``PARQUET_TYPE_ILLEGAL: INT64 (TIMESTAMP(NANOS))``.
    """
    if name == "events":
        # runtime-settable: flips the vectorized reader to expose
        # TIMESTAMP(NANOS) columns as bigint instead of erroring
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, NOT `/`: epoch-nanos exceed double's 53-bit
        # mantissa, so float division drifts by whole microseconds
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced JSONL ingestion with a quarantine lane: rows
    that parse cleanly against ``schema`` flow on; malformed lines are
    RETAINED (not silently dropped) in a second DataFrame carrying the
    raw text, ready for a dead-letter sink. This is the ingestion-QA
    front door a 100 TB pipeline needs — PERMISSIVE mode with an
    explicit ``_corrupt_record`` column, split into (clean, quarantine).

    One scan feeds both outputs (same cached source plan); at scale,
    write the quarantine lane to its own path and alert on its volume
    (see operators/quality.py for the gate shape).

    Caveat baked into the split: Spark leaves ALL other columns null on
    a corrupt row, so cleanliness is `_corrupt_record IS NULL`, which
    also quarantines lines that are valid JSON but violate the schema's
    types — exactly what you want for a typed pipeline."""
    df = (
        spark.read.schema(schema + ", _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    ).cache()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    quarantine = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return clean, quarantine


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` works too."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
