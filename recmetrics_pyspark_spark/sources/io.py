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
