"""Regression: events ingestion must work on a session built WITHOUT our
session factory (the driver's harness builds a vanilla SparkSession).

Round-1 failure mode: ``spark.sql.legacy.parquet.nanosAsLong`` was only
set in ``session.get_spark``, so a vanilla session died with
``PARQUET_TYPE_ILLEGAL: INT64 (TIMESTAMP(NANOS))`` on every
events-backed query. ``load_table`` now sets the conf at runtime.
"""

from __future__ import annotations

import pytest

from recmetrics_pyspark_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_events_reads_after_conf_unset(spark):
    # simulate the driver's vanilla session by removing the factory conf
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL"):
            spark.read.parquet(f"{SF_DIR}/events.parquet").schema
        ev = load_table(spark, SF_DIR, "events")
        assert dict(ev.dtypes)["ts"] == "timestamp"
        assert ev.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
