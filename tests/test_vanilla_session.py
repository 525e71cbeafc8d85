"""Regression: events ingestion must work on a session built WITHOUT our
session factory (the driver's harness builds a vanilla SparkSession).

Round-1 failure mode: the driver's testdata shipped TIMESTAMP(NANOS)
parquet and ``spark.sql.legacy.parquet.nanosAsLong`` was only set in
``session.get_spark``, so a vanilla session died with
``PARQUET_TYPE_ILLEGAL`` on every events-backed query. ``load_table``
now sets the conf at runtime (kept as defense), and the regenerated
round-2 testdata is TIMESTAMP(MICROS) — so the contract to pin is:
events reads on ANY session, ts comes back timestamp-typed, and the
bigint→timestamp fallback still fires if a nanos file ever reappears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from recmetrics_pyspark_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_events_reads_after_conf_unset(spark):
    # simulate the driver's vanilla session by removing the factory conf
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        ev = load_table(spark, SF_DIR, "events")
        assert dict(ev.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
        assert ev.count() > 0
        # event time must be real (not 1970): min year of the synth data
        years = ev.agg(F.min(F.year("ts")).alias("y")).collect()[0]
        assert years["y"] >= 2000
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_nanos_fallback_converts_bigint(spark, tmp_path):
    # if a nanos-as-long read ever yields bigint again, load_table must
    # convert losslessly via integer div (not float division)
    df = spark.range(3).select(
        F.col("id").alias("event_id"),
        (F.lit(1_700_000_000_000_000_000) + F.col("id")).alias("ts"),
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = load_table(spark, str(tmp_path), "events")
    assert dict(out.dtypes)["ts"] == "timestamp"
    got = out.agg(F.min(F.year("ts")).alias("y")).collect()[0]
    assert got["y"] == 2023
