"""Compaction helper + a reference metric computed over a stream
(long-tail volumes via streaming complete-mode aggregation)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from recmetrics_pyspark_spark.sources.io import load_table
from recmetrics_pyspark_spark.sources.sinks import compact_parquet
from recmetrics_pyspark_spark.streaming.pipeline import stream_events

SF_DIR = "/root/testdata/sf0.001"


def test_compact_parquet_reduces_files(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "fragmented")
    ev.repartition(16).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) == 16
    n = compact_parquet(spark, path, target_files=2, order_by=["ts"])
    assert n == 1000
    assert len(glob.glob(path + "/*.parquet")) == 2
    back = spark.read.parquet(path)
    assert back.count() == 1000


def test_streaming_item_volumes_match_batch(spark, tmp_path):
    # the long-tail volume aggregate (reference long_tail_plot's Spark
    # half) computed over a stream in complete mode
    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    ev.coalesce(2).write.parquet(src)
    stream = stream_events(spark, src)
    vol = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("volume"))
    q = (
        vol.writeStream.format("memory")
        .queryName("vol_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["event_type"]: r["volume"]
            for r in spark.table("vol_sink").collect()
        }
    finally:
        q.stop()
    want = {
        r["event_type"]: r["volume"]
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("volume"))
        .collect()
    }
    assert got == want


def test_read_jsonl_quarantine_splits_clean_and_corrupt(spark, tmp_path):
    from recmetrics_pyspark_spark.sources.io import read_jsonl_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "this is not json at all\n"
        '{"id": 2, "name": "fine"}\n'
        '{"id": "not_a_number", "name": "type-violation"}\n'
        '{"id": 3}\n'  # missing field is NULL, still clean
    )
    clean, quarantine = read_jsonl_quarantine(
        spark, str(p), "id BIGINT, name STRING"
    )
    rows = {r["id"]: r["name"] for r in clean.collect()}
    assert rows == {1: "ok", 2: "fine", 3: None}
    bad = sorted(r["raw_line"] for r in quarantine.collect())
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert any("not_a_number" in b for b in bad)
