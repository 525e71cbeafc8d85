"""Stream-stream interval join and foreachBatch sink, end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from recmetrics_pyspark_spark.sources.io import load_table
from recmetrics_pyspark_spark.streaming.pipeline import (
    foreach_batch_parquet,
    interval_join_streams,
    stream_events,
)

SF_DIR = "/root/testdata/sf0.001"


def _stage(spark, tmp_path, name, df):
    p = tmp_path / name
    df.coalesce(1).write.parquet(str(p))
    return str(p)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").limit(400).cache()
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", "ts", F.col("event_id").alias("p_id")
    )
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("c_id")
    )
    p_path = _stage(spark, tmp_path, "p", purchases)
    c_path = _stage(spark, tmp_path, "c", clicks)

    joined = interval_join_streams(
        stream_events(spark, p_path),
        stream_events(spark, c_path),
        key="user_id",
        interval="6 hours",
        watermark="30 days",  # static fixture: keep everything in state
    ).select(F.col("l.p_id"), F.col("r.c_id"))
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["p_id"], r["c_id"]) for r in spark.table("ssjoin_sink").collect()
        )
    finally:
        q.stop()
    want = sorted(
        (r["p_id"], r["c_id"])
        for r in purchases.alias("l")
        .join(
            clicks.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 6 hours"))
            & (F.col("r.ts") <= F.col("l.ts")),
        )
        .select("l.p_id", "r.c_id")
        .collect()
    )
    assert got == want and len(want) > 0
    ev.unpersist()


def test_foreach_batch_parquet_sink(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").limit(100)
    src = _stage(spark, tmp_path, "src", ev)
    out = str(tmp_path / "out")
    q = foreach_batch_parquet(
        stream_events(spark, src), out, str(tmp_path / "ck2")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert "_batch_id" in back.columns
