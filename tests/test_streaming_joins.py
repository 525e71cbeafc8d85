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


def test_stream_static_enrichment_broadcasts_dim(spark, tmp_path):
    """enrich_with_dim: streamed events joined against a static user
    dim equal the batch join, and the dim side is broadcast."""
    from recmetrics_pyspark_spark.sources.io import load_table
    from recmetrics_pyspark_spark.streaming.pipeline import (
        run_to_memory_sink,
    )
    from recmetrics_pyspark_spark.streaming.windows import enrich_with_dim

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    dim = (
        ev.select("user_id").distinct()
        .withColumn("user_tier", (F.col("user_id") % 3).cast("int"))
        .cache()
    )
    src = _stage(spark, tmp_path, "enrich_ev", ev)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    enriched = enrich_with_dim(stream, dim, on="user_id")
    q = run_to_memory_sink(
        enriched, "enriched_mem", output_mode="append",
        checkpoint_dir=str(tmp_path / "ck_enrich"),
    )
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.table("enriched_mem")
        .select("event_id", "user_tier")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in ev.join(dim, "user_id").select("event_id", "user_tier").collect()
    )
    assert got == want
    # plan check on the BATCH twin (same code path; a streaming DF's
    # queryExecution can't be inspected outside writeStream.start())
    batch_plan = (
        enrich_with_dim(ev, dim, on="user_id")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "broadcast" in batch_plan.lower()


def test_windowed_topk_serving_matches_batch(spark, tmp_path):
    """windowed_topk_to_parquet: closed windows' top-k blocks equal the
    batch tumbling-count ranking for those windows."""
    import datetime as dt

    from pyspark.sql.window import Window as W

    from recmetrics_pyspark_spark.streaming.windows import (
        windowed_topk_to_parquet,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(3):
        for i in range(40):
            # per-hour composition differs so top-3 changes per window
            et = ["a", "b", "c", "d"][(i + h) % 4 if i % 5 else 0]
            rows.append((t0 + dt.timedelta(hours=h, seconds=i), et))
    ev = spark.createDataFrame(rows, ["ts", "event_type"])
    src = _stage(spark, tmp_path, "topk_ev", ev)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = tmp_path / "topk_out"
    q = windowed_topk_to_parquet(
        stream, str(out), str(tmp_path / "ck_topk"), k=3
    )
    q.processAllAvailable()
    # advance the watermark far enough to close every window
    late = spark.createDataFrame(
        [(t0 + dt.timedelta(hours=10), "a")], ["ts", "event_type"]
    )
    late.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(out))
        .select("window_start", "event_type", "n", "rnk")
        .collect()
    )
    batch = (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    wr = W.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    want = sorted(
        tuple(r)
        for r in batch.withColumn("rnk", F.row_number().over(wr))
        .filter("rnk <= 3")
        .collect()
    )
    assert got == want and len(got) == 9
