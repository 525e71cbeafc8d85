"""Structured Streaming end-to-end: the SAME window operators that the
batch oracle checks, driven through readStream → watermark → memory
sink, plus stateful dedup-within-watermark.

Strategy: stage the sf0.001 events parquet into a tmp dir in two
chunks (a real file stream), run the streaming query in complete mode,
and assert the final result equals the batch result — the oracle chain
is then: DuckDB SQL ≡ batch DataFrame ≡ streaming DataFrame.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from recmetrics_pyspark_spark.sources.io import load_table
from recmetrics_pyspark_spark.streaming import (
    dedup_within_watermark,
    run_to_memory_sink,
    session_stats,
    stream_events,
    tumbling_counts,
    with_watermark,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def staged_events(spark, tmp_path):
    """Events split into two parquet files arriving in one directory."""
    ev = load_table(spark, SF_DIR, "events").cache()
    half1 = ev.filter("event_id % 2 = 0")
    half2 = ev.filter("event_id % 2 = 1")
    src = tmp_path / "events_stream"
    half1.write.parquet(str(src / "chunk=0"))
    half2.write.parquet(str(src / "chunk=1"))
    # flatten: memory-stream dir must contain plain parquet files
    flat = tmp_path / "flat"
    flat.mkdir()
    i = 0
    for sub in sorted(src.rglob("*.parquet")):
        shutil.copy(sub, flat / f"part-{i:03d}.parquet")
        i += 1
    yield str(flat), ev
    ev.unpersist()


def _collect_canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_streaming_tumbling_equals_batch(spark, staged_events, tmp_path):
    flat, ev = staged_events
    stream = stream_events(spark, flat)
    agg = tumbling_counts(with_watermark(stream, "ts", "1 hour"))
    q = run_to_memory_sink(
        agg, "tumbling_sink", "complete", str(tmp_path / "ckpt1")
    )
    try:
        got = _collect_canon(
            spark.table("tumbling_sink"),
            ["window_start", "event_type", "n_events", "sum_value"],
        )
        want = _collect_canon(
            tumbling_counts(ev),
            ["window_start", "event_type", "n_events", "sum_value"],
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_sessions_equal_batch(spark, staged_events, tmp_path):
    flat, ev = staged_events
    stream = stream_events(spark, flat)
    agg = session_stats(with_watermark(stream, "ts", "1 hour"))
    q = run_to_memory_sink(
        agg, "session_sink", "complete", str(tmp_path / "ckpt2")
    )
    try:
        got = _collect_canon(
            spark.table("session_sink"),
            ["user_id", "session_start", "session_end", "n_events"],
        )
        want = _collect_canon(
            session_stats(ev),
            ["user_id", "session_start", "session_end", "n_events"],
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    # duplicate every event once; streaming dedup must keep one copy
    ev = load_table(spark, SF_DIR, "events").limit(200)
    dup = ev.unionByName(ev)
    src = tmp_path / "dups"
    dup.coalesce(2).write.parquet(str(src))
    stream = stream_events(spark, str(src))
    deduped = dedup_within_watermark(stream, ["event_id"], "ts", "1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.table("dedup_sink").count()
        n_src = ev.count()
        assert n == n_src, f"expected {n_src} unique events, got {n}"
    finally:
        q.stop()


def test_foreach_batch_rollup_matches_batch_aggregate(spark, tmp_path):
    from recmetrics_pyspark_spark.streaming.pipeline import (
        foreach_batch_rollup,
    )

    ev = (
        load_table(spark, SF_DIR, "events")
        .filter("user_id % 29 = 0")
        .persist()
    )
    src = tmp_path / "src"
    ev.filter("event_id % 2 = 0").coalesce(1).write.parquet(str(src / "a=0"))
    ev.filter("event_id % 2 = 1").coalesce(1).write.parquet(str(src / "a=1"))
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(src.rglob("*.parquet"))):
        shutil.copy(f, flat / f"p{i}.parquet")

    rollup_path = str(tmp_path / "rollup")
    stream = stream_events(spark, str(flat))
    q = foreach_batch_rollup(
        stream,
        rollup_path,
        str(tmp_path / "ck"),
        group_cols=["event_type"],
        col_value="value",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from recmetrics_pyspark_spark.streaming.pipeline import read_rollup

    got = {
        r.event_type: (r.n_rows, round(r.sum_value, 4))
        for r in read_rollup(spark, rollup_path).drop("_last_batch").collect()
    }
    # snapshot hygiene: _CURRENT names the one surviving snapshot dir,
    # superseded versions are pruned after the atomic pointer flip
    import os

    with open(os.path.join(rollup_path, "_CURRENT")) as fh:
        snap = fh.read().strip()
    versions = [d for d in os.listdir(rollup_path) if d.startswith("v_")]
    assert versions == [snap]
    want = {
        r.event_type: (r.n, round(r.s, 4))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    ev.unpersist()
    assert got == want


def test_streaming_drift_monitor_flags_shifted_batch(spark, tmp_path):
    """foreach_batch_drift: a batch drawn from the baseline
    distribution scores near-zero PSI; a shifted batch alerts."""
    import datetime as dt

    from recmetrics_pyspark_spark.streaming.pipeline import (
        baseline_histogram,
        foreach_batch_drift,
    )

    t0 = dt.datetime(2024, 1, 1)
    base_rows = [
        (t0, "clicks", float(i % 10)) for i in range(200)
    ]
    baseline = baseline_histogram(
        spark.createDataFrame(base_rows, ["ts", "event_type", "value"])
    )
    src = tmp_path / "drift_src"
    src.mkdir()
    # batch 0: same distribution; batch 1: shifted by +90
    spark.createDataFrame(
        [(t0, "clicks", float(i % 10)) for i in range(100)],
        ["ts", "event_type", "value"],
    ).coalesce(1).write.parquet(str(src / "stage0"))
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "stage*" / "*.parquet"))
    )
    out = tmp_path / "drift_out"
    q = foreach_batch_drift(
        stream, baseline, str(out), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    spark.createDataFrame(
        [(t0, "clicks", 90.0 + i % 10) for i in range(100)],
        ["ts", "event_type", "value"],
    ).coalesce(1).write.parquet(str(src / "stage1"))
    q.processAllAvailable()
    q.stop()
    rows = sorted(
        spark.read.parquet(str(out)).collect(),
        key=lambda r: r["batch_id"],
    )
    assert len(rows) == 2
    same, shifted = rows
    assert same["n_events"] == 100 and not same["drift_alert"]
    assert same["psi"] < 0.1
    assert shifted["drift_alert"] and shifted["psi"] > 0.2


def test_foreach_batch_rollup_failure_paths(spark, tmp_path):
    """Crash-safety contract (r2 ADVICE): an orphan half-written
    snapshot never shadows the pointed-to state, and a corrupted
    CURRENT snapshot fails the stream loudly instead of silently
    reinitializing the rollup from one batch's delta."""
    import os
    import shutil

    from recmetrics_pyspark_spark.streaming.pipeline import (
        foreach_batch_rollup,
        read_rollup,
    )

    ev = load_table(spark, SF_DIR, "events").filter("user_id % 29 = 0")
    flat = tmp_path / "flat"
    flat.mkdir()
    ev.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "one"))
    for i, f in enumerate(sorted((tmp_path / "one").glob("*.parquet"))):
        shutil.copy(f, flat / f"p{i}.parquet")

    rollup_path = str(tmp_path / "rollup")
    q = foreach_batch_rollup(
        stream_events(spark, str(flat)),
        rollup_path,
        str(tmp_path / "ck"),
        group_cols=["event_type"],
        col_value="value",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    baseline = {
        r.event_type: r.n_rows
        for r in read_rollup(spark, rollup_path).collect()
    }

    # 1) a writer that died mid-snapshot leaves an orphan v_ dir and no
    #    pointer flip: reads keep resolving the good snapshot
    orphan = os.path.join(rollup_path, "v_999")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-junk.parquet"), "wb") as fh:
        fh.write(b"\x00not parquet")
    got = {
        r.event_type: r.n_rows
        for r in read_rollup(spark, rollup_path).collect()
    }
    assert got == baseline

    # 2) the pointed-to snapshot itself is corrupt: the next batch must
    #    RAISE (propagate through the streaming query), never fall back
    #    to "first batch" and zero accumulated state
    with open(os.path.join(rollup_path, "_CURRENT")) as fh:
        snap = fh.read().strip()
    for f in os.listdir(os.path.join(rollup_path, snap)):
        if f.endswith(".parquet"):
            os.remove(os.path.join(rollup_path, snap, f))
    shutil.copy(
        next((tmp_path / "one").glob("*.parquet")), flat / "p_extra.parquet"
    )
    q2 = foreach_batch_rollup(
        stream_events(spark, str(flat)),
        rollup_path,
        str(tmp_path / "ck2"),
        group_cols=["event_type"],
        col_value="value",
    )
    import pytest as _pytest

    try:
        with _pytest.raises(Exception):
            q2.processAllAvailable()
            q2.awaitTermination()
    finally:
        q2.stop()
    # and the corrupted-but-pointed snapshot was NOT replaced by a
    # delta-only reinit: the pointer still names the same snapshot
    with open(os.path.join(rollup_path, "_CURRENT")) as fh:
        assert fh.read().strip() == snap


def test_foreach_batch_neardup_stream_matches_sequential_batches(
    spark, tmp_path
):
    """Streaming near-dup ingest ≡ the batch operator applied batch by
    batch, and the signature index accumulates across micro-batches."""
    import shutil

    from recmetrics_pyspark_spark.streaming.pipeline import (
        foreach_batch_neardup,
    )

    b1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
        ],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [
            # near-dup of a BATCH-1 doc: proves the index accumulated
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "red green blue cyan magenta yellow black white"),
        ],
        ["doc_id", "text"],
    )
    src = tmp_path / "src"
    src.mkdir()
    # stage batch 1, run, then stage batch 2 so the stream sees two
    # distinct micro-batches
    b1.coalesce(1).write.parquet(str(tmp_path / "b1"))
    shutil.copy(
        next((tmp_path / "b1").glob("*.parquet")), src / "b1.parquet"
    )
    schema = spark.read.parquet(str(src)).schema
    state, dec, ck = (
        str(tmp_path / "state"), str(tmp_path / "dec"), str(tmp_path / "ck")
    )

    def run_available():
        q = foreach_batch_neardup(
            spark.readStream.schema(schema).parquet(str(src)),
            state, dec, ck,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_available()
    b2.coalesce(1).write.parquet(str(tmp_path / "b2"))
    shutil.copy(
        next((tmp_path / "b2").glob("*.parquet")), src / "b2.parquet"
    )
    run_available()

    decisions = {
        r.doc_id: (r.status, r.match_id)
        for r in spark.read.parquet(dec + "/batch=*").collect()
    }
    assert decisions[1] == ("new", None)
    assert decisions[2] == ("new", None)
    assert decisions[10] == ("near_dup", 1)
    assert decisions[11] == ("new", None)
    # the index holds every ingested doc's signatures
    idx_ids = {
        r.doc_id
        for r in spark.read.parquet(state + "/batch=*").collect()
    }
    assert idx_ids == {1, 2, 10, 11}


def test_neardup_batch_retry_is_idempotent(spark, tmp_path):
    """A foreachBatch RETRY of batch N (crash between the state write
    and the checkpoint commit) must reproduce the first attempt's
    decisions exactly: the index read filters batch < N, so the
    retried docs never match their own failed-attempt signatures."""
    from recmetrics_pyspark_spark.streaming.pipeline import (
        classify_neardup_batch,
    )

    state = str(tmp_path / "state")
    dec = str(tmp_path / "dec")
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    b1 = spark.createDataFrame(
        [
            # near-dup of the batch-0 doc...
            (10, "alpha beta gamma delta epsilon zeta eta theta omega"),
            # ...and a doc similar to NOTHING indexed: on a buggy
            # retry it would match its own stale signatures
            (11, "red green blue cyan magenta yellow black white"),
        ],
        ["doc_id", "text"],
    )
    classify_neardup_batch(b0, 0, state, dec)
    classify_neardup_batch(b1, 1, state, dec)
    first = sorted(
        (r.doc_id, r.status, r.match_id)
        for r in spark.read.parquet(dec + "/batch=1").collect()
    )
    assert first == [(10, "near_dup", 1), (11, "new", None)]
    # simulate the crashed-retry: state/batch=1 already exists
    classify_neardup_batch(b1, 1, state, dec)
    retry = sorted(
        (r.doc_id, r.status, r.match_id)
        for r in spark.read.parquet(dec + "/batch=1").collect()
    )
    assert retry == first


def test_neardup_batch_string_ids_schema_stable(spark, tmp_path):
    """First-batch 'new' decisions must carry match_id in the id
    column's OWN type; with string doc ids a hardcoded long would make
    the batch=* union read fail or mis-merge."""
    from recmetrics_pyspark_spark.streaming.pipeline import (
        classify_neardup_batch,
    )

    state = str(tmp_path / "state")
    dec = str(tmp_path / "dec")
    b0 = spark.createDataFrame(
        [("a1", "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    b1 = spark.createDataFrame(
        [("b7", "alpha beta gamma delta epsilon zeta eta theta omega")],
        ["doc_id", "text"],
    )
    classify_neardup_batch(b0, 0, state, dec)
    classify_neardup_batch(b1, 1, state, dec)
    rows = {
        r.doc_id: (r.status, r.match_id)
        for r in spark.read.parquet(dec + "/batch=*").collect()
    }
    assert rows == {"a1": ("new", None), "b7": ("near_dup", "a1")}


def test_streaming_rollup_feeds_anomaly_monitor(spark, tmp_path):
    """Composition e2e: a streaming-maintained daily rollup (the MV)
    drives the batch trailing-window anomaly monitor, and the result
    equals running the monitor over the raw events directly — the
    production shape where the stream maintains the day-grain state
    and the monitor never rescans the event history."""
    import shutil

    from recmetrics_pyspark_spark.operators.timeseries import (
        trailing_window_anomaly,
    )
    from recmetrics_pyspark_spark.streaming.pipeline import (
        foreach_batch_rollup,
        read_rollup,
    )

    ev = (
        load_table(spark, SF_DIR, "events")
        .filter("user_id % 17 = 0")
        .persist()
    )
    src = tmp_path / "src"
    ev.filter("event_id % 2 = 0").coalesce(1).write.parquet(str(src / "a=0"))
    ev.filter("event_id % 2 = 1").coalesce(1).write.parquet(str(src / "a=1"))
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(src.rglob("*.parquet"))):
        shutil.copy(f, flat / f"p{i}.parquet")

    rollup_path = str(tmp_path / "rollup")
    stream = stream_events(spark, str(flat)).withColumn(
        "day", F.to_date("ts")
    )
    q = foreach_batch_rollup(
        stream,
        rollup_path,
        str(tmp_path / "ck"),
        group_cols=["event_type", "day"],
        col_value="value",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # feed the MAINTAINED rollup into the monitor (day-grain rows
    # re-aggregate to themselves inside trailing_window_anomaly)
    mv = read_rollup(spark, rollup_path).select(
        "event_type",
        F.col("day").cast("timestamp").alias("ts"),
        F.col("sum_value").alias("value"),
    )
    from_mv = sorted(
        (r.key, str(r.day), r.v, r.z_score, r.is_anomaly)
        for r in trailing_window_anomaly(
            mv, "event_type", "ts", "value"
        ).collect()
    )
    from_raw = sorted(
        (r.key, str(r.day), r.v, r.z_score, r.is_anomaly)
        for r in trailing_window_anomaly(
            ev, "event_type", "ts", "value"
        ).collect()
    )
    ev.unpersist()
    assert from_mv == from_raw
    assert len(from_raw) > 0
