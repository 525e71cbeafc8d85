"""transformWithStateInPandas (Spark 4 arbitrary-state API): the
running-totals processor must converge to the batch aggregate, exactly
like its applyInPandasWithState twin."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from recmetrics_pyspark_spark.sources.io import load_table
from recmetrics_pyspark_spark.streaming.pipeline import stream_events
from recmetrics_pyspark_spark.streaming.stateful import running_user_totals_tws

SF_DIR = "/root/testdata/sf0.001"


def _has_protobuf() -> bool:
    # the transformWithState python<->JVM state-server protocol is
    # protobuf-based; without the package the streaming python worker
    # crashes at init (verified: ImportError in StateMessage_pb2)
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    running_user_totals_tws is None, reason="requires Spark 4 state API"
)
@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState state server needs google.protobuf",
)
def test_transform_with_state_totals_match_batch(spark, tmp_path):
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter("user_id % 37 = 0")
        .persist()
    )
    src = tmp_path / "src"
    # two files so the stream sees at least two micro-batch inputs
    ev.filter("event_id % 2 = 0").coalesce(1).write.parquet(str(src / "a=0"))
    ev.filter("event_id % 2 = 1").coalesce(1).write.parquet(str(src / "a=1"))
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(src.rglob("*.parquet"))):
        shutil.copy(f, flat / f"p{i}.parquet")

    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = stream_events(spark, str(flat))
    q = (
        running_user_totals_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_totals_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        final = (
            spark.table("tws_totals_sink")
            .groupBy("user_id")
            .agg(
                F.max("n_events_total").alias("n"),
                F.max("sum_value_total").alias("s"),
            )
        )
        got = {
            r["user_id"]: (r["n"], round(r["s"], 6)) for r in final.collect()
        }
        want = {
            r["user_id"]: (r["n"], round(r["s"], 6))
            for r in ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        assert got == want
    finally:
        q.stop()
        ev.unpersist()
