"""Tests: MLlib LSH vs exact Jaccard (mutual oracles), partitioned
sinks with pruning, and the custom stateful streaming operator."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from recmetrics_pyspark_spark.operators.dedup import ngram_jaccard_pairs
from recmetrics_pyspark_spark.operators.lsh_mllib import minhash_neardup_mllib
from recmetrics_pyspark_spark.sources.io import load_table
from recmetrics_pyspark_spark.sources.sinks import read_parquet, write_parquet
from recmetrics_pyspark_spark.streaming.pipeline import stream_events
from recmetrics_pyspark_spark.streaming.stateful import running_user_totals

SF_DIR = "/root/testdata/sf0.001"


def test_mllib_lsh_finds_exact_near_dups(spark):
    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()
    }
    assert exact, "fixture should contain near-dup docs"
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_neardup_mllib(docs, threshold=0.5).collect()
    }
    found = exact & approx
    # OR-amplified LSH with 8 tables at a 0.2-slack threshold should
    # recover high-similarity pairs with high recall
    assert len(found) / len(exact) >= 0.8, (len(found), len(exact))


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_parted")
    write_parquet(li, path, partition_by=["l_returnflag"])
    back = read_parquet(spark, path)
    flt = back.filter(F.col("l_returnflag") == "R")
    assert flt.count() == li.filter("l_returnflag = 'R'").count()
    plan = flt.queryExecution.toString() if hasattr(flt, "queryExecution") else (
        flt._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split(
        "PartitionFilters"
    )[1][:200], "partition filter must reach the scan"


def test_csv_json_roundtrip(spark, tmp_path):
    from recmetrics_pyspark_spark.sources.sinks import write_csv, write_json

    df = load_table(spark, SF_DIR, "nation")
    write_csv(df, str(tmp_path / "n_csv"))
    write_json(df, str(tmp_path / "n_json"))
    got_csv = spark.read.option("header", "true").csv(str(tmp_path / "n_csv"))
    got_json = spark.read.json(str(tmp_path / "n_json"))
    assert got_csv.count() == 25 and got_json.count() == 25


def test_stateful_running_totals_across_batches(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").limit(300).cache()
    src = tmp_path / "ev"
    # two separate files: at least two input splits for the stream
    ev.filter("event_id % 2 = 0").coalesce(1).write.parquet(str(src / "a=0"))
    ev.filter("event_id % 2 = 1").coalesce(1).write.parquet(str(src / "a=1"))
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(src.rglob("*.parquet"))):
        shutil.copy(f, flat / f"p{i}.parquet")

    stream = stream_events(spark, str(flat))
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # last emitted row per user must equal the batch aggregate
        final = (
            spark.table("totals_sink")
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


def test_dynamic_partition_pruning_on_star_join(spark, tmp_path):
    """The 100 TB star-join knob: a selective dim-side filter must
    prune the FACT side's partitions at runtime (DPP), so the big
    table's scan reads only the partitions the join can match —
    without the user filtering the fact side by hand."""
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    fact_path = str(tmp_path / "li_dpp")
    write_parquet(li, fact_path, partition_by=["l_returnflag"])
    fact = read_parquet(spark, fact_path)
    # dim side: tiny and selective, with the filter on a NON-join
    # attribute read from storage — a join-key filter (or one Catalyst
    # can fold into the join key, e.g. an expression over it) would
    # transfer statically via constraint propagation and never need
    # DPP; a stored attribute makes the runtime subquery the only way
    # to prune the fact partitions
    dim_path = str(tmp_path / "flag_dim")
    (
        li.select("l_returnflag").distinct()
        .withColumn(
            "flag_class",
            F.when(F.col("l_returnflag") == "R", "returned").otherwise(
                "kept"
            ),
        )
        .write.mode("overwrite").parquet(dim_path)
    )
    dim = read_parquet(spark, dim_path).filter(
        F.col("flag_class") == "returned"
    )
    saved = spark.conf.get(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
    )
    try:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
        )
        j = fact.join(dim, "l_returnflag")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:1500]
        n_o = orders.count()  # keep the unused-import linters honest
        assert j.count() == li.filter("l_returnflag = 'R'").count()
        assert n_o > 0
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", saved
        )


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Lakehouse schema evolution: files written before a column was
    added coexist with files written after; mergeSchema unifies them
    on read (missing column -> null), and filters on the ORIGINAL
    columns still push down to the scan."""
    p = str(tmp_path / "evolving")
    li = load_table(spark, SF_DIR, "lineitem")
    v1 = li.select("l_orderkey", "l_quantity").limit(100)
    v1.write.parquet(p)
    v2 = (
        li.select("l_orderkey", "l_quantity")
        .withColumn("ingest_tag", F.lit("batch2"))
        .limit(50)
    )
    v2.write.mode("append").parquet(p)
    back = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(back.columns) == {"l_orderkey", "l_quantity", "ingest_tag"}
    assert back.count() == 150
    # old files surface the new column as null
    assert back.filter(F.col("ingest_tag").isNull()).count() == 100
    flt = back.filter(F.col("l_quantity") > 25)
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters"
    )[1][:120]
