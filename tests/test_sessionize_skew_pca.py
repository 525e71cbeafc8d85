"""Tests for session-id assignment, key-skew diagnostics, and the
distributed PCA projection."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from recmetrics_pyspark_spark.operators.similarity import embedding_pca
from recmetrics_pyspark_spark.operators.skew import key_skew_stats
from recmetrics_pyspark_spark.sources.io import load_table
from recmetrics_pyspark_spark.streaming.windows import assign_session_ids

SF_DIR = "/root/testdata/sf0.001"


def test_assign_session_ids_gap_semantics(spark):
    rows = [
        # user 1: two sessions split by a 31-minute gap
        (1, 1, "2024-01-01 10:00:00"),
        (1, 2, "2024-01-01 10:29:00"),
        (1, 3, "2024-01-01 11:00:01"),
        # user 2: one session, gap exactly at the 30-minute boundary
        # stays in-session (> comparison, not >=)
        (2, 4, "2024-01-01 09:00:00"),
        (2, 5, "2024-01-01 09:30:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        r.event_id: r.session_idx
        for r in assign_session_ids(df, gap_minutes=30).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_key_skew_stats_shares(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 6 + ["b"] * 3 + ["c"] * 1],
        "k string",
    )
    rows = key_skew_stats(df, "k", top_k=2).collect()
    assert [r.key for r in rows] == ["a", "b"]
    assert rows[0].share == 0.6 and rows[0].cum_share == 0.6
    assert rows[1].share == 0.3 and rows[1].cum_share == 0.9
    # TopK must be planned as TakeOrderedAndProject, never a global sort
    plan = key_skew_stats(df, "k", top_k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_embedding_pca_matches_numpy(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    got = {
        r.vec_id: (r.pc1, r.pc2)
        for r in embedding_pca(emb, "vec_id", "embedding").collect()
    }
    pdf = emb.toPandas()
    X = np.array([list(map(float, v)) for v in pdf["embedding"]])
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / (len(X) - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    comps = vecs[:, order]
    for c in range(2):
        j = int(np.argmax(np.abs(comps[:, c])))
        if comps[j, c] < 0:
            comps[:, c] = -comps[:, c]
    want = Xc @ comps
    for vid, (p1, p2) in got.items():
        i = pdf.index[pdf["vec_id"] == vid][0]
        assert abs(p1 - want[i, 0]) < 1e-4, (vid, p1, want[i, 0])
        assert abs(p2 - want[i, 1]) < 1e-4, (vid, p2, want[i, 1])


def test_observe_collects_quality_counters_inline(spark):
    """df.observe: data-quality counters collected DURING a real action
    — no second scan. The pattern for pipeline metrics at 100 TB (the
    write pays for the counters)."""
    from pyspark.sql import Observation

    li = load_table(spark, SF_DIR, "lineitem")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("l_quantity") <= 0, 1).otherwise(0)
        ).alias("bad_qty"),
        F.max("l_shipdate").alias("max_ship"),
    )
    n = observed.count()  # one action drives both result and counters
    got = obs.get
    assert got["n_rows"] == n and got["bad_qty"] == 0
    assert str(got["max_ship"]) >= "1998-01-01"
