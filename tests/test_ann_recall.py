"""Recall gate for the multi-probe LSH ANN: the approximate top-k must
recover ≥60% of the exact top-k on the synthetic embeddings (a hard,
near-orthogonal corpus — real clustered embeddings do better)."""

from __future__ import annotations

from pyspark.sql import functions as F

from recmetrics_pyspark_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_lsh_topk,
    probe_masks,
)
from recmetrics_pyspark_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_probe_masks():
    masks = probe_masks(4, 2)
    assert masks[0] == 0 and len(masks) == 1 + 4 + 6
    assert all(bin(m).count("1") <= 2 for m in masks)


def test_multiprobe_recall_at_10(spark):
    embs = load_table(spark, SF_DIR, "embeddings")
    qset = embs.filter(F.col("vec_id") < 50)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce_topk(embs, qset, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk(embs, qset, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.60, f"multi-probe recall@10 regressed: {recall:.2%}"


def test_pq_adc_recall_at_10(spark):
    """PQ-ADC recall floor. Context for the low bar: the synthetic
    corpus is ISOTROPIC random vectors — the worst case for product
    quantization, which exploits clustered subspace distributions
    (measured 34% at m=4, 38% at m=16; real embeddings do far
    better). The gate catches regressions in the codebook/encode/ADC
    chain, not the data's intrinsic quantizability."""
    from recmetrics_pyspark_spark.operators.similarity import pq_ann_topk

    embs = load_table(spark, SF_DIR, "embeddings")
    qset = embs.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce_topk(embs, qset, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_ann_topk(embs, qset, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.25, f"PQ-ADC recall@10 regressed: {recall:.2%}"


def test_ivfpq_recall_at_10(spark):
    """IVF-PQ composition: cell restriction + code quantization.
    Measured 40% on the isotropic worst-case corpus (nprobe=3 of 8
    cells); the gate catches chain regressions."""
    from recmetrics_pyspark_spark.operators.similarity import ivfpq_ann_topk

    embs = load_table(spark, SF_DIR, "embeddings")
    qset = embs.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce_topk(embs, qset, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_ann_topk(embs, qset, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.25, f"IVF-PQ recall@10 regressed: {recall:.2%}"


def test_pq_rerank_recall_at_10(spark):
    """Two-stage retrieve-rerank: exact scoring of the ADC top-8k pool
    lifts recall 34% → 90% while touching 16% of the corpus — the gate
    pins the production pattern's payoff."""
    from recmetrics_pyspark_spark.operators.similarity import pq_ann_topk

    embs = load_table(spark, SF_DIR, "embeddings")
    qset = embs.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce_topk(embs, qset, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_ann_topk(embs, qset, k=10, rerank_factor=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.70, f"PQ rerank recall@10 regressed: {recall:.2%}"
