"""Unit semantics for the round-3 curation operators (oracle parity
covers value equivalence; these pin the edge-case contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recmetrics_pyspark_spark.functions.curation import (
    curriculum_order,
    dpo_pair_mining,
    loss_mask_spans,
    seqlen_histogram,
)


def test_dpo_pair_mining_tiebreaks_and_margin(spark):
    ratings = spark.createDataFrame(
        [
            # user 1: clear winner/loser, margin 4
            (1, 10, 5.0), (1, 11, 1.0), (1, 12, 3.0),
            # user 2: all tied -> chosen=min id, rejected=max id,
            # margin 0 -> filtered out
            (2, 20, 2.0), (2, 21, 2.0),
            # user 3: single item -> chosen == rejected -> dropped
            (3, 30, 4.0),
            # user 4: repeat purchases collapse to mean before extremes
            (4, 40, 1.0), (4, 40, 5.0), (4, 41, 4.0),  # mean(40)=3.0
        ],
        ["user", "item", "rating"],
    )
    rows = {r["user"]: r for r in dpo_pair_mining(ratings).collect()}
    assert set(rows) == {1, 4}
    assert (rows[1]["chosen_item"], rows[1]["rejected_item"]) == (10, 11)
    assert rows[1]["margin"] == 4.0
    assert (rows[4]["chosen_item"], rows[4]["rejected_item"]) == (41, 40)
    assert rows[4]["margin"] == 1.0


def test_seqlen_histogram_bucket_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "a"),                    # 1 token  -> bucket 1
            (2, "a b"),                  # 2 tokens -> bucket 2
            (3, "a b c"),                # 3 tokens -> bucket 4
            (4, "a b c d"),              # 4 tokens -> bucket 4 (exact pow2)
            (5, " ".join(["x"] * 5)),    # 5 tokens -> bucket 8
        ],
        ["doc_id", "text"],
    )
    rows = {r["len_bucket"]: r for r in seqlen_histogram(docs).collect()}
    assert set(rows) == {1, 2, 4, 8}
    assert rows[4]["n_docs"] == 2 and rows[4]["n_tokens"] == 7
    assert rows[8]["cum_token_share"] == 1.0


def test_loss_mask_counts_are_disjoint_and_total(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat in 42 mats near 7 rivers")],
        ["doc_id", "text"],
    )
    r = loss_mask_spans(docs).collect()[0]
    # "the" + "in" are stopwords, "42" + "7" numeric -> 4 masked of 9
    assert r["n_tokens"] == 9
    assert r["n_masked"] == 4
    assert r["n_loss_tokens"] == 5
    assert r["mask_ratio"] == pytest.approx(4 / 9, abs=1e-6)


def test_curriculum_order_stages_partition_corpus(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["word"] * (i + 1))) for i in range(20)],
        ["doc_id", "text"],
    )
    rows = curriculum_order(docs, n_stages=4).collect()
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
    assert sum(r["n_docs"] for r in rows) == 20
    # stages are difficulty-ordered and non-overlapping
    for a, b in zip(rows, rows[1:]):
        assert a["max_difficulty"] <= b["min_difficulty"]
    total_tokens = sum(i + 1 for i in range(20))
    assert sum(r["n_tokens"] for r in rows) == total_tokens


def test_pmi_bounds_kill_hub_tokens(spark):
    from recmetrics_pyspark_spark.functions.curation import (
        doc_cooccurrence_pmi,
    )

    # "hub" appears in every doc (df = N > max_df_ratio*N) and must be
    # excluded; "aa bb" co-occur in 6 docs and must surface
    docs = spark.createDataFrame(
        [(i, f"hub aa bb unique{i}") for i in range(6)]
        + [(10 + i, "hub zz") for i in range(6)],
        ["doc_id", "text"],
    )
    rows = doc_cooccurrence_pmi(
        docs, min_df=2, max_df_ratio=0.6, min_pair_count=2, top_k=10
    ).collect()
    toks = {t for r in rows for t in (r["tok_a"], r["tok_b"])}
    assert "hub" not in toks
    assert ("aa", "bb") in {(r["tok_a"], r["tok_b"]) for r in rows}
