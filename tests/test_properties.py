"""Property-based tests (SURVEY.md §5.2): permutation invariance and
metric range invariants, over small hypothesis-generated interaction
sets. Example counts are kept low — each example is a Spark job."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from recmetrics_pyspark_spark.operators.metrics import (
    coverage_value,
    long_tail_stats,
    novelty_value,
    personalization_value,
)

interactions_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 8)),
    min_size=4,
    max_size=30,
).filter(lambda rows: len({u for u, _ in rows}) >= 2)


@settings(max_examples=6, deadline=None)
@given(rows=interactions_strategy)
def test_personalization_in_unit_interval_and_permutation_invariant(
    spark, rows
):
    df = spark.createDataFrame(rows, ["u", "i"])
    p = personalization_value(df, "u", "i")
    assert 0.0 <= p <= 1.0
    shuffled = list(rows)
    random.Random(7).shuffle(shuffled)
    p2 = personalization_value(
        spark.createDataFrame(shuffled, ["u", "i"]), "u", "i"
    )
    assert p == pytest.approx(p2, abs=1e-9)


@settings(max_examples=6, deadline=None)
@given(rows=interactions_strategy)
def test_coverage_unit_interval_when_recs_subset(spark, rows):
    ratings = spark.createDataFrame(rows, ["u", "id_product"])
    recs = spark.createDataFrame(rows[: max(len(rows) // 2, 1)], ["u", "id_product"])
    c = coverage_value(recs, ratings)
    assert 0.0 < c <= 1.0


@settings(max_examples=6, deadline=None)
@given(rows=interactions_strategy)
def test_long_tail_curve_invariants(spark, rows):
    df = spark.createDataFrame(rows, ["u", "id_product"]).select("id_product")
    stats = sorted(
        long_tail_stats(df).collect(), key=lambda r: r["item_rank"]
    )
    # cumulative volume strictly increasing, final share == 1
    cums = [r["cumulative_volume"] for r in stats]
    assert cums == sorted(cums) and len(set(cums)) == len(cums)
    assert stats[-1]["pct_cumulative"] == pytest.approx(1.0)
    # volumes weakly decreasing in rank order
    vols = [r["volume"] for r in stats]
    assert all(a >= b for a, b in zip(vols, vols[1:]))


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=3,
        max_size=12,
    ).map(" ".join),
    min_size=2,
    max_size=8,
)


@settings(max_examples=5, deadline=None)
@given(texts=docs_strategy)
def test_ngram_jaccard_bounds_and_orientation(spark, texts):
    from recmetrics_pyspark_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = ngram_jaccard_pairs(df, threshold=0.0).collect()
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["id_a"] < r["id_b"]  # single canonical orientation
    # identical docs must reach jaccard 1
    df2 = spark.createDataFrame(
        [(0, texts[0]), (1, texts[0])], ["doc_id", "text"]
    )
    pair = ngram_jaccard_pairs(df2, threshold=0.0).collect()
    assert len(pair) == 1 and pair[0]["jaccard"] == 1.0


@settings(max_examples=4, deadline=None)
@given(rows=interactions_strategy)
def test_novelty_nonnegative_when_pops_below_u(spark, rows):
    # every item's popularity <= distinct users -> -log2(pop/u) >= 0
    dedup = list({(u, i) for u, i in rows})
    sales = spark.createDataFrame(dedup, ["person", "product"])
    recs = spark.createDataFrame(dedup[: max(len(dedup) // 2, 1)], ["person", "product"])
    n = novelty_value(sales, recs)
    assert n is not None and n >= 0.0
