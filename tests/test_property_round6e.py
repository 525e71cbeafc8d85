"""Property-based invariants, batch 5: decomposition and information
measures — the additive-decomposition reconstruction identity, entropy
axioms for the corpus rates, and an exact catalog-freshness replay.

Few large examples per property (each example runs Spark jobs)."""

from __future__ import annotations

import datetime as _dt
import math

from hypothesis import given, settings, strategies as st

_BASE = _dt.datetime(2024, 3, 4, 12, 0, 0)

_daily_series = st.lists(
    st.integers(0, 200), min_size=9, max_size=21
)


@settings(max_examples=5, deadline=None)
@given(vals=_daily_series)
def test_seasonal_decompose_reconstruction(spark, vals):
    """Additive decomposition must tile back together: value = trend +
    seasonal + residual (to output rounding), trend rows exist only
    where the full 7-day window does, and per-weekday residuals
    average to ~0 (the seasonal mean absorbed them)."""
    from recmetrics_pyspark_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )

    rows = [
        (_BASE + _dt.timedelta(days=d), float(v))
        for d, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = seasonal_decompose_daily(df).collect()
    assert len(out) == len(vals) - 6  # centered 7-day window
    by_dow: dict[int, list] = {}
    for r in out:
        assert abs(
            r.value - (r.trend + r.seasonal + r.residual)
        ) < 5e-6  # three independently-rounded terms
        by_dow.setdefault(
            _dt.date.fromisoformat(r.day).isoweekday(), []
        ).append(r.residual)
    for dow, res in by_dow.items():
        assert abs(sum(res) / len(res)) < 5e-6, dow


_corpora = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=8
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=5, deadline=None)
@given(docs=_corpora)
def test_corpus_entropy_axioms(spark, docs):
    """Shannon axioms on random corpora: 0 ≤ H(X) ≤ log2 |V|,
    0 ≤ H(Y|X) ≤ H(X,Y), and the chain rule H(Y|X) = H(X,Y) − H(X)
    as reported; a Python mirror agrees to rounding."""
    from recmetrics_pyspark_spark.functions.text import (
        corpus_entropy_rates,
    )

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        ["doc_id", "text"],
    )
    r = corpus_entropy_rates(df).collect()[0]

    toks = [t for d in docs for t in d]
    vocab = len(set(toks))
    has_bigrams = any(len(d) >= 2 for d in docs)
    assert -1e-9 <= r.h_unigram <= math.log2(max(vocab, 2)) + 1e-6
    if has_bigrams:
        # chain rule as REPORTED (h_cond can go negative on tiny
        # corpora: the pair distribution's marginal drops doc-final
        # tokens, so it is not exactly the unigram distribution)
        assert abs(r.h_cond - round(r.h_bigram - r.h_unigram, 6)) < 2e-6
        assert r.h_bigram >= -1e-9
    else:
        # a corpus of single-token docs has no adjacent pairs: the
        # bigram measures are undefined, reported NULL
        assert r.h_bigram is None and r.h_cond is None

    def _h(counts):
        tot = sum(counts)
        return -sum(
            round(c / tot * math.log2(c / tot), 9) for c in counts
        )

    uni: dict[str, int] = {}
    for t in toks:
        uni[t] = uni.get(t, 0) + 1
    bi: dict[tuple, int] = {}
    for d in docs:
        for x, y in zip(d, d[1:]):
            bi[(x, y)] = bi.get((x, y), 0) + 1
    assert abs(r.h_unigram - round(_h(list(uni.values())), 6)) < 2e-6
    if bi:
        assert abs(r.h_bigram - round(_h(list(bi.values())), 6)) < 2e-6


_interactions = st.lists(
    st.tuples(st.integers(1, 6), st.integers(0, 5 * 7)),  # (item, day)
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_interactions)
def test_catalog_freshness_matches_replay(spark, rows):
    """Every interaction lands in exactly one week row; an item's
    interactions count as new exactly in its introduction week — the
    whole table equals a Python replay."""
    from recmetrics_pyspark_spark.operators.recommend import (
        catalog_freshness,
    )

    base = _dt.date(2024, 3, 4)  # a Monday
    data = [
        (it, base + _dt.timedelta(days=d)) for it, d in rows
    ]
    df = spark.createDataFrame(data, "item int, dt date")
    out = {
        r.week: (r.n_interactions, r.n_new_item_interactions,
                 r.new_item_share)
        for r in catalog_freshness(df).collect()
    }

    def monday(d):
        return d - _dt.timedelta(days=d.weekday())

    first_wk = {}
    for it, d in data:
        wk = monday(d)
        if it not in first_wk or wk < first_wk[it]:
            first_wk[it] = wk
    expect: dict[str, list] = {}
    for it, d in data:
        wk = monday(d)
        e = expect.setdefault(str(wk), [0, 0])
        e[0] += 1
        if wk == first_wk[it]:
            e[1] += 1
    assert out == {
        k: (n, new, round(new / n, 6)) for k, (n, new) in expect.items()
    }
    assert sum(n for n, _, _ in out.values()) == len(data)
