"""Round-7 property batch: laws for the review-pass fixes and the new
URL/domain operators, plus an exact Python replay of the
popularity_concentration tie-group decomposition (guards against a
shared-bug in the mirrored oracle — the replay derives the statistic
from the NAIVE sorted-share form, not the decomposition)."""

from __future__ import annotations

import datetime as _dt
import math

from hypothesis import given, settings, strategies as st

_B = _dt.datetime(2024, 3, 4)


def test_psi_null_mass_does_not_register_as_drift(spark):
    """Review finding 3 regression: a half with MORE missing values but
    an identical non-null distribution must score PSI 0 — missingness
    is not value drift."""
    from recmetrics_pyspark_spark.operators.quality import psi_drift

    rows = []
    # ref half: values 1..4 ×3 each, plus 12 NULLs
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0] * 3):
        rows.append(("a", v, _B + _dt.timedelta(minutes=i)))
    for i in range(12):
        rows.append(("a", None, _B + _dt.timedelta(minutes=30 + i)))
    # cur half: the same non-null multiset, zero NULLs
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0] * 3):
        rows.append(("a", v, _B + _dt.timedelta(hours=10, minutes=i)))
    df = spark.createDataFrame(rows, ["event_type", "value", "ts"])
    out = psi_drift(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.psi == 0.0 and not r.drift_alert
    # totals count MEASURED rows only
    assert (r.n_ref, r.n_cur) == (12, 12)


_corpus = st.lists(
    st.tuples(
        st.integers(0, 24),        # doc_id
        st.integers(0, 2),         # domain index
        st.integers(0, 3),         # text index (small pool -> dups)
    ),
    min_size=2,
    max_size=25,
    unique_by=lambda t: t[0],
)

_TEXTS = [
    "alpha beta gamma delta epsilon zeta",
    "one two three four five six seven",
    "red green blue yellow purple orange",
    "north south east west up down",
]


@settings(max_examples=5, deadline=None)
@given(rows=_corpus)
def test_domain_neardup_rates_bounds(spark, rows):
    from recmetrics_pyspark_spark.functions.curation import (
        domain_neardup_rates,
    )

    data = [
        (d, _TEXTS[t], f"https://d{dom}.com/p/{d}") for d, dom, t in rows
    ]
    df = spark.createDataFrame(data, ["doc_id", "text", "url"])
    out = domain_neardup_rates(df).collect()
    n_docs_per_dom = {}
    for d, dom, _ in rows:
        n_docs_per_dom[f"d{dom}.com"] = (
            n_docs_per_dom.get(f"d{dom}.com", 0) + 1
        )
    assert {r.domain: r.n_docs for r in out} == n_docs_per_dom
    for r in out:
        assert 0 <= r.n_dup_docs <= r.n_docs
        # every within-domain pair touches <= 2 distinct docs, every
        # dup doc sits in >= 1 pair
        assert r.n_dup_docs <= 2 * r.n_neardup_pairs
        if r.n_neardup_pairs:
            assert r.n_neardup_pairs <= (
                r.n_dup_docs * (r.n_dup_docs - 1) // 2
            )
            assert r.n_dup_docs >= 2
        assert r.dup_doc_share == round(r.n_dup_docs / r.n_docs, 6)


@settings(max_examples=5, deadline=None)
@given(rows=_corpus)
def test_canonical_url_dups_python_replay(spark, rows):
    from test_basket_cap import _py_canonicalize

    from recmetrics_pyspark_spark.functions.curation import (
        canonical_url_dups,
    )

    # messy variants: same page for doc pairs, alternating noise
    data = [
        (
            d,
            ("https://www." if d % 2 else "https://")
            + f"d{dom}.com"
            + (":443" if d % 3 == 0 else "")
            + f"/p/{t}"
            + ("?utm_source=x&a=1" if d % 2 else "?a=1"),
        )
        for d, dom, t in rows
    ]
    df = spark.createDataFrame(data, ["doc_id", "url"])
    got = {
        r.canonical_url: (r.n_variants, r.min_doc_id, r.max_doc_id)
        for r in canonical_url_dups(df, min_variants=2).collect()
    }
    groups: dict[str, list[int]] = {}
    for d, u in data:
        groups.setdefault(_py_canonicalize(u), []).append(d)
    expect = {
        c: (len(ds), min(ds), max(ds))
        for c, ds in groups.items()
        if len(ds) >= 2
    }
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 12)),
        min_size=1,
        max_size=40,
    )
)
def test_popularity_concentration_naive_replay(spark, rows):
    """The tie-group decomposition must equal the NAIVE sorted-share
    closed form (Σ over per-item ranks) computed in Python — the
    independent derivation the mirrored oracle can't provide."""
    from recmetrics_pyspark_spark.operators.metrics import (
        popularity_concentration,
    )

    df = spark.createDataFrame(rows, ["person", "product"])
    r = popularity_concentration(df).collect()[0]

    pops: dict[int, int] = {}
    for _, i in rows:
        pops[i] = pops.get(i, 0) + 1
    cnts = sorted(pops.values())
    n = len(cnts)
    tot = sum(cnts)
    rnk_cnt = sum((idx + 1) * c for idx, c in enumerate(cnts))
    gini = round((2.0 * rnk_cnt / tot - (n + 1)) / n, 6)
    # entropy replay mirrors the DECIMAL(18,9) group pre-rounding:
    # sum the 9-decimal terms EXACTLY (Decimal), then one double cast
    # — float accumulation could drift a round-6 boundary
    from collections import Counter
    from decimal import Decimal

    h = float(
        sum(
            Decimal(str(round(-(k * c / tot) * math.log(c / tot), 9)))
            for c, k in Counter(cnts).items()
        )
    )
    assert r.n_items == n
    assert r.gini == gini
    assert r.entropy == round(h, 6)
    assert r.effective_catalog_size == round(round(math.exp(h), 9), 6)
