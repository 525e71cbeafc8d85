"""Property-based invariants, batch 6: round-2/3 statistical
operators — Kaplan–Meier vs an exact product-limit replay, PSI
null-case and non-negativity, calibration-KL non-negativity, quantile
binning monotonicity, negative-sampling exclusion, and CUSUM locating
an injected level shift.

Few large examples per property (each example runs Spark jobs)."""

from __future__ import annotations

import datetime as _dt
import math

from hypothesis import given, settings, strategies as st

_BASE = _dt.datetime(2024, 3, 4, 12, 0, 0)

_km_events = st.lists(
    st.tuples(st.integers(1, 8), st.integers(0, 30)),  # (unit, day)
    min_size=2,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_km_events)
def test_km_survival_matches_product_limit(spark, rows):
    """The exp(Σ ln ·) day-scale formulation must equal the classic
    product-limit estimator computed in Python, with survival
    monotone non-increasing in [0, 1]."""
    from recmetrics_pyspark_spark.operators.experiment import (
        km_survival,
    )

    data = [(u, _BASE + _dt.timedelta(days=d)) for u, d in rows]
    df = spark.createDataFrame(data, ["user_id", "ts"])
    out = sorted(
        km_survival(df, censor_horizon_days=5).collect(),
        key=lambda r: r.t_days,
    )

    per_unit: dict[int, list] = {}
    for u, ts in data:
        per_unit.setdefault(u, []).append(ts.date())
    tmax = max(ts.date() for _, ts in data)
    lifetimes = []
    for ds in per_unit.values():
        t0, t1 = min(ds), max(ds)
        lifetimes.append(
            ((t1 - t0).days, (tmax - t1).days < 5)  # (lifetime, censored)
        )
    total = len(lifetimes)
    surv, prev = 1.0, 0
    expect = []
    for t in sorted({lt for lt, _ in lifetimes}):
        d = sum(1 for lt, c in lifetimes if lt == t and not c)
        ends_before = sum(1 for lt, _ in lifetimes if lt < t)
        n_risk = total - ends_before
        if d > 0:
            surv *= (1 - d / n_risk) if d < n_risk else 0.0
            expect.append((t, n_risk, d, surv))
    assert [(r.t_days, r.n_risk, r.n_events) for r in out] == [
        e[:3] for e in expect
    ]
    last = 1.0
    for r, e in zip(out, expect):
        assert abs(r.survival - e[3]) < 1e-5
        assert -1e-9 <= r.survival <= last + 1e-9
        last = r.survival


_psi_vals = st.lists(st.integers(0, 100), min_size=2, max_size=25)


@settings(max_examples=5, deadline=None)
@given(vals=_psi_vals)
def test_psi_zero_for_mirrored_halves_and_nonnegative(spark, vals):
    """A value multiset repeated identically in both time halves has
    PSI exactly 0 (every bin's shares match); PSI is never negative
    (each (p−q)·ln(p/q) term is ≥ 0)."""
    from recmetrics_pyspark_spark.operators.quality import psi_drift

    # each value once at t=0 (first half) and once at t=+10d (second)
    data = [
        ("g", float(v), _BASE + _dt.timedelta(days=d))
        for v in vals
        for d in (0, 10)
    ]
    df = spark.createDataFrame(data, ["event_type", "value", "ts"])
    out = psi_drift(df).collect()
    assert len(out) == 1
    assert out[0].psi == 0.0

    # random uneven halves: still ≥ 0
    data2 = [
        ("g", float(v), _BASE + _dt.timedelta(days=(i * 11) % 20))
        for i, v in enumerate(vals)
    ]
    df2 = spark.createDataFrame(data2, ["event_type", "value", "ts"])
    for r in psi_drift(df2).collect():
        assert r.psi >= -1e-9


_calib = st.lists(
    st.tuples(st.integers(1, 4), st.integers(1, 6)),  # (user, item)
    min_size=2,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(hist=_calib, recs=_calib)
def test_calibration_kl_nonnegative(spark, hist, recs):
    """Gibbs' inequality under random fire: the mean per-user KL is
    never negative, whatever the two mixes are."""
    from recmetrics_pyspark_spark.operators.recommend import (
        calibration_kl,
    )

    hdf = spark.createDataFrame(hist, ["user", "item"])
    # recs restricted to users with history (KL needs both sides)
    husers = {u for u, _ in hist}
    rrows = [(u, i) for u, i in recs if u in husers] or hist[:1]
    rdf = spark.createDataFrame(rrows, ["user", "item"])
    cats = spark.createDataFrame(
        [(i, f"c{i % 3}") for i in range(1, 7)], ["item", "category"]
    )
    out = calibration_kl(hdf, rdf, cats).collect()
    assert len(out) == 1
    assert out[0].mean_kl >= -1e-9


_qn_rows = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.integers(0, 50),
    ),
    min_size=2,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(rows=_qn_rows)
def test_quantile_normalize_monotone_within_group(spark, rows):
    """Binning is a monotone transform per group: a larger value never
    gets a smaller bin, equal values share a bin, and bins stay in
    [0, n_bins-1]."""
    from recmetrics_pyspark_spark.functions.curation import (
        quantile_normalize,
    )

    data = [(i, s, v) for i, (s, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["doc_id", "source", "n_chars"])
    out = quantile_normalize(df, "doc_id", "n_chars", "source").collect()
    assert len(out) == len(rows)
    by_group: dict[str, list] = {}
    for r in out:
        assert 0 <= r.qbin <= 9
        by_group.setdefault(r.source, []).append((r.n_chars, r.qbin))
    for pairs in by_group.values():
        pairs.sort()
        for (v1, b1), (v2, b2) in zip(pairs, pairs[1:]):
            assert b1 <= b2
            if v1 == v2:
                assert b1 == b2


_ns_interactions = st.lists(
    st.tuples(st.integers(1, 5), st.integers(1, 40)),  # (user, item)
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(rows=_ns_interactions, k=st.integers(1, 4))
def test_negative_sampling_excludes_positives(spark, rows, k):
    """No sampled negative may be an item the user interacted with;
    at most k per user, ranked 1..k, and two runs agree exactly
    (the sampler is hash-deterministic, not RNG)."""
    from recmetrics_pyspark_spark.operators.recommend import (
        negative_sampling,
    )

    df = spark.createDataFrame(rows, ["user", "item"])
    out = negative_sampling(df, k=k).collect()
    pos: dict[int, set] = {}
    for u, i in rows:
        pos.setdefault(u, set()).add(i)
    per_user: dict[int, list] = {}
    for r in out:
        assert r.neg_item not in pos[r.user]
        per_user.setdefault(r.user, []).append(r.rnk)
    for u, rnks in per_user.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= k
    again = negative_sampling(df, k=k).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@settings(max_examples=5, deadline=None)
@given(
    n1=st.integers(2, 10),
    n2=st.integers(2, 10),
    lo=st.integers(0, 10),
    jump=st.integers(50, 200),
)
def test_cusum_locates_injected_level_shift(spark, n1, n2, lo, jump):
    """A clean two-level series peaks |CUSUM| exactly at the last day
    of the first level — the changepoint lands on the boundary, never
    inside a segment."""
    from recmetrics_pyspark_spark.operators.timeseries import (
        cusum_changepoint,
    )

    base = _dt.date(2024, 1, 1)
    rows = []
    for d in range(n1 + n2):
        v = float(lo if d < n1 else lo + jump)
        rows.append(("m", base + _dt.timedelta(days=d), v))
    df = spark.createDataFrame(rows, ["key", "day", "v"])
    out = cusum_changepoint(df, "key", "day", "v").collect()
    assert len(out) == 1
    assert out[0].changepoint_day == base + _dt.timedelta(days=n1 - 1)
