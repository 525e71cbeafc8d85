"""Property-based invariants, batch 2: the remaining round-4/5
operator families without random-input coverage — peak concurrency vs
an exact Python sweep, token-budget allocation arithmetic, revenue
Pareto monotonicity, split-leakage counting, containment on
constructed prefix documents, erasure-cascade residuals, and Theil–Sen
exactness on linear series.

Few large examples per property (each example runs Spark jobs)."""

from __future__ import annotations

import datetime as _dt
import hashlib

from hypothesis import given, settings, strategies as st

_BASE = _dt.datetime(2024, 3, 4, 23, 0, 0)  # near midnight: day splits
_EPOCH = _dt.datetime(1970, 1, 1)

_concurrency_events = st.lists(
    st.tuples(st.integers(1, 4), st.integers(0, 7200)),  # (user, sec)
    min_size=1,
    max_size=30,
)


def _us(ts: _dt.datetime) -> int:
    return int((ts - _EPOCH) / _dt.timedelta(microseconds=1))


@settings(max_examples=5, deadline=None)
@given(rows=_concurrency_events)
def test_peak_concurrency_matches_python_sweep(spark, rows):
    """The +1/−1 sweep must equal a brute-force Python count of
    overlapping day-split session segments — including sessions that
    cross midnight (the strategy straddles a day boundary)."""
    from recmetrics_pyspark_spark.operators.funnel import (
        peak_concurrency,
    )

    data = [(u, _BASE + _dt.timedelta(seconds=s)) for u, s in rows]
    df = spark.createDataFrame(data, ["user_id", "ts"])
    out = {
        r.day: (r.peak_concurrent, r.n_sessions)
        for r in peak_concurrency(df).collect()
    }

    # Python mirror: 30-min-gap sessionize, split at day boundaries,
    # peak(day) = max over segment starts of overlapping segments
    by_user: dict[int, list] = {}
    for u, ts in data:
        by_user.setdefault(u, []).append(ts)
    segs: dict[str, list] = {}
    for u, tss in by_user.items():
        tss.sort()
        sess = [[tss[0], tss[0]]]
        for t in tss[1:]:
            if (t - sess[-1][1]) > _dt.timedelta(minutes=30):
                sess.append([t, t])
            else:
                sess[-1][1] = t
        for s, e in sess:
            day = s.date()
            while day <= e.date():
                d0 = _dt.datetime.combine(day, _dt.time())
                a = max(_us(s), _us(d0))
                b = min(_us(e), _us(d0 + _dt.timedelta(days=1)) - 1)
                segs.setdefault(str(day), []).append((a, b))
                day += _dt.timedelta(days=1)
    expect = {}
    for day, ss in segs.items():
        peak = max(
            sum(1 for a2, b2 in ss if a2 <= a <= b2) for a, _ in ss
        )
        expect[day] = (peak, len(ss))
    assert out == expect


_budget_docs = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2", "s3"]),
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=8),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=5, deadline=None)
@given(rows=_budget_docs, budget=st.integers(1, 200))
def test_token_budget_allocation_arithmetic(spark, rows, budget):
    """Allocation is exact integer division of the budget over the
    OBSERVED sources; rates cap at 1; inventories equal a Python
    whitespace count."""
    from recmetrics_pyspark_spark.functions.curation import (
        token_budget_plan,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(t), s) for i, (s, t) in enumerate(rows)],
        ["doc_id", "text", "source"],
    )
    out = token_budget_plan(docs, budget).collect()
    sources = {s for s, _ in rows}
    assert {r.source for r in out} == sources
    alloc = budget // len(sources)
    inv = {s: 0 for s in sources}
    ndocs = {s: 0 for s in sources}
    for s, toks in rows:
        inv[s] += len(toks)
        ndocs[s] += 1
    for r in out:
        assert r.allocated_tokens == alloc
        assert r.n_tokens == inv[r.source]
        assert r.n_docs == ndocs[r.source]
        assert abs(
            r.sample_rate - round(min(1.0, alloc / inv[r.source]), 6)
        ) < 1e-9
        assert abs(r.epochs - round(alloc / inv[r.source], 6)) < 1e-9


_order_rows = st.lists(
    st.tuples(st.integers(1, 12), st.integers(1, 500)),  # (cust, amount)
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_order_rows)
def test_revenue_concentration_monotone_in_fraction(spark, rows):
    """A wider top slice can only lower the entry threshold and grow
    both the customer count and the revenue share; every share is a
    valid proportion."""
    from recmetrics_pyspark_spark.operators.funnel import (
        revenue_concentration,
    )

    df = spark.createDataFrame(rows, ["o_custkey", "o_totalprice"])
    out = sorted(
        revenue_concentration(df).collect(),
        key=lambda r: r.top_fraction,
    )
    assert [r.top_fraction for r in out] == [0.01, 0.1, 0.2, 0.5]
    for r in out:
        assert 0 < r.n_customers <= len({c for c, _ in rows})
        assert 0.0 < r.revenue_share <= 1.0 + 1e-9
    for a, b in zip(out, out[1:]):
        assert a.rev_threshold >= b.rev_threshold - 1e-9
        assert a.n_customers <= b.n_customers
        assert a.revenue_share <= b.revenue_share + 1e-9


_leak_docs = st.lists(
    st.tuples(st.integers(0, 500), st.sampled_from(["t1", "t2", "t3"])),
    min_size=1,
    max_size=30,
).map(lambda rs: list({i: t for i, t in rs}.items()))  # unique ids


@settings(max_examples=5, deadline=None)
@given(rows=_leak_docs)
def test_split_leakage_counts_match_python(spark, rows):
    """Leak accounting over random corpora: statuses partition the
    distinct content hashes and each bucket's counts equal a direct
    Python replay of the md5 split + collision rule."""
    from recmetrics_pyspark_spark.functions.curation import (
        split_leakage_audit,
    )

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.status: (r.n_hashes, r.n_docs) for r in
           split_leakage_audit(df).collect()}

    def split_of(i):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return "train" if u % 10 < 8 else "eval"

    per_hash: dict[str, list] = {}
    for i, t in rows:
        per_hash.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(
            split_of(i)
        )
    expect: dict[str, list] = {}
    for splits in per_hash.values():
        if "train" in splits and "eval" in splits:
            s = "leaked"
        elif "train" in splits:
            s = "train_only"
        else:
            s = "eval_only"
        expect.setdefault(s, [0, 0])
        expect[s][0] += 1
        expect[s][1] += len(splits)
    assert out == {k: tuple(v) for k, v in expect.items()}


_prefix_docs = st.lists(
    st.lists(st.integers(0, 9), min_size=5, max_size=9),
    min_size=1,
    max_size=4,
)


@settings(max_examples=5, deadline=None)
@given(bases=_prefix_docs, extra=st.integers(2, 4))
def test_containment_one_for_prefix_documents(spark, bases, extra):
    """A document that is a strict prefix of another shares ALL its
    shingles with it — containment must be exactly 1.0, and no pair
    can ever exceed 1."""
    from recmetrics_pyspark_spark.operators.dedup import (
        containment_pairs,
    )

    rows = []
    for j, toks in enumerate(bases):
        words = [f"w{j}x{t}" for t in toks]  # disjoint vocab per pair
        rows.append((2 * j, " ".join(words)))
        rows.append(
            (2 * j + 1, " ".join(words + [f"z{j}e{i}" for i in range(extra)]))
        )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = containment_pairs(df, threshold=0.5).collect()
    got = {(r.id_a, r.id_b): r.containment for r in out}
    for j in range(len(bases)):
        assert got.get((2 * j, 2 * j + 1)) == 1.0
    for r in out:
        assert 0.0 < r.containment <= 1.0
        assert r.jaccard <= r.containment + 1e-9


_erasure = st.tuples(
    st.lists(st.integers(1, 8), min_size=1, max_size=8, unique=True),
    st.lists(
        st.tuples(st.integers(1, 20), st.integers(1, 8)),  # (okey, cust)
        min_size=0,
        max_size=15,
    ).map(lambda rs: list({o: c for o, c in rs}.items())),
    st.lists(st.integers(1, 20), min_size=0, max_size=25),  # l_orderkey
    st.lists(st.integers(1, 8), min_size=1, max_size=4, unique=True),
)


@settings(max_examples=5, deadline=None)
@given(data=_erasure)
def test_user_erasure_cascade_zero_residuals(spark, data):
    """On ANY referentially-consistent mini-schema the two independent
    cascade derivations must agree: residual_refs = 0 everywhere, and
    before/deleted/after counts equal a Python replay."""
    from recmetrics_pyspark_spark.operators.cdc import (
        user_erasure_audit,
    )

    custs, orders, lkeys, erase = data
    orders = [(o, c) for o, c in orders if c in custs]
    okeys = {o for o, _ in orders}
    lines = [(k,) for k in lkeys if k in okeys]
    cdf = spark.createDataFrame([(c,) for c in custs], ["c_custkey"])
    odf = spark.createDataFrame(orders, ["o_orderkey", "o_custkey"]) \
        if orders else spark.createDataFrame([], "o_orderkey int, o_custkey int")
    ldf = spark.createDataFrame(lines, "l_orderkey int") \
        if lines else spark.createDataFrame([], "l_orderkey int")
    edf = spark.createDataFrame([(c,) for c in erase], ["c_custkey"])

    out = {r.table_name: r for r in
           user_erasure_audit(cdf, odf, ldf, edf).collect()}

    eset = set(erase) & set(custs)
    del_ok = {o for o, c in orders if c in eset}
    expect = {
        "customer": (len(custs), len(eset)),
        "orders": (len(orders), len(del_ok)),
        "lineitem": (len(lines), sum(1 for (k,) in lines if k in del_ok)),
    }
    for name, (before, deleted) in expect.items():
        r = out[name]
        assert (r.n_before, r.n_deleted) == (before, deleted)
        assert r.n_after == before - deleted
        assert r.residual_refs == 0


@settings(max_examples=5, deadline=None)
@given(
    a=st.integers(10, 100),
    b=st.integers(-5, 5),
    n=st.integers(4, 12),
)
def test_theil_sen_exact_on_linear_series(spark, a, b, n):
    """On a perfectly linear daily series every pairwise slope is the
    same number, so the median IS that slope — exactly, no tolerance
    beyond the output rounding."""
    from recmetrics_pyspark_spark.operators.timeseries import (
        theil_sen_trend,
    )

    base = _dt.datetime(2024, 1, 1)
    rows = [
        (base + _dt.timedelta(days=d), a + b * d) for d in range(n)
    ]
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = theil_sen_trend(df, "ts", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == n and r.n_pairs == n * (n - 1) // 2
    assert r.slope_per_day == float(b)
    levels = sorted(a + b * d for d in range(n))
    mid = (
        levels[n // 2]
        if n % 2
        else (levels[n // 2 - 1] + levels[n // 2]) / 2
    )
    assert r.median_level == round(float(mid), 6)
