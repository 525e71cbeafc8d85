"""Property-based invariants (hypothesis) for the round-4 operator
families that predate test_property_round5.py — the three the round-5
review named (funnel permutation-invariance, SCD2 interval algebra,
k-core peel idempotence) plus sequential-rule time-reversal duality
and cohort-retention bounds.

Few large examples per property (each example runs Spark jobs)."""

from __future__ import annotations

import datetime as _dt

from hypothesis import given, settings, strategies as st

_BASE = _dt.datetime(2024, 3, 4, 12, 0, 0)

_funnel_events = st.lists(
    st.tuples(
        st.integers(1, 5),  # user
        st.sampled_from(["s1", "s2", "s3", "noise"]),
        st.integers(0, 60),  # seconds offset
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_funnel_events)
def test_funnel_monotone_and_permutation_invariant(spark, rows):
    """A funnel is a set property of the event log: row order must not
    matter, and each step's survivor count can never exceed the
    previous step's."""
    from recmetrics_pyspark_spark.operators.funnel import (
        funnel_conversion,
    )

    # guarantee a non-empty first step so rates are defined
    rows = rows + [(1, "s1", 0)]
    data = [
        (u, _BASE + _dt.timedelta(seconds=s), et) for u, et, s in rows
    ]
    steps = ["s1", "s2", "s3"]

    def run(recs):
        df = spark.createDataFrame(recs, ["user_id", "ts", "event_type"])
        return sorted(
            funnel_conversion(df, steps).collect(),
            key=lambda r: r.step_idx,
        )

    out = run(data)
    assert [r.step for r in out] == steps
    counts = [r.n_users for r in out]
    # monotone: conversions never grow along the funnel
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert out[0].rate_from_first == 1.0 and out[0].rate_from_prev == 1.0
    for i, r in enumerate(out[1:], start=1):
        if counts[0] > 0:
            assert abs(r.rate_from_first - round(counts[i] / counts[0], 6)) < 1e-9
        if counts[i - 1] > 0:
            assert abs(r.rate_from_prev - round(counts[i] / counts[i - 1], 6)) < 1e-9
        else:
            assert r.rate_from_prev is None
    # permutation invariance: reversed input, identical funnel
    assert run(list(reversed(data))) == out


_change_log = st.lists(
    st.tuples(
        st.integers(1, 3),  # key
        st.sampled_from(["a", "b", "c", None]),  # attr value (NULL is a value)
        st.integers(0, 20),  # ts offset (seconds)
        st.integers(0, 9),  # tiebreak seq
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_change_log)
def test_scd2_interval_algebra_on_random_change_logs(spark, rows):
    """SCD2 contract on ANY change log: per key the intervals tile the
    timeline half-open with no gaps/overlaps, versions are 1..n,
    exactly the last is current, consecutive runs differ, and the
    whole table equals an independent Python replay of the
    winner-per-timestamp + run-collapse rule."""
    from recmetrics_pyspark_spark.operators.cdc import scd2_history

    data = [
        (k, v, _BASE + _dt.timedelta(seconds=s), q) for k, v, s, q in rows
    ]
    df = spark.createDataFrame(
        data, "key int, attr string, ts timestamp, seq int"
    )
    out = scd2_history(df, "key", "attr", "ts", "seq").collect()

    # independent replay: winner per (key, ts) = max seq, then min
    # attr with NULL first (the operator's total order — exercised
    # here: the strategy DOES generate full (key, ts, seq) ties)
    def _attr_key(v):
        return (v is not None, v)

    per_key: dict[int, dict] = {}
    for k, v, ts, q in data:
        slot = per_key.setdefault(k, {})
        if (
            ts not in slot
            or q > slot[ts][0]
            or (q == slot[ts][0]
                and _attr_key(v) < _attr_key(slot[ts][1]))
        ):
            slot[ts] = (q, v)
    expect = []
    for k, slot in per_key.items():
        seq = sorted(slot.items())
        runs = []
        for ts, (_, v) in seq:
            if not runs or runs[-1][1] != v:
                runs.append((ts, v))
        for i, (ts, v) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            expect.append(
                (
                    k,
                    v,
                    ts.strftime("%Y-%m-%d %H:%M:%S"),
                    nxt.strftime("%Y-%m-%d %H:%M:%S") if nxt else None,
                    1 if nxt is None else 0,
                    i + 1,
                )
            )
    def _key(t):  # None-safe tuple ordering
        return tuple((v is None, v) for v in t)

    got = sorted(
        (
            (r.key, r.attr_value, r.valid_from, r.valid_to, r.is_current,
             r.version)
            for r in out
        ),
        key=_key,
    )
    assert got == sorted(expect, key=_key)

    # interval algebra, re-asserted directly on the output
    by_key: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.key, r.version)):
        by_key.setdefault(r.key, []).append(r)
    for k, ivals in by_key.items():
        assert [r.version for r in ivals] == list(range(1, len(ivals) + 1))
        for prev, nxt in zip(ivals, ivals[1:]):
            assert prev.valid_to == nxt.valid_from  # no gap, no overlap
            assert prev.attr_value != nxt.attr_value  # runs collapsed
            assert prev.is_current == 0
        assert ivals[-1].valid_to is None and ivals[-1].is_current == 1


_edges = st.lists(
    st.tuples(st.integers(1, 9), st.integers(1, 9)),
    min_size=1,
    max_size=25,
).map(
    lambda es: sorted(
        {(min(a, b), max(a, b)) for a, b in es if a != b}
    )
)


@settings(max_examples=5, deadline=None)
@given(edges=_edges)
def test_kcore_peel_idempotent_past_convergence(spark, edges):
    """k-core peeling converges on these graph sizes well inside 6
    rounds — one MORE round must be a no-op (the fixed point IS the
    k-core), and the survivors must match an exact Python
    peel-to-convergence."""
    from recmetrics_pyspark_spark.operators.graph import (
        k_core_decompose,
    )

    if not edges:
        return
    pairs = spark.createDataFrame(edges, ["ia", "ib"])
    base = {
        (r.node, r.degree)
        for r in k_core_decompose(pairs, k=2, rounds=6).collect()
    }
    plus_one = {
        (r.node, r.degree)
        for r in k_core_decompose(pairs, k=2, rounds=7).collect()
    }
    assert base == plus_one  # idempotence at rounds+1

    # exact reference: peel to convergence in Python
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        doomed = [n for n, nb in adj.items() if len(nb) < 2]
        changed = bool(doomed)
        for n in doomed:
            for m in adj.pop(n):
                if m in adj:
                    adj[m].discard(n)
    assert base == {(n, len(nb)) for n, nb in adj.items()}


_adoptions = st.lists(
    st.tuples(
        st.integers(1, 4),  # user
        st.integers(1, 5),  # item
        st.integers(0, 15),  # day offset
    ),
    min_size=2,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(rows=_adoptions)
def test_sequential_rules_reverse_time_duality(spark, rows):
    """Running the clock backwards must exactly swap every rule's
    direction: n_AB(forward) = n_BA(reversed), with identical adopter
    counts — a structural check no single fixture can make."""
    from recmetrics_pyspark_spark.operators.recommend import (
        sequential_rules,
    )

    base_day = _dt.date(2024, 1, 1)

    def run(day_of):
        data = [
            (u, i, base_day + _dt.timedelta(days=day_of(d)))
            for u, i, d in rows
        ]
        df = spark.createDataFrame(data, "user int, item int, dt date")
        return {
            (r.antecedent, r.consequent): (r.n_ab, r.confidence)
            for r in sequential_rules(
                df, max_items_per_user=20, min_common=1, top_k=1000
            ).collect()
        }

    fwd = run(lambda d: d)
    rev = run(lambda d: 15 - d)
    # CAUTION: first-adoption times differ between directions when a
    # user re-adopts an item, so only the pair-count multiset swaps
    # exactly when each (user, item) appears once — dedupe to that case
    seen = set()
    uniq = []
    for u, i, d in rows:
        if (u, i) not in seen:
            seen.add((u, i))
            uniq.append((u, i, d))
    if len(uniq) == len(rows):
        assert {(b, a): v[0] for (a, b), v in fwd.items()} == {
            (a, b): v[0] for (a, b), v in rev.items()
        }
    # direction axioms hold regardless
    for (a, b), (n_ab, conf) in fwd.items():
        assert a != b and n_ab >= 1
        assert 0.0 < conf <= 1.0


_cohort_events = st.lists(
    st.tuples(
        st.integers(1, 6),  # user
        st.sampled_from(["signup", "view", "purchase"]),
        st.integers(0, 40),  # day offset
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_cohort_events)
def test_cohort_retention_bounds_and_week_zero(spark, rows):
    """Retention is a share of a fixed cohort: every cell is in [0, 1]
    and week 0 is exactly 1.0 (the signup week itself counts as
    active — the signup event is an event)."""
    from recmetrics_pyspark_spark.operators.funnel import (
        cohort_retention,
    )

    rows = rows + [(1, "signup", 0)]
    data = [
        (u, _BASE + _dt.timedelta(days=d), et) for u, et, d in rows
    ]
    df = spark.createDataFrame(data, ["user_id", "ts", "event_type"])
    out = cohort_retention(df).collect()
    assert out, "at least the injected signup cohort must appear"
    for r in out:
        assert 0 < r.n_active <= r.cohort_size
        assert abs(r.retention - round(r.n_active / r.cohort_size, 6)) < 1e-9
        if r.week_offset == 0:
            assert r.retention == 1.0
