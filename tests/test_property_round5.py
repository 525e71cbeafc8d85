"""Property-based invariants (hypothesis) for the round-5 operator
families: entropy bounds, JS divergence axioms, k-core structural
guarantees, degree-histogram conservation, Benford share conservation,
and session accounting — the algebraic contracts random inputs can
sweep where fixtures can't.

Few large examples per property (each example runs Spark jobs)."""

from __future__ import annotations

import datetime as _dt

from hypothesis import given, settings, strategies as st


_interactions = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 8)),  # (user, item)
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_interactions)
def test_entropy_bounds_hold_for_any_interactions(spark, rows):
    import math

    from recmetrics_pyspark_spark.operators.metrics import (
        user_behavior_entropy,
    )

    df = spark.createDataFrame(rows, ["user", "item"])
    out = user_behavior_entropy(df, k=100).collect()
    users = {u for u, _ in rows}
    assert len(out) == len(users)
    for r in out:
        assert 0.0 <= r.entropy <= math.log2(max(r.n_items, 2)) + 1e-6
        if r.n_items == 1:
            assert r.entropy == 0.0 and r.norm_entropy is None
        else:
            assert 0.0 <= r.norm_entropy <= 1.0 + 1e-9


_docs_two_sources = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=6
        ),
    ),
    min_size=2,
    max_size=10,
).filter(lambda rows: {r[0] for r in rows} == {"s1", "s2"})


@settings(max_examples=5, deadline=None)
@given(rows=_docs_two_sources)
def test_js_divergence_bounded_for_any_corpus(spark, rows):
    from recmetrics_pyspark_spark.functions.curation import (
        source_divergence,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks), src) for i, (src, toks) in enumerate(rows)],
        ["doc_id", "text", "source"],
    )
    out = source_divergence(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b) == ("s1", "s2")
    # JS in bits is bounded by 1; smoothing keeps it strictly finite
    assert -1e-9 <= r.js_divergence <= 1.0 + 1e-9


_edges = st.lists(
    st.tuples(st.integers(1, 9), st.integers(1, 9)),
    min_size=1,
    max_size=25,
).map(
    lambda es: sorted(
        {(min(a, b), max(a, b)) for a, b in es if a != b}
    )
).filter(lambda es: len(es) >= 1)


@settings(max_examples=5, deadline=None)
@given(edges=_edges)
def test_kcore_structure_for_any_graph(spark, edges):
    from recmetrics_pyspark_spark.operators.graph import (
        degree_distribution,
        k_core_decompose,
    )

    pairs = spark.createDataFrame(edges, ["ia", "ib"])
    core2 = k_core_decompose(pairs, k=2, rounds=6).collect()
    core3 = k_core_decompose(pairs, k=3, rounds=6).collect()
    # every surviving node meets the core's degree bar
    assert all(r.degree >= 2 for r in core2)
    assert all(r.degree >= 3 for r in core3)
    # cores are nested: the 3-core node set is inside the 2-core's
    assert {r.node for r in core3} <= {r.node for r in core2}

    # degree histogram conserves the node count of the input graph
    hist = degree_distribution(pairs).collect()
    nodes = {z for e in edges for z in e}
    assert sum(r.n_nodes for r in hist) == len(nodes)
    assert sum(r.degree * r.n_nodes for r in hist) == 2 * len(edges)


_amounts = st.lists(
    st.floats(
        min_value=0.01,
        max_value=9e6,
        allow_nan=False,
        allow_infinity=False,
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=5, deadline=None)
@given(amounts=_amounts)
def test_benford_shares_sum_to_one(spark, amounts):
    from recmetrics_pyspark_spark.operators.quality import benford_deviation

    df = spark.createDataFrame([(a,) for a in amounts], ["amt"])
    out = benford_deviation(df, "amt").collect()
    assert abs(sum(r.obs_share for r in out) - 1.0) < 1e-4
    assert sum(r.n for r in out) == len(amounts)
    for r in out:
        assert 1 <= r.digit <= 9
        assert 0.0 < r.exp_share < 0.4  # log10(2) is the max (d=1)


_events = st.lists(
    st.tuples(
        st.integers(1, 4),          # user
        st.integers(0, 5000),       # minutes offset
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(rows=_events)
def test_session_accounting_for_any_event_set(spark, rows):
    from recmetrics_pyspark_spark.operators.funnel import session_summary

    t0 = _dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(u, t0 + _dt.timedelta(minutes=m)) for u, m in rows],
        ["user_id", "ts"],
    )
    r = session_summary(ev).collect()[0]
    n_users = len({u for u, _ in rows})
    # at least one session per active user, at most one per event
    assert n_users <= r.n_sessions <= len(rows)
    assert 0.0 <= r.bounce_rate <= 1.0
    # events are conserved: avg * sessions == total events
    assert round(r.avg_events_per_session * r.n_sessions) == len(rows)
    assert r.median_duration_sec >= 0.0
