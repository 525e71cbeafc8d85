"""Property-based invariants, batch 3: the last round-4 families
without random-input coverage — skipgram pair counting, common-
neighbor link prediction, churn labeling, WoW trending deltas, RFM
conservation, and conversion-latency percentiles — each checked
against an independent Python replay where the semantics allow an
exact one.

Few large examples per property (each example runs Spark jobs)."""

from __future__ import annotations

import datetime as _dt

import numpy as _np
from hypothesis import given, settings, strategies as st

_BASE = _dt.datetime(2024, 3, 4, 12, 0, 0)

_sequences = st.lists(
    st.tuples(st.integers(1, 4), st.integers(1, 6)),  # (user, item)
    min_size=2,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(rows=_sequences, window=st.integers(1, 3))
def test_skipgram_counts_match_sliding_window(spark, rows, window):
    """The bounded-frame window formulation must count exactly what
    the textbook ±window sliding scan counts, per direction."""
    from recmetrics_pyspark_spark.operators.recommend import (
        skipgram_pairs,
    )

    base_day = _dt.date(2024, 1, 1)
    data = [
        (u, base_day, i, it) for i, (u, it) in enumerate(rows)
    ]  # ok = arrival index: a total order per user
    df = spark.createDataFrame(data, "user int, dt date, ok int, item int")
    out = {
        (r.center, r.context): r.n_cooc
        for r in skipgram_pairs(df, window=window, top_k=10_000).collect()
    }

    seqs: dict[int, list] = {}
    for u, _, _, it in data:
        seqs.setdefault(u, []).append(it)  # arrival order == ok order
    expect: dict[tuple, int] = {}
    for s in seqs.values():
        for j in range(len(s)):
            for i in range(max(0, j - window), j):
                expect[(s[j], s[i])] = expect.get((s[j], s[i]), 0) + 1
                expect[(s[i], s[j])] = expect.get((s[i], s[j]), 0) + 1
    assert out == expect


_graphs = st.lists(
    st.tuples(st.integers(1, 8), st.integers(1, 8)),
    min_size=2,
    max_size=20,
).map(
    lambda es: sorted({(min(a, b), max(a, b)) for a, b in es if a != b})
)


@settings(max_examples=5, deadline=None)
@given(edges=_graphs)
def test_common_neighbor_scores_exact_without_cap(spark, edges):
    """With the wedge cap lifted past every degree, the predictor must
    emit exactly the non-edges with ≥1 common neighbor, scored
    |Γa ∩ Γb| with full-degree Jaccard."""
    from recmetrics_pyspark_spark.operators.graph import (
        common_neighbor_links,
    )

    if not edges:
        return
    pairs = spark.createDataFrame(
        [(a, b, 1) for a, b in edges], ["ia", "ib", "n_common"]
    )
    out = {
        (r.item_a, r.item_b): (r.n_common_nbrs, r.jaccard_nbrs)
        for r in common_neighbor_links(
            pairs, top_neighbors=100, k=1000
        ).collect()
    }

    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    eset = set(edges)
    expect = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in eset:
                continue
            cn = len(adj[a] & adj[b])
            if cn:
                jac = round(cn / (len(adj[a]) + len(adj[b]) - cn), 6)
                expect[(a, b)] = (cn, jac)
    assert out == expect


_churn_events = st.lists(
    st.tuples(
        st.integers(1, 5),
        st.sampled_from(["view", "purchase"]),
        st.integers(0, 20 * 1440),  # minutes over ~20 days
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_churn_events)
def test_churn_labels_and_features_match_replay(spark, rows):
    """Leakage-safe by construction: features from strictly before the
    cutoff, the label from at-or-after it — verified row by row
    against a Python replay on random event logs."""
    from recmetrics_pyspark_spark.operators.funnel import (
        churn_training_set,
    )

    data = [
        (u, _BASE + _dt.timedelta(minutes=m), et) for u, et, m in rows
    ]
    df = spark.createDataFrame(data, ["user_id", "ts", "event_type"])
    out = {
        r.user_id: (
            r.n_events, r.n_purchases, r.n_active_days,
            r.recency_days, r.churned,
        )
        for r in churn_training_set(df, horizon_days=7).collect()
    }

    max_ts = max(t for _, t, _ in data)
    cutoff = max_ts - _dt.timedelta(days=7)
    expect = {}
    for u in {u for u, _, _ in data}:
        pre = [(t, et) for u2, t, et in data if u2 == u and t < cutoff]
        if not pre:
            continue  # users with no pre-cutoff features are excluded
        post = any(
            u2 == u and t >= cutoff for u2, t, _ in data
        )
        last = max(t for t, _ in pre)
        expect[u] = (
            len(pre),
            sum(1 for _, et in pre if et == "purchase"),
            len({t.date() for t, _ in pre}),
            (cutoff.date() - last.date()).days,
            not post,
        )
    assert out == expect


_wow_events = st.lists(
    st.tuples(st.integers(1, 4), st.integers(0, 5 * 7 * 1440)),
    min_size=2,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_wow_events)
def test_wow_trending_deltas_match_replay(spark, rows):
    """Deltas compare each key's week against its PREVIOUS OBSERVED
    week (gap weeks collapse), exactly as a Python replay of the
    weekly counts does."""
    from recmetrics_pyspark_spark.operators.funnel import wow_trending

    data = [
        (u, _BASE + _dt.timedelta(minutes=m), "purchase")
        for u, m in rows
    ]
    df = spark.createDataFrame(data, ["user_id", "ts", "event_type"])
    out = {
        (r.key, r.week): (r.n, r.delta, r.ratio)
        for r in wow_trending(df, top_k=10_000).collect()
    }

    weekly: dict[tuple, int] = {}
    for u, ts, _ in data:
        monday = ts.date() - _dt.timedelta(days=ts.weekday())
        weekly[(u, str(monday))] = weekly.get((u, str(monday)), 0) + 1
    expect = {}
    by_key: dict[int, list] = {}
    for (u, wk), n in weekly.items():
        by_key.setdefault(u, []).append((wk, n))
    for u, series in by_key.items():
        series.sort()
        for (pw, pn), (cw, cn) in zip(series, series[1:]):
            expect[(u, cw)] = (cn, cn - pn, round(cn / pn, 6))
    assert out == expect


_rfm_orders = st.lists(
    st.tuples(
        st.integers(1, 10),  # cust
        st.integers(0, 60),  # day offset
        st.integers(1, 300),  # amount
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_rfm_orders)
def test_rfm_segments_conserve_customers_and_revenue(spark, rows):
    """Segmentation is a partition of the customer base: occupancy
    sums to the customer count, bins stay in range, and the weighted
    segment averages reconstruct total revenue."""
    from recmetrics_pyspark_spark.operators.funnel import rfm_segments

    base_day = _dt.date(2024, 1, 1)
    data = [
        (c, base_day + _dt.timedelta(days=d), float(a))
        for c, d, a in rows
    ]
    df = spark.createDataFrame(
        data, "o_custkey int, o_orderdate date, o_totalprice double"
    )
    out = rfm_segments(df).collect()
    n_custs = len({c for c, _, _ in rows})
    assert sum(r.n_customers for r in out) == n_custs
    for r in out:
        assert 0 <= r.r_bin <= 4 and 0 <= r.f_bin <= 4 and 0 <= r.m_bin <= 4
        assert r.n_customers >= 1
    total = sum(a for _, _, a in rows)
    recon = sum(r.n_customers * r.avg_monetary for r in out)
    assert abs(recon - total) < 1e-3 * max(1.0, total)


_latency_events = st.lists(
    st.tuples(
        st.integers(1, 5),
        st.sampled_from(["view", "purchase"]),
        st.integers(0, 3600),
    ),
    min_size=2,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_latency_events)
def test_conversion_latency_percentiles_match_numpy(spark, rows):
    """First-view → first-purchase-at-or-after latencies: count and
    interpolated percentiles must equal numpy's linear method over the
    replayed per-user latencies."""
    from recmetrics_pyspark_spark.operators.funnel import (
        conversion_latency,
    )

    rows = rows + [(1, "view", 0), (1, "purchase", 60)]
    data = [
        (u, _BASE + _dt.timedelta(seconds=s), et) for u, et, s in rows
    ]
    df = spark.createDataFrame(data, ["user_id", "ts", "event_type"])
    out = conversion_latency(df).collect()[0]

    lats = []
    for u in {u for u, _, _ in rows}:
        views = [t for u2, t, et in data if u2 == u and et == "view"]
        if not views:
            continue
        t0 = min(views)
        purch = [
            t for u2, t, et in data
            if u2 == u and et == "purchase" and t >= t0
        ]
        if purch:
            lats.append(int((min(purch) - t0).total_seconds()))
    assert out.n_converted == len(lats)
    if lats:
        arr = _np.array(lats, dtype=float)
        for col, q in (("p25", 25), ("p50", 50), ("p75", 75), ("p90", 90)):
            assert abs(
                getattr(out, col)
                - round(float(_np.percentile(arr, q)), 6)
            ) < 1e-9, col
        assert abs(out.mean_sec - round(sum(lats) / len(lats), 6)) < 1e-9
