"""Hand-computed fixtures for the product-analytics operators
(operators/funnel.py): ordered-funnel step binding and weekly cohort
retention."""

from __future__ import annotations

import datetime as dt

from recmetrics_pyspark_spark.operators.funnel import (
    cohort_retention,
    funnel_conversion,
)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_funnel_strict_ordering_and_rates(spark):
    rows = [
        # u1 completes the funnel in order
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # u2 clicks BEFORE viewing: click must not count
        (2, _ts(2), "click"),
        (2, _ts(3), "view"),
        # u3 views only
        (3, _ts(1), "view"),
        # u4 purchases before clicking: purchase must not count, and
        # the click binds to the earliest click AFTER the first view
        (4, _ts(1), "view"),
        (4, _ts(2), "purchase"),
        (4, _ts(3), "click"),
        # u5 never views — contributes nothing
        (5, _ts(1), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r.step: r
        for r in funnel_conversion(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    assert out["view"].n_users == 4  # u1-u4
    assert out["click"].n_users == 2  # u1, u4
    assert out["purchase"].n_users == 1  # u1 only
    assert out["view"].rate_from_first == 1.0
    assert out["view"].rate_from_prev == 1.0
    assert out["click"].rate_from_first == 0.5
    assert out["purchase"].rate_from_prev == 0.5
    assert [out[s].step_idx for s in ("view", "click", "purchase")] == [
        1,
        2,
        3,
    ]


def test_funnel_same_timestamp_counts(spark):
    # ts equality qualifies (>=): a click at the exact view instant
    # converts — pins the boundary semantics
    ev = spark.createDataFrame(
        [(1, _ts(1), "view"), (1, _ts(1), "click")],
        ["user_id", "ts", "event_type"],
    )
    out = {r.step: r.n_users for r in funnel_conversion(ev, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}


def test_cohort_retention_matrix(spark):
    # Mondays: 2024-01-01 and 2024-01-08. u1,u2 sign up in week 0;
    # u1 is active in weeks 0,1,2; u2 only week 0. u3 signs up week 1,
    # active weeks 1,2.
    rows = [
        (1, _ts(1), "signup"),
        (1, _ts(9), "view"),
        (1, _ts(16), "click"),
        (2, _ts(2), "signup"),
        (3, _ts(8), "signup"),
        (3, _ts(15), "view"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        (str(r.cohort_week), r.week_offset): (
            r.n_active,
            r.cohort_size,
            r.retention,
        )
        for r in cohort_retention(ev).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-01", 2)] == (1, 2, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert out[("2024-01-08", 1)] == (1, 1, 1.0)
    assert len(out) == 5


def test_rfm_segments_hand_computed(spark):
    import datetime as _dt

    from recmetrics_pyspark_spark.operators.funnel import rfm_segments

    def d(day):
        return _dt.date(2024, 1, day)

    # recency (vs max 01-10): c1=0, c2=2, c3=5, c4=9 -> median cut 3.5
    # frequency: 1,2,1,4 -> cut 1.5 ; monetary: 100,50,10,200 -> cut 75
    rows = [
        (1, d(10), 100.0),
        (2, d(8), 20.0),
        (2, d(7), 30.0),
        (3, d(5), 10.0),
        (4, d(1), 50.0),
        (4, d(1), 50.0),
        (4, d(1), 50.0),
        (4, d(1), 50.0),
    ]
    orders = spark.createDataFrame(
        rows, ["o_custkey", "o_orderdate", "o_totalprice"]
    )
    out = {
        (r.r_bin, r.f_bin, r.m_bin): (r.n_customers, r.avg_monetary)
        for r in rfm_segments(orders, n_bins=2).collect()
    }
    assert out == {
        (0, 0, 1): (1, 100.0),
        (0, 1, 0): (1, 50.0),
        (1, 0, 0): (1, 10.0),
        (1, 1, 1): (1, 200.0),
    }


def test_conversion_latency_hand_computed(spark):
    import datetime as _dt

    from recmetrics_pyspark_spark.operators.funnel import (
        conversion_latency,
    )

    def t(day, hour):
        return _dt.datetime(2024, 1, day, hour)

    rows = [
        # u1: view 01 00:00, purchase 01 02:00 -> 7200s (an earlier
        # purchase-before-view must not bind)
        (1, t(1, 0), "view"),
        (1, t(1, 2), "purchase"),
        # u2: purchase BEFORE first view only -> not converted
        (2, t(1, 0), "purchase"),
        (2, t(1, 1), "view"),
        # u3: view then two purchases: first qualifying one binds (1h)
        (3, t(2, 0), "view"),
        (3, t(2, 1), "purchase"),
        (3, t(2, 5), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    r = conversion_latency(ev).collect()[0]
    assert r.n_converted == 2
    # latencies {3600, 7200}: p50 = 5400 (interpolated), mean 5400
    assert r.p50 == 5400.0
    assert r.mean_sec == 5400.0
    assert r.p25 == 4500.0 and r.p90 == 6840.0


def test_funnel_empty_steps_still_emit_rows(spark):
    # nobody clicks or purchases: every step still gets a row, with
    # n_users=0 and NULL rate_from_prev past the first empty step
    ev = spark.createDataFrame(
        [(1, _ts(1), "view"), (2, _ts(2), "view")],
        ["user_id", "ts", "event_type"],
    )
    rows = {
        r.step: r
        for r in funnel_conversion(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    assert set(rows) == {"view", "click", "purchase"}
    assert rows["view"].n_users == 2
    assert rows["click"].n_users == 0
    assert rows["click"].rate_from_first == 0.0
    assert rows["purchase"].n_users == 0
    # 0/0: undefined, surfaced as NULL/NaN
    rp = rows["purchase"].rate_from_prev
    assert rp is None or rp != rp


def test_wow_trending_delta_math(spark):
    import datetime as _dt

    from recmetrics_pyspark_spark.operators.funnel import wow_trending

    rows = []
    # u1: 2 purchases week of 01-01, 5 week of 01-08 -> delta +3
    for i in range(2):
        rows.append((1, _dt.datetime(2024, 1, 2 + i), "purchase"))
    for i in range(5):
        rows.append((1, _dt.datetime(2024, 1, 8 + i % 5, 6), "purchase"))
    # u2: 4 then 1 -> delta -3 (same |delta|, later key -> rank 2)
    for i in range(4):
        rows.append((2, _dt.datetime(2024, 1, 3, 1 + i), "purchase"))
    rows.append((2, _dt.datetime(2024, 1, 9), "purchase"))
    # a view event must be ignored
    rows.append((1, _dt.datetime(2024, 1, 9), "view"))
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {(r.key, r.week): r for r in wow_trending(ev).collect()}
    r1 = out[(1, "2024-01-08")]
    assert (r1.n, r1.delta, r1.ratio, r1.rnk) == (5, 3, 2.5, 1)
    r2 = out[(2, "2024-01-08")]
    assert (r2.n, r2.delta, r2.ratio, r2.rnk) == (1, -3, 0.25, 2)
    # first observed weeks emit no row (delta undefined)
    assert (1, "2024-01-01") not in out


def test_churn_training_set_leakage_safe_label(spark):
    import datetime as _dt

    from recmetrics_pyspark_spark.operators.funnel import (
        churn_training_set,
    )

    # max ts = 01-20 12:00 -> cutoff = 01-13 12:00 (7-day horizon)
    rows = [
        # u1: active before AND after -> not churned
        (1, _dt.datetime(2024, 1, 2, 10), "view"),
        (1, _dt.datetime(2024, 1, 3, 10), "purchase"),
        (1, _dt.datetime(2024, 1, 15, 10), "view"),
        # u2: only before cutoff -> churned; recency = 13-13+? last
        # pre event 01-05 -> recency 8 days (dates 01-05 .. 01-13)
        (2, _dt.datetime(2024, 1, 5, 10), "view"),
        # u3: only AFTER cutoff -> no feature row at all
        (3, _dt.datetime(2024, 1, 20, 12), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r.user_id: r for r in churn_training_set(ev).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1.n_events, r1.n_purchases, r1.n_active_days) == (2, 1, 2)
    assert not r1.churned
    r2 = out[2]
    assert (r2.n_events, r2.n_purchases, r2.churned) == (1, 0, True)
    assert r2.recency_days == 8


from hypothesis import given, settings, strategies as st

_event_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),  # user
        st.integers(min_value=0, max_value=20 * 24),  # hour offset
        st.sampled_from(["view", "click", "purchase", "signup"]),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=6, deadline=None)
@given(rows=_event_rows)
def test_funnel_invariants_random_events(spark, rows):
    """Funnel laws on arbitrary event sets: one row per step always;
    n_users non-increasing along the funnel (a user cannot convert
    step k without step k-1); rates within [0, 1]."""
    import datetime as _dt

    ev = spark.createDataFrame(
        [
            (u, _dt.datetime(2024, 1, 1) + _dt.timedelta(hours=h), t)
            for u, h, t in rows
        ],
        ["user_id", "ts", "event_type"],
    )
    out = sorted(
        funnel_conversion(ev, ["view", "click", "purchase"]).collect(),
        key=lambda r: r.step_idx,
    )
    assert [r.step for r in out] == ["view", "click", "purchase"]
    counts = [r.n_users for r in out]
    assert counts == sorted(counts, reverse=True)
    for r in out:
        for rate in (r.rate_from_first, r.rate_from_prev):
            assert rate is None or (0.0 <= rate <= 1.0)


@settings(max_examples=6, deadline=None)
@given(rows=_event_rows)
def test_cohort_retention_invariants_random_events(spark, rows):
    """Cohort laws: offset-0 retention is 1.0 (the signup itself is
    activity), every retention within (0, 1], n_active <= cohort_size,
    and cohort sizes sum to the distinct signup-user count."""
    import datetime as _dt

    ev = spark.createDataFrame(
        [
            (u, _dt.datetime(2024, 1, 1) + _dt.timedelta(hours=h), t)
            for u, h, t in rows
        ],
        ["user_id", "ts", "event_type"],
    )
    out = cohort_retention(ev).collect()
    signups = {u for u, _, t in rows if t == "signup"}
    if not signups:
        assert out == []
        return
    sizes = {}
    for r in out:
        assert 0.0 < r.retention <= 1.0
        assert r.n_active <= r.cohort_size
        if r.week_offset == 0:
            assert r.retention == 1.0
        sizes[str(r.cohort_week)] = r.cohort_size
    assert sum(sizes.values()) == len(signups)


def test_funnel_leaves_no_cache_manager_entries(spark):
    # Persist lifecycle: funnel step tables use lazy localCheckpoint
    # (ContextCleaner-managed blocks), NOT .persist() — repeated funnel
    # calls in a long session must not accumulate CacheManager entries
    # that only spark.catalog.clearCache() could release.
    spark.catalog.clearCache()
    rows = [
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (2, _ts(1), "view"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    for _ in range(3):
        out = funnel_conversion(ev, ["view", "click"]).collect()
        assert {r.step: r.n_users for r in out} == {"view": 2, "click": 1}
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    assert cache_mgr.isEmpty(), "funnel_conversion left cached plans"
