"""Property-based invariants, batch 4: round-5 families — growth
accounting (the new/retained/resurrected/churned identity), k-anonymity
audit arithmetic, bot-screen burst/rate flags, cohort-LTV monotonicity,
and session-summary microsecond durations — each against a Python
replay where semantics allow an exact one.

Few large examples per property (each example runs Spark jobs)."""

from __future__ import annotations

import datetime as _dt

import numpy as _np
from hypothesis import given, settings, strategies as st

_BASE = _dt.datetime(2024, 3, 4, 12, 0, 0)  # a Monday


def _monday(ts: _dt.datetime) -> _dt.date:
    return ts.date() - _dt.timedelta(days=ts.weekday())


_lifecycle_events = st.lists(
    st.tuples(st.integers(1, 5), st.integers(0, 6 * 7 * 1440)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_lifecycle_events)
def test_growth_accounting_identity_and_replay(spark, rows):
    """Per week: active = new + retained + resurrected, churned =
    last week's active − retained, and the whole table equals a
    Python replay over weekly active sets (including interior dead
    weeks, which emit churn-only rows)."""
    from recmetrics_pyspark_spark.operators.funnel import (
        user_lifecycle_stages,
    )

    data = [(u, _BASE + _dt.timedelta(minutes=m)) for u, m in rows]
    df = spark.createDataFrame(data, ["user_id", "ts"])
    out = {
        r.week: (r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
        for r in user_lifecycle_stages(df).collect()
    }

    active: dict[_dt.date, set] = {}
    for u, ts in data:
        active.setdefault(_monday(ts), set()).add(u)
    first = {}
    for wk in sorted(active):
        for u in active[wk]:
            first.setdefault(u, wk)
    max_wk = max(active)
    weeks = set(active) | {
        wk + _dt.timedelta(days=7)
        for wk in active
        if wk + _dt.timedelta(days=7) <= max_wk
    }
    expect = {}
    for wk in sorted(weeks):
        cur = active.get(wk, set())
        prev = active.get(wk - _dt.timedelta(days=7), set())
        n_new = sum(1 for u in cur if first[u] == wk)
        n_ret = len(cur & prev)
        n_res = len(cur) - n_new - n_ret
        n_chu = len(prev - cur)
        expect[str(wk)] = (n_new, n_ret, n_res, n_chu)
    assert out == expect
    # the growth identity, asserted on the OUTPUT itself
    act_by_wk = {str(wk): len(us) for wk, us in active.items()}
    for week, (n_new, n_ret, n_res, n_chu) in out.items():
        cur = act_by_wk.get(week, 0)
        prev = act_by_wk.get(
            str(
                _dt.date.fromisoformat(week) - _dt.timedelta(days=7)
            ),
            0,
        )
        assert cur == n_new + n_ret + n_res
        assert n_chu == prev - n_ret


_quasi_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 2)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_quasi_rows, k=st.integers(2, 6))
def test_k_anonymity_audit_matches_replay(spark, rows, k):
    from recmetrics_pyspark_spark.operators.quality import (
        k_anonymity_audit,
    )

    df = spark.createDataFrame(rows, ["qa", "qb"])
    out = k_anonymity_audit(df, ["qa", "qb"], k=k).collect()[0]
    classes: dict[tuple, int] = {}
    for t in rows:
        classes[t] = classes.get(t, 0) + 1
    at_risk = sum(c for c in classes.values() if c < k)
    assert out.k == k
    assert out.n_classes == len(classes)
    assert out.n_rows == len(rows)
    assert out.k_min == min(classes.values())
    assert out.n_at_risk == at_risk
    assert abs(out.risk_fraction - round(at_risk / len(rows), 6)) < 1e-9


_bot_events = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 120)),  # (user, sec)
    min_size=2,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(rows=_bot_events)
def test_bot_flags_match_python_burst_and_rate(spark, rows):
    """Burst = max count in any [t, t+10s) window anchored at an
    event; rate flag via the multiplicative rule (zero-span
    multi-event users ARE flagged, with NULL displayed rate) — all
    mirrored exactly in Python."""
    from recmetrics_pyspark_spark.operators.funnel import (
        bot_activity_flags,
    )

    data = [(u, _BASE + _dt.timedelta(seconds=s)) for u, s in rows]
    df = spark.createDataFrame(data, ["user_id", "ts"])
    out = {
        r.user_id: (r.n_events, r.max_burst_10s, r.events_per_min,
                    r.is_bot)
        for r in bot_activity_flags(
            df, min_events=2, burst_threshold=4,
            rate_threshold_per_min=30.0,
        ).collect()
    }

    by_user: dict[int, list] = {}
    for u, ts in data:
        by_user.setdefault(u, []).append(
            int((ts - _BASE).total_seconds() * 1_000_000)
        )
    expect = {}
    for u, mus in by_user.items():
        if len(mus) < 2:
            continue
        mus.sort()
        burst = max(
            sum(1 for q in mus if p <= q <= p + 9_999_999) for p in mus
        )
        span = mus[-1] - mus[0]
        n = len(mus)
        rate = round(n * 60_000_000.0 / span, 6) if span > 0 else None
        flagged = burst >= 4 or (n * 60_000_000.0 > 30.0 * span)
        expect[u] = (n, burst, rate, 1 if flagged else 0)
    assert out == expect


_ltv_events = st.lists(
    st.tuples(
        st.integers(1, 5),
        st.sampled_from(["signup", "purchase"]),
        st.integers(0, 6 * 7 * 1440),
        st.integers(1, 100),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(rows=_ltv_events)
def test_cohort_ltv_cumulative_monotone(spark, rows):
    """Within a cohort the LTV curve can only rise: cum_revenue and
    ltv_per_user are non-decreasing in week_offset, the size is
    constant, and ltv_per_user = cum/size at every point."""
    from recmetrics_pyspark_spark.operators.funnel import cohort_ltv

    rows = rows + [(1, "signup", 0, 1), (1, "purchase", 60, 50)]
    data = [
        (u, _BASE + _dt.timedelta(minutes=m), et, float(v))
        for u, et, m, v in rows
    ]
    df = spark.createDataFrame(
        data, "user_id int, ts timestamp, event_type string, value double"
    )
    out = cohort_ltv(df).collect()
    assert out
    by_cohort: dict[str, list] = {}
    for r in out:
        by_cohort.setdefault(str(r.cohort_week), []).append(r)
    for series in by_cohort.values():
        series.sort(key=lambda r: r.week_offset)
        sizes = {r.cohort_size for r in series}
        assert len(sizes) == 1
        size = sizes.pop()
        for r in series:
            assert r.week_offset >= 0
            assert abs(
                r.ltv_per_user - round(r.cum_revenue / size, 6)
            ) < 1e-6
        for a, b in zip(series, series[1:]):
            assert a.cum_revenue <= b.cum_revenue + 1e-9


_session_events = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 7_200_000)),  # ms
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(rows=_session_events)
def test_session_summary_microsecond_durations(spark, rows):
    """The round-6 precision fix under random fire: durations are
    exact microsecond spans (sub-second sessions contribute their
    true fractional seconds), medians interpolate, bounces count
    single-event sessions."""
    from recmetrics_pyspark_spark.operators.funnel import (
        session_summary,
    )

    data = [
        (u, _BASE + _dt.timedelta(milliseconds=ms)) for u, ms in rows
    ]
    df = spark.createDataFrame(data, ["user_id", "ts"])
    out = session_summary(df).collect()[0]

    by_user: dict[int, list] = {}
    for u, ts in data:
        by_user.setdefault(u, []).append(
            int((ts - _BASE) / _dt.timedelta(microseconds=1))
        )
    durs, n_events = [], []
    for u, mus in by_user.items():
        mus = sorted(mus)  # duplicates kept: same-ts events count
        cur = [mus[0], mus[0], 1]
        sessions = [cur]
        for t in mus[1:]:
            if t - cur[1] > 1_800_000_000:
                cur = [t, t, 1]
                sessions.append(cur)
            else:
                cur[1] = t
                cur[2] += 1
        for s, e, n in sessions:
            durs.append(e - s)
            n_events.append(n)
    total = len(durs)
    assert out.n_sessions == total
    assert abs(
        out.avg_events_per_session - round(sum(n_events) / total, 6)
    ) < 1e-9
    assert abs(
        out.bounce_rate
        - round(sum(1 for n in n_events if n == 1) / total, 6)
    ) < 1e-9
    assert abs(
        out.avg_duration_sec
        - round(sum(durs) / total / 1_000_000.0, 6)
    ) < 1e-9
    med = float(_np.percentile(_np.array(durs, dtype=float), 50))
    assert abs(out.median_duration_sec - med / 1_000_000.0) < 1e-12
