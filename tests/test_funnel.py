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
