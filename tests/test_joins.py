"""Semantics tests for the composed as-of and range joins."""

from __future__ import annotations

import datetime as dt

from recmetrics_pyspark_spark.operators.joins import asof_join, range_self_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "e1"),
         (1, _ts("2024-01-01T12:00:00"), "e2"),
         (2, _ts("2024-01-01T09:00:00"), "e3")],
        ["k", "ts", "name"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), 10.0),
         (1, _ts("2024-01-01T11:00:00"), 20.0),
         (2, _ts("2024-01-01T09:30:00"), 30.0)],  # after e3 -> no match
        ["k", "ts", "px"],
    )
    out = {r["name"]: r for r in asof_join(left, right, on="k").collect()}
    assert out["e1"]["px_asof"] == 10.0
    assert out["e2"]["px_asof"] == 20.0
    assert out["e3"]["px_asof"] is None and out["e3"]["ts_asof"] is None


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"), "e")], ["k", "ts", "name"])
    right = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"), 5.0)], ["k", "ts", "px"])
    row = asof_join(left, right, on="k").head()
    assert row["px_asof"] == 5.0  # <= semantics: same-instant row matches


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "e1"),
         (1, _ts("2024-01-01T11:30:00"), "e2")],
        ["k", "ts", "name"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:30:00"), 10.0),
         (1, _ts("2024-01-01T11:00:00"), 20.0)],
        ["k", "ts", "px"],
    )
    out = {
        r["name"]: r
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    # e1's NEXT right is 10:30 (earliest >=), e2 has none ahead
    assert out["e1"]["px_asof"] == 10.0
    assert out["e2"]["px_asof"] is None
    # equal instant matches forward too
    row = asof_join(
        spark.createDataFrame([(1, _ts("2024-01-01T11:00:00"), "x")],
                              ["k", "ts", "name"]),
        right, on="k", direction="forward",
    ).head()
    assert row["px_asof"] == 20.0


def test_asof_tolerance_nulls_far_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "near"),
         (1, _ts("2024-01-01T13:00:01"), "far")],
        ["k", "ts", "name"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:59:00"), 1.0)], ["k", "ts", "px"]
    )
    out = {
        r["name"]: r
        for r in asof_join(
            left, right, on="k", tolerance_seconds=3600 * 3
        ).collect()
    }
    assert out["near"]["px_asof"] == 1.0
    # 3h 1m 1s away: beyond tolerance -> nulled, ts too
    assert out["far"]["px_asof"] is None and out["far"]["ts_asof"] is None


def test_range_self_join_cross_bucket_pairs(spark):
    # ids ordered against time: the pair (1, 2) has id_a earlier but
    # ts_a later -- must still be found across bucket boundaries
    rows = [
        (1, 1, _ts("2024-01-01T10:05:01")),
        (1, 2, _ts("2024-01-01T10:04:59")),  # gap -2s, spans bucket edge
        (1, 3, _ts("2024-01-01T10:20:00")),  # out of range of both
        (2, 4, _ts("2024-01-01T10:05:00")),  # other key
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    got = {
        (r["id_a"], r["id_b"]): r["gap_seconds"]
        for r in range_self_join(df, key="user_id", max_gap_seconds=300).collect()
    }
    assert got == {(1, 2): -2}


def test_range_self_join_exact_boundary(spark):
    rows = [
        (1, 1, _ts("2024-01-01T10:00:00")),
        (1, 2, _ts("2024-01-01T10:05:00")),  # exactly 300s: included
        (1, 3, _ts("2024-01-01T10:05:01")),  # 301s from id 1: excluded
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    got = {
        (r["id_a"], r["id_b"]): r["gap_seconds"]
        for r in range_self_join(df, key="user_id", max_gap_seconds=300).collect()
    }
    assert got == {(1, 2): 300, (2, 3): 1}
