"""Hand-computed fixtures for the round-5 fifth batch: SCD2 history,
join-size report, token budget planner, bot activity flags."""

from __future__ import annotations

import datetime as _dt


def test_scd2_history_intervals_and_tiebreak(spark):
    from recmetrics_pyspark_spark.operators.cdc import scd2_history

    rows = [
        # key 1: A (d1), A again (d2, no change), B (d3) -> 2 intervals
        (1, "A", _dt.date(2024, 1, 1), 10),
        (1, "A", _dt.date(2024, 1, 2), 11),
        (1, "B", _dt.date(2024, 1, 3), 12),
        # key 2: same-day tie -> tiebreak 21 wins with "Y"
        (2, "X", _dt.date(2024, 1, 1), 20),
        (2, "Y", _dt.date(2024, 1, 1), 21),
    ]
    df = spark.createDataFrame(rows, ["k", "a", "t", "tb"])
    out = scd2_history(df, "k", "a", "t", "tb").collect()
    got = [
        (r.key, r.attr_value, r.valid_from, r.valid_to, r.is_current,
         r.version)
        for r in out
    ]
    assert got == [
        (1, "A", "2024-01-01", "2024-01-03", 0, 1),
        (1, "B", "2024-01-03", None, 1, 2),
        (2, "Y", "2024-01-01", None, 1, 1),
    ]


def test_scd2_history_null_attr_is_a_value(spark):
    from recmetrics_pyspark_spark.operators.cdc import scd2_history

    rows = [
        (1, None, _dt.date(2024, 1, 1), 1),
        (1, None, _dt.date(2024, 1, 2), 2),  # same NULL run
        (1, "A", _dt.date(2024, 1, 3), 3),
    ]
    df = spark.createDataFrame(
        rows, "k int, a string, t date, tb int"
    )
    out = scd2_history(df, "k", "a", "t", "tb").collect()
    assert [(r.attr_value, r.version) for r in out] == [
        (None, 1),
        ("A", 2),
    ]


def test_join_size_report_exact_products(spark):
    from recmetrics_pyspark_spark.operators.skew import (
        join_size_report,
    )

    left = spark.createDataFrame(
        [(k,) for k in ["a", "a", "a", "b", "c"]], ["k"]
    )
    right = spark.createDataFrame(
        [(k,) for k in ["a", "a", "b", "d"]], ["k"]
    )
    out = join_size_report(left, right, "k", "k", top_k=5).collect()
    # matched keys: a (3x2=6), b (1x1=1); join_rows = 7
    assert [(r.key, r.n_left, r.n_right, r.n_pairs) for r in out] == [
        ("a", 3, 2, 6),
        ("b", 1, 1, 1),
    ]
    top = out[0]
    assert top.join_rows == 7
    assert top.n_matched_keys == 2
    assert top.left_rows == 5 and top.right_rows == 4
    assert top.share_of_join == round(6 / 7, 6)
    # the report's prediction equals the real join's row count
    assert left.join(right, "k").count() == 7


def test_token_budget_plan_rates_and_epochs(spark):
    from recmetrics_pyspark_spark.functions.curation import (
        token_budget_plan,
    )

    docs = spark.createDataFrame(
        [
            (1, "w w w w", "s1"),   # 4 tokens
            (2, "w w", "s1"),       # 2 tokens -> s1 inventory 6
            (3, "w", "s2"),         # s2 inventory 1
        ],
        ["doc_id", "text", "source"],
    )
    out = {r.source: r for r in token_budget_plan(docs, 10).collect()}
    # 2 sources -> 5 tokens each
    s1, s2 = out["s1"], out["s2"]
    assert (s1.n_docs, s1.n_tokens, s1.allocated_tokens) == (2, 6, 5)
    assert s1.target_weight == 0.5
    assert s1.sample_rate == round(5 / 6, 6)
    assert s1.epochs == round(5 / 6, 6)
    # under-inventoried source: rate caps at 1, epochs says repeat 5x
    assert (s2.n_tokens, s2.sample_rate, s2.epochs) == (1, 1.0, 5.0)


def test_bot_activity_flags_burst_and_rate(spark):
    from recmetrics_pyspark_spark.operators.funnel import (
        bot_activity_flags,
    )

    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # bot: 30 events in 3 seconds (10 within any 10s window)
    for i in range(30):
        rows.append((1, t0 + _dt.timedelta(milliseconds=100 * i)))
    # human: 25 events one hour apart
    for i in range(25):
        rows.append((2, t0 + _dt.timedelta(hours=i)))
    # below min_events: ignored entirely
    rows.append((3, t0))
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r.user_id: r for r in bot_activity_flags(df).collect()}
    assert set(out) == {1, 2}
    bot, human = out[1], out[2]
    assert bot.is_bot == 1 and bot.max_burst_10s == 30
    assert bot.active_secs == 2.9
    assert human.is_bot == 0 and human.max_burst_10s == 1
    # human sustained rate: 25 events over 24h = ~0.017/min
    assert human.events_per_min == round(25 * 60 / (24 * 3600), 6)


def test_bot_activity_flags_single_instant_user_not_rate_flagged(
    spark,
):
    from recmetrics_pyspark_spark.operators.funnel import (
        bot_activity_flags,
    )

    # 20 events at the SAME microsecond: zero span -> NULL rate; the
    # burst rule still catches it (that's the point of having both)
    t0 = _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0)] * 20, ["user_id", "ts"]
    )
    r = bot_activity_flags(df).collect()[0]
    assert r.events_per_min is None
    assert r.active_secs == 0.0
    assert r.max_burst_10s == 20 and r.is_bot == 1


def test_theil_sen_robust_to_one_outlier(spark):
    from recmetrics_pyspark_spark.operators.timeseries import (
        theil_sen_trend,
    )

    # days 1..5 with v = 10*x, except day 3 is a wild outlier:
    # OLS would bend; the pairwise-slope median stays 10
    rows = []
    vals = {1: 10.0, 2: 20.0, 3: 900.0, 4: 40.0, 5: 50.0}
    for day, v in vals.items():
        rows.append((_dt.datetime(2024, 1, day), v))
    df = spark.createDataFrame(rows, ["ts", "v"])
    r = theil_sen_trend(df, "ts", "v").collect()[0]
    assert r.n_days == 5 and r.n_pairs == 10
    assert r.slope_per_day == 10.0
    assert r.median_level == 40.0


def test_seasonal_residual_anomalies_flags_the_odd_tuesday(spark):
    from recmetrics_pyspark_spark.operators.timeseries import (
        seasonal_residual_anomalies,
    )

    # 4 weeks: Mondays always 10 events, Tuesdays always 20 —
    # except the last Tuesday spikes to 60
    rows = []
    for wk in range(4):
        mon = _dt.datetime(2024, 1, 1) + _dt.timedelta(weeks=wk)
        for i in range(10):
            rows.append((mon + _dt.timedelta(seconds=i),))
        tue = mon + _dt.timedelta(days=1)
        n = 60 if wk == 3 else 20
        for i in range(n):
            rows.append((tue + _dt.timedelta(seconds=i),))
    df = spark.createDataFrame(rows, ["ts"])
    out = seasonal_residual_anomalies(df, "ts", z_threshold=2.0)
    got = out.collect()
    assert [r.day for r in got] == ["2024-01-23"]
    assert got[0].n == 60
    assert got[0].weekday_mean == 30.0  # (20*3 + 60) / 4


def test_peak_concurrency_overlap_and_day_split(spark):
    from recmetrics_pyspark_spark.operators.funnel import (
        peak_concurrency,
    )

    t = lambda h, m=0: _dt.datetime(2024, 1, 1, h, m)
    rows = [
        # three sessions overlapping 12:00-12:10 (users 1, 2, 3)
        (1, t(11, 50)), (1, t(12, 10)),
        (2, t(11, 55)), (2, t(12, 5)),
        (3, t(12, 0)), (3, t(12, 8)),
        # user 4 alone in the evening
        (4, t(20, 0)),
        # user 5 spans midnight: 23:50 Jan 1 -> 00:10 Jan 2
        (5, t(23, 50)),
        (5, _dt.datetime(2024, 1, 2, 0, 10)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r.day: r for r in peak_concurrency(df).collect()}
    assert set(out) == {"2024-01-01", "2024-01-02"}
    d1 = out["2024-01-01"]
    assert d1.peak_concurrent == 3  # the 12:00-12:05 triple overlap
    assert d1.n_sessions == 5  # 1,2,3,4 + user 5's pre-midnight leg
    d2 = out["2024-01-02"]
    assert d2.peak_concurrent == 1 and d2.n_sessions == 1


def test_peak_concurrency_point_session_counts(spark):
    from recmetrics_pyspark_spark.operators.funnel import (
        peak_concurrency,
    )

    # two single-event sessions at the SAME instant still overlap
    t0 = _dt.datetime(2024, 1, 1, 9)
    df = spark.createDataFrame(
        [(1, t0), (2, t0)], ["user_id", "ts"]
    )
    r = peak_concurrency(df).collect()[0]
    assert r.peak_concurrent == 2 and r.n_sessions == 2
