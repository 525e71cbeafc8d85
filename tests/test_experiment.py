"""Contract tests for the round-3 analytics additions — experiment
readouts (A/B, Kaplan-Meier), time-series operators (Holt, CUSUM,
seasonality), graph triangles, and BPE training: assignment
stability, censoring, recurrences, and greedy-scan semantics on
handcrafted frames where violations are visible. Values are pinned
against DuckDB by the oracle-parity suite."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from recmetrics_pyspark_spark.operators.experiment import (
    ab_test_analysis,
    km_survival,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts date, value double")


def test_ab_assignment_is_deterministic_and_salted(spark):
    rows = [(u, datetime.date(2024, 1, 1), float(u % 7)) for u in range(200)]
    df = _events(spark, rows)
    r1 = ab_test_analysis(df, "user_id", "value", salt="exp1").collect()[0]
    r2 = ab_test_analysis(df, "user_id", "value", salt="exp1").collect()[0]
    assert r1 == r2  # same salt, same split, same stats
    r3 = ab_test_analysis(df, "user_id", "value", salt="exp2").collect()[0]
    assert (r3.n_a, r3.n_b) != (r1.n_a, r1.n_b) or r3.mean_a != r1.mean_a
    assert r1.n_a + r1.n_b == 200  # every unit lands in exactly one arm


def test_ab_detects_planted_effect(spark):
    # arm assignment is hash-based, so plant the effect AFTER assignment
    # by deriving value from the same hash the operator uses
    base = spark.range(2000).select(F.col("id").alias("user_id"))
    armed = base.select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit("exp1"),
                                      F.col("user_id").cast("string"))),
                    1, 8), 16, 10
            ).cast("bigint") % 2
        ).alias("arm"),
    )
    df = armed.select(
        "user_id",
        F.lit(datetime.date(2024, 1, 1)).alias("ts"),
        (10.0 + F.col("arm") * 5.0 + (F.col("user_id") % 3)).alias("value"),
    )
    out = ab_test_analysis(df, "user_id", "value", salt="exp1").collect()[0]
    assert out.mean_b - out.mean_a > 4.0
    assert out.significant_95
    assert out.t_stat > 10


def test_km_survival_monotone_and_censored(spark):
    # 3 users die at day 2, one at day 5; two are active at the end
    # (censored: last event within 14 days of tmax = 2024-03-01)
    rows = []
    for u in range(3):
        rows += [(u, datetime.date(2024, 1, 1)), (u, datetime.date(2024, 1, 3))]
    rows += [(3, datetime.date(2024, 1, 1)), (3, datetime.date(2024, 1, 6))]
    rows += [(4, datetime.date(2024, 1, 1)), (4, datetime.date(2024, 3, 1))]
    rows += [(5, datetime.date(2024, 1, 1)), (5, datetime.date(2024, 2, 25))]
    df = spark.createDataFrame(rows, "user_id long, ts date")
    out = {r.t_days: r for r in
           km_survival(df, "user_id", "ts").collect()}
    assert set(out) == {2, 5}  # censored lifetimes are not event times
    assert out[2].n_risk == 6 and out[2].n_events == 3
    assert out[5].n_risk == 3 and out[5].n_events == 1
    s2, s5 = out[2].survival, out[5].survival
    assert abs(s2 - 0.5) < 1e-9  # 1 - 3/6
    assert s5 < s2  # curve never increases
    assert abs(s5 - 0.5 * (1 - 1 / 3)) < 1e-6


def test_holt_forecast_recurrence(spark):
    from recmetrics_pyspark_spark.operators.timeseries import holt_forecast

    rows = [
        ("a", datetime.date(2024, 1, d), float(d)) for d in range(1, 5)
    ] + [("b", datetime.date(2024, 1, 1), 7.0)]
    df = spark.createDataFrame(rows, "k string, ts date, v double")
    out = {r.k: r for r in
           holt_forecast(df, "k", "ts", "v", 0.5, 0.3, 3).collect()}
    # hand-rolled fold over [1,2,3,4]: level'=.5x+.5(l+t),
    # t'=.3(level'-l)+.7t  ->  (3.33875, 0.550875)
    assert abs(out["a"].level - 3.33875) < 1e-9
    assert abs(out["a"].trend - 0.550875) < 1e-9
    assert abs(out["a"].forecast_3 - (3.33875 + 3 * 0.550875)) < 1e-6
    # single observation: level = x, trend = 0, flat forecast
    assert out["b"].level == 7.0 and out["b"].trend == 0.0
    assert out["b"].forecast_3 == 7.0
    # repartitioning must not change a single bit (DECIMAL daily sums,
    # day-sorted fold)
    again = {r.k: r for r in holt_forecast(
        df.repartition(7), "k", "ts", "v", 0.5, 0.3, 3).collect()}
    assert again == out


def test_cusum_finds_planted_level_shift(spark):
    from recmetrics_pyspark_spark.operators.timeseries import (
        cusum_changepoint,
    )

    # 10 days at 1.0, then 10 days at 5.0 — CUSUM peaks at the shift
    rows = [
        ("m", datetime.date(2024, 1, 1 + d), 1.0 if d < 10 else 5.0)
        for d in range(20)
    ]
    df = spark.createDataFrame(rows, "k string, ts date, v double")
    out = cusum_changepoint(df, "k", "ts", "v").collect()[0]
    assert out.changepoint_day == datetime.date(2024, 1, 10)
    assert abs(out.mean_daily - 3.0) < 1e-9
    assert abs(out.max_abs_cusum - 20.0) < 1e-9  # 10 days × |1-3|


def test_seasonal_profile_shares_sum_to_one(spark):
    from recmetrics_pyspark_spark.operators.timeseries import (
        seasonal_profile,
    )

    rows = [
        ("k", datetime.date(2024, 1, 1 + d), float(1 + d % 7))
        for d in range(28)
    ]
    df = spark.createDataFrame(rows, "k string, ts date, v double")
    out = seasonal_profile(df, "k", "ts", "v").collect()
    assert len(out) == 7
    assert {r.iso_dow for r in out} == set(range(1, 8))
    assert all(r.n_days == 4 for r in out)
    assert abs(sum(r.dow_share for r in out) - 1.0) < 1e-5


def test_km_all_die_hits_zero(spark):
    # users 0-3: lifetime 4, uncensored (end Jan 5, tmax Mar 1);
    # sentinel 99 owns tmax with a single event → lifetime 0, censored,
    # and leaves the risk set at t=0 — so the day-4 death wipes out the
    # whole remaining at-risk set and survival hits exactly 0
    rows = [(u, datetime.date(2024, 1, 1)) for u in range(4)]
    rows += [(u, datetime.date(2024, 1, 5)) for u in range(4)]
    rows += [(99, datetime.date(2024, 3, 1))]
    df = spark.createDataFrame(rows, "user_id long, ts date")
    out = {r.t_days: r for r in km_survival(df, "user_id", "ts").collect()}
    assert set(out) == {4}
    assert out[4].n_risk == 4 and out[4].n_events == 4
    assert out[4].survival == 0.0


def test_triangle_stats_counts_known_graph(spark):
    from recmetrics_pyspark_spark.operators.graph import triangle_stats

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 5-1
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((1, 5))
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r for r in triangle_stats(df).collect()}
    for n in (2, 3, 4):
        assert out[n].n_triangles == 3
        assert out[n].degree == 3
        assert abs(out[n].clustering_coeff - 1.0) < 1e-9
    assert out[1].degree == 4 and out[1].n_triangles == 3
    assert abs(out[1].clustering_coeff - 0.5) < 1e-9  # 3/(4*3/2)
    assert out[5].n_triangles == 0 and out[5].clustering_coeff == 0.0
    # duplicate + reversed edges collapse to the same undirected set
    noisy = df.unionAll(
        spark.createDataFrame(
            [(b, a) for a, b in edges], "src long, dst long"
        )
    )
    assert {(r.node, r.n_triangles)
            for r in triangle_stats(noisy).collect()} == {
        (n, r.n_triangles) for n, r in out.items()
    }


def test_bpe_train_learns_expected_merges(spark):
    from recmetrics_pyspark_spark.functions.bpe import bpe_apply, bpe_train

    # 'abab' x3 and 'ab' x2: round 1 must merge (a,b) with count
    # 3*2+2 = 8; round 2 merges (ab,ab) from the three 'abab' words
    df = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "abab ab")], "doc_id long, text string"
    )
    merges = bpe_train(df, "text", n_merges=2).collect()
    got = {r.round: (r.pair_a, r.pair_b, r.pair_count) for r in merges}
    assert got[1] == ("a", "b", 8)
    assert got[2] == ("ab", "ab", 3)

    toks = {r.doc_id: r for r in
            bpe_apply(df, bpe_train(df, "text", n_merges=2)).collect()}
    assert toks[1].tokens == ["abab", "abab", "ab"]
    assert toks[1].n_tokens == 3
    assert toks[2].tokens == ["abab", "ab"]


def test_bpe_greedy_scan_is_leftmost_nonoverlapping(spark):
    from recmetrics_pyspark_spark.functions.bpe import bpe_apply, bpe_train

    # 'aaa': greedy leftmost gives ['aa','a'], never ['a','aa']
    df = spark.createDataFrame([(1, "aaa aaa aa")], "doc_id long, text string")
    merges = bpe_train(df, "text", n_merges=1)
    m = merges.collect()[0]
    assert (m.pair_a, m.pair_b) == ("a", "a")
    assert m.pair_count == 2 * 2 + 1  # two per 'aaa', one per 'aa'
    out = bpe_apply(df, merges).collect()[0]
    assert out.tokens == ["aa", "a", "aa", "a", "aa"]


def test_bpe_runs_dry_gracefully(spark):
    from recmetrics_pyspark_spark.functions.bpe import bpe_train

    # single-char words: no adjacent pairs, zero merge rows, any rounds
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bpe_train(df, "text", n_merges=3).count() == 0


def test_qa_token_f1_multiset_semantics(spark):
    from recmetrics_pyspark_spark.functions.evals import qa_token_f1

    df = spark.createDataFrame(
        [
            (1, "the cat sat", "the cat sat"),   # exact
            (2, "a a b", "a b b"),               # multiset: common=2
            (3, "x y", "p q"),                   # disjoint
            (4, "A  Cat", "a cat"),              # normalization
        ],
        "doc_id long, pred string, ref string",
    )
    out = {r.id: r for r in
           qa_token_f1(df, "doc_id", "pred", "ref").collect()}
    assert out[1].em and out[1].f1 == 1.0
    assert not out[2].em
    assert abs(out[2].f1 - (2 / 3)) < 1e-6  # p=r=2/3
    assert out[3].f1 == 0.0 and not out[3].em
    assert out[4].em and out[4].f1 == 1.0


def test_pass_at_k_known_values(spark):
    from recmetrics_pyspark_spark.functions.evals import pass_at_k

    df = spark.createDataFrame(
        [("t1", 2, 1), ("t2", 10, 0), ("t3", 10, 10), ("t4", 4, 1)],
        "task string, n int, c int",
    )
    out = {(r.task, r.k): r.pass_at_k
           for r in pass_at_k(df, "task", "n", "c", ks=(1, 5)).collect()}
    assert abs(out[("t1", 1)] - 0.5) < 1e-9       # 1 - C(1,1)/C(2,1)
    assert ("t1", 5) not in out                   # n < k -> no row
    assert out[("t2", 1)] == 0.0 and out[("t2", 5)] == 0.0
    assert out[("t3", 1)] == 1.0 and out[("t3", 5)] == 1.0
    # n=4, c=1, k=1: 1 - C(3,1)/C(4,1) = 1 - 3/4 = 0.25
    assert abs(out[("t4", 1)] - 0.25) < 1e-9
    # n=4, c=1, k=5 filtered (n < k)
    assert ("t4", 5) not in out


def test_trailing_anomaly_flags_planted_spike(spark):
    """A 10x spike after a flat week must be flagged; the baseline
    excludes the current day so the spike can't absorb itself; the
    first two days have no defined z and drop out."""
    import datetime as _dt

    from recmetrics_pyspark_spark.operators.timeseries import (
        trailing_window_anomaly,
    )

    rows = []
    for d in range(1, 9):  # days 1-8: values 10,11,10,11,...
        rows.append((f"m", _dt.datetime(2024, 1, d, 12), 10.0 + d % 2))
    rows.append(("m", _dt.datetime(2024, 1, 9, 12), 100.0))  # spike
    ev = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = {
        str(r.day): r
        for r in trailing_window_anomaly(
            ev, "event_type", "ts", "value"
        ).collect()
    }
    assert "2024-01-01" not in out and "2024-01-02" not in out
    spike = out["2024-01-09"]
    assert spike.is_anomaly
    assert spike.z_score > 2.0
    # flat days are not anomalous
    assert not out["2024-01-05"].is_anomaly
