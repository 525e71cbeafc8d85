"""Hand-computed fixtures for the round-5 late additions: daily ACF,
cohort LTV, A/B power (MDE), Benford audit, k-anonymity, time-decay
attribution, centroid distances, Heaps'-law fit."""

from __future__ import annotations

import datetime as _dt
import hashlib
import math


def _ts(day, hour=0, minute=0):
    return _dt.datetime(2024, 1, day, hour, minute)


def test_daily_autocorrelation_alternating_series(spark):
    from recmetrics_pyspark_spark.operators.timeseries import (
        daily_autocorrelation,
    )

    # daily counts [1, 2, 1, 2] -> ybar 1.5, dm = [-.5, .5, -.5, .5]
    # den = 1.0; acf(1) = -0.75 (3 pairs), acf(2) = 0.5, acf(3) = -0.25
    rows = []
    for day, n in [(1, 1), (2, 2), (3, 1), (4, 2)]:
        rows += [(u, _ts(day)) for u in range(n)]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r.k: r for r in daily_autocorrelation(ev).collect()}
    assert set(out) == {1, 2, 3}  # lags 4..7 have no pairs
    assert (out[1].acf, out[1].n_pairs) == (-0.75, 3)
    assert (out[2].acf, out[2].n_pairs) == (0.5, 2)
    assert (out[3].acf, out[3].n_pairs) == (-0.25, 1)


def test_cohort_ltv_cumulative_math(spark):
    from recmetrics_pyspark_spark.operators.funnel import cohort_ltv

    rows = [
        (1, _ts(1), "signup", 0.0),
        (1, _ts(2), "purchase", 10.0),   # offset 0
        (1, _ts(9), "purchase", 5.0),    # offset 1
        (2, _ts(3), "signup", 0.0),
        (2, _ts(10), "purchase", 1.0),   # offset 1
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "ts", "event_type", "value"]
    )
    out = {r.week_offset: r for r in cohort_ltv(ev).collect()}
    assert len(out) == 2  # one cohort week, offsets 0 and 1
    assert out[0].cohort_size == 2
    assert out[0].cum_revenue == 10.0 and out[0].ltv_per_user == 5.0
    assert out[1].cum_revenue == 16.0 and out[1].ltv_per_user == 8.0


def test_ab_power_mde_matches_reference_math(spark):
    from recmetrics_pyspark_spark.operators.experiment import ab_power_mde

    rows = [(u, float(u % 5 + 1)) for u in range(1, 31)]
    df = spark.createDataFrame(rows, ["unit", "val"])
    r = ab_power_mde(df, "unit", "val", salt="s2").collect()[0]

    arms = {0: [], 1: []}
    for u, v in rows:
        a = int(hashlib.md5(f"s2|{u}".encode()).hexdigest()[:8], 16) % 2
        arms[a].append(v)
    n_a, n_b = len(arms[0]), len(arms[1])
    assert (r.n_a, r.n_b) == (n_a, n_b)
    mean_a = sum(arms[0]) / n_a
    var_a = (sum(v * v for v in arms[0]) - sum(arms[0]) ** 2 / n_a) / (
        n_a - 1
    )
    var_b = (sum(v * v for v in arms[1]) - sum(arms[1]) ** 2 / n_b) / (
        n_b - 1
    )
    se9 = round(math.sqrt(var_a / n_a + var_b / n_b), 9)
    z = 1.96 + 0.841621234
    assert r.std_error == round(se9, 6)
    assert r.mde_abs == round(z * se9, 6)
    assert r.mde_rel_control == round(z * se9 / abs(round(mean_a, 9)), 6)


def test_benford_digit_extraction_and_expectation(spark):
    from recmetrics_pyspark_spark.operators.quality import benford_deviation

    df = spark.createDataFrame(
        [(1.5,), (19.0,), (23.0,), (0.5,), (911.0,)], ["amt"]
    )
    out = {r.digit: r for r in benford_deviation(df, "amt").collect()}
    assert sorted(out) == [1, 2, 5, 9]
    assert out[1].n == 2 and out[1].obs_share == 0.4
    assert out[1].exp_share == round(round(math.log10(2.0), 9), 6)
    assert out[1].abs_dev == round(
        abs(0.4 - round(round(math.log10(2.0), 9), 6)), 6
    )
    assert out[5].n == 1  # 0.5 -> first significant digit 5


def test_k_anonymity_audit_class_sizes(spark):
    from recmetrics_pyspark_spark.operators.quality import k_anonymity_audit

    df = spark.createDataFrame(
        [("US", "A"), ("US", "A"), ("US", "A"), ("DE", "B")],
        ["nation", "seg"],
    )
    r = k_anonymity_audit(df, ["nation", "seg"], k=2).collect()[0]
    assert (r.k, r.n_classes, r.n_rows) == (2, 2, 4)
    assert r.k_min == 1 and r.n_at_risk == 1 and r.risk_fraction == 0.25


def test_attribution_time_decay_weights(spark):
    import __spark_entry__ as e

    # purchase 100 at 12:00; clicks at 11:30 (w = .5) and 12:00 (w = 1)
    # -> credits 66.666667 / 33.333333; a 3h-old click gets nothing
    rows = [
        (1, 1, _ts(1, 9, 0), "click", 0.0),
        (2, 1, _ts(1, 11, 30), "click", 0.0),
        (3, 1, _ts(1, 12, 0), "click", 0.0),
        (4, 1, _ts(1, 12, 0), "purchase", 100.0),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    )

    import recmetrics_pyspark_spark  # noqa: F401 — session helpers

    # drive the query fn with a fake loader via monkeypatched sf_dir:
    # simplest is to inline the same operator logic through the entry
    # callable on a temp view-free path — so just call the private fn
    # with a stub loader
    import recmetrics_pyspark_spark.sources.io as io_mod

    orig = io_mod.load_table
    try:
        io_mod.load_table = lambda spark_, sf_dir_, name: ev
        # the entry module binds load_table at import time; patch there
        e.load_table, entry_orig = (
            lambda s, d, n: ev, e.load_table,
        )
        out = {
            r.user_id: r
            for r in e._attribution_time_decay(spark, "unused").collect()
        }
    finally:
        io_mod.load_table = orig
        e.load_table = entry_orig
    r = out[1]
    assert r.n_credited_clicks == 2
    assert r.attributed_value == 100.0


def test_centroid_distances_pythagorean(spark):
    from recmetrics_pyspark_spark.operators.similarity import (
        centroid_distances,
    )

    rows = [
        ([0.0, 0.0], 0),
        ([3.0, 4.0], 1),
        ([0.0, 0.0], 2),
        ([6.0, 8.0], 2),  # label-2 centroid = (3, 4)
    ]
    df = spark.createDataFrame(rows, ["embedding", "label"])
    out = {
        (r.label_a, r.label_b): r.dist
        for r in centroid_distances(df).collect()
    }
    assert out == {(0, 1): 5.0, (0, 2): 5.0, (1, 2): 0.0}


def test_heaps_law_points_cumulative_and_fit(spark):
    from recmetrics_pyspark_spark.functions.text import heaps_law_points

    # doc i: "t{i} common" -> bucket i holds 1 doc; cum_tokens = 2i,
    # cum_vocab = i + 1 (doc 1 introduces 2 tokens, later docs 1 each)
    docs = spark.createDataFrame(
        [(i, f"t{i} common") for i in range(1, 11)], ["doc_id", "text"]
    )
    out = sorted(heaps_law_points(docs).collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in out] == list(range(1, 11))
    assert [r.cum_tokens for r in out] == [2 * i for i in range(1, 11)]
    assert [r.cum_vocab for r in out] == [i + 1 for i in range(1, 11)]

    # mirror the operator's CENTERED OLS with pre-rounded products
    xs = [round(math.log10(2 * i), 9) for i in range(1, 11)]
    ys = [round(math.log10(i + 1), 9) for i in range(1, 11)]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum(round((x - mx) * (y - my), 9) for x, y in zip(xs, ys))
    den = sum(round((x - mx) * (x - mx), 9) for x in xs)
    assert out[0].heaps_beta == round(num / den, 6)
    assert all(r.heaps_beta == out[0].heaps_beta for r in out)
