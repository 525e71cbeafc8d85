"""Degenerate-input regression tests: legitimate edge corpora
(constant values, zero totals, single-point fits, metrics that never
moved) must yield NULL/empty results, not ANSI divide-by-zero crashes.
Each case here crashed before the round-6 try_divide sweep.

All four go through .collect() deliberately — .count() lets Catalyst
prune the very projection that divides, hiding the crash.
"""

from __future__ import annotations

import datetime as _dt

_B = _dt.datetime(2024, 3, 4)


def test_mad_outlier_constant_corpus_returns_empty(spark):
    from recmetrics_pyspark_spark.functions.curation import (
        mad_outlier_docs,
    )

    df = spark.createDataFrame(
        [(i, "a b c") for i in range(6)], ["doc_id", "text"]
    )
    assert mad_outlier_docs(df).collect() == []  # MAD 0 → no outliers


def test_zipf_fit_single_point_null_slope(spark):
    from recmetrics_pyspark_spark.functions.curation import zipf_fit

    df = spark.createDataFrame(
        [(i, "a a a a") for i in range(4)], ["doc_id", "text"]
    )
    r = zipf_fit(df, min_count=1).collect()[0]
    assert r.n_tokens_fit == 1
    assert r.zipf_slope is None and r.zipf_intercept is None


def test_seasonal_profile_zero_series_null_shares(spark):
    from recmetrics_pyspark_spark.operators.timeseries import (
        seasonal_profile,
    )

    df = spark.createDataFrame(
        [("k", _B + _dt.timedelta(days=d), 0.0) for d in range(14)],
        ["key", "ts", "value"],
    )
    out = seasonal_profile(df, "key", "ts", "value").collect()
    assert len(out) == 7
    for r in out:
        assert r.mean_daily_value == 0.0 and r.dow_share is None


def test_ab_test_zero_variance_null_t(spark):
    from recmetrics_pyspark_spark.operators.experiment import (
        ab_test_analysis,
    )

    df = spark.createDataFrame(
        [(f"u{i}", 3.0) for i in range(40)], ["unit", "metric"]
    )
    r = ab_test_analysis(df, "unit", "metric").collect()[0]
    assert r.mean_a == r.mean_b == 3.0
    assert r.t_stat is None and r.significant_95 is None


def test_psi_constant_feed_zero(spark):
    from recmetrics_pyspark_spark.operators.quality import psi_drift

    df = spark.createDataFrame(
        [
            ("g", 0.0, _B),
            ("g", 0.0, _B + _dt.timedelta(days=10)),
        ],
        ["event_type", "value", "ts"],
    )
    out = psi_drift(df).collect()
    assert len(out) == 1 and out[0].psi == 0.0


def test_intra_list_zero_vector_item_contributes_zero(spark):
    from recmetrics_pyspark_spark.operators.metrics import (
        intra_list_similarity,
    )

    rows = [
        ("u1", 1, "a", 1.0), ("u1", 1, "b", 2.0),
        ("u1", 2, "a", 0.0), ("u1", 2, "b", 0.0),  # zero vector
        ("u1", 3, "a", 1.0),
    ]
    df = spark.createDataFrame(
        rows, ["person", "product", "category", "rating"]
    )
    out = intra_list_similarity(df).collect()
    assert len(out) == 1
    # pairs (1,3) share feature a: cos = (1/sqrt(5))·1; pairs with the
    # zero-vector item contribute 0; mean over C(3,2)=3 pairs
    assert abs(out[0].intra_list_similarity - round((1 / 5**0.5) / 3, 6)) < 1e-6


def test_stratified_metrics_equal_length_strata_null_z(spark):
    from recmetrics_pyspark_spark.functions.curation import (
        stratified_metrics,
    )

    df = spark.createDataFrame(
        [(1, "abc", "en"), (2, "xyz", "fr")],  # identical mean lengths
        ["doc_id", "text", "lang"],
    )
    out = stratified_metrics(df).collect()
    assert len(out) == 2
    for r in out:
        assert r.len_zscore is None  # sigma 0 → z undefined


def test_mad_outlier_meanad_fallback_catches_boilerplate_outlier(spark):
    """MAD = 0 because >=50% of docs share the median length — the
    MeanAD fallback must still flag the genuine extreme outlier
    instead of silently returning empty."""
    from recmetrics_pyspark_spark.functions.curation import (
        mad_outlier_docs,
    )

    rows = [(i, "a b c") for i in range(5)]  # 5 boilerplate docs, 3 toks
    rows.append((9, " ".join(f"t{j}" for j in range(500))))  # outlier
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = mad_outlier_docs(df).collect()
    assert [r.doc_id for r in out] == [9]
    # (n - med) / (1.2533 * meanad): med=3, ads=[0]*5+[497], meanad=497/6
    expect = round((500 - 3) / (1.2533 * (497 / 6)), 6)
    assert abs(out[0].mod_zscore - expect) < 1e-6


def test_psi_detects_shift_from_constant_baseline(spark):
    """The zero-width branch separates shifted mass: a feed that was
    constant in the first half and jumped in the second must alert,
    not silently share one bin with the baseline."""
    from recmetrics_pyspark_spark.operators.quality import psi_drift

    rows = [("g", 0.0, _B + _dt.timedelta(seconds=s)) for s in range(6)]
    rows += [
        ("g", 0.0, _B + _dt.timedelta(days=10, seconds=s))
        for s in range(6)
    ]
    # NOTE global v_lo == v_hi == 0.0 → degenerate range on BOTH sides
    # (equal half sizes: Laplace smoothing is share-neutral then)
    df = spark.createDataFrame(rows, ["event_type", "value", "ts"])
    out = psi_drift(df).collect()
    assert out[0].psi == 0.0  # same constant both halves: stable

    rows2 = [("g", 0.0, _B + _dt.timedelta(seconds=s)) for s in range(6)]
    rows2 += [
        ("g", 500.0, _B + _dt.timedelta(days=10, seconds=s))
        for s in range(6)
    ]
    df2 = spark.createDataFrame(rows2, ["event_type", "value", "ts"])
    out2 = psi_drift(df2).collect()
    assert out2[0].psi > 0.5  # total shift: loudly unstable


def test_ab_test_single_unit_arm_null_t(spark):
    """An arm with exactly one unit has undefined sample variance —
    t goes NULL instead of an ANSI crash."""
    from recmetrics_pyspark_spark.operators.experiment import (
        ab_test_analysis,
    )

    # u3 hashes to arm 0 alone under the exp1 salt; u0/u1/u2 to arm 1
    df = spark.createDataFrame(
        [(f"u{i}", float(i)) for i in range(4)], ["unit", "metric"]
    )
    out = ab_test_analysis(df, "unit", "metric").collect()[0]
    assert 1 in (out.n_a, out.n_b)
    assert out.t_stat is None and out.significant_95 is None
