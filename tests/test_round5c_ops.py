"""Hand-computed fixtures for the round-5 third batch: k-core peeling,
corpus entropy rates, seasonal decomposition, PQ distortion, shipping
SLA compliance."""

from __future__ import annotations

import datetime as _dt
import math


def test_kcore_triangle_sheds_tail(spark):
    from recmetrics_pyspark_spark.operators.graph import k_core_decompose

    # triangle 1-2-3 with a tail 3-4: the 2-core is the triangle
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["ia", "ib"]
    )
    out = {
        r.node: r.degree
        for r in k_core_decompose(pairs, k=2, rounds=4).collect()
    }
    assert out == {1: 2, 2: 2, 3: 2}
    # the 3-core is empty (triangle degrees are 2 after the tail peels)
    assert k_core_decompose(pairs, k=3, rounds=4).collect() == []


def test_corpus_entropy_rates_hand_computed(spark):
    from recmetrics_pyspark_spark.functions.text import (
        corpus_entropy_rates,
    )

    docs = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    r = corpus_entropy_rates(docs).collect()[0]
    assert r.n_tokens == 4 and r.n_unigrams == 2 and r.n_bigrams == 2
    assert r.h_unigram == 1.0  # uniform over {a, b}
    # bigrams: (a,b) x2, (b,a) x1 over 3
    c1 = round(-(2 / 3) * math.log2(2 / 3), 9)
    c2 = round(-(1 / 3) * math.log2(1 / 3), 9)
    hb = round(c1 + c2, 6)
    assert r.h_bigram == hb
    assert r.h_cond == round(c1 + c2 - 1.0, 6)


def test_seasonal_decompose_flat_series_with_spike(spark):
    from recmetrics_pyspark_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )

    # constant 10/day for 9 days, +7 spike on day 5: the full 7-day
    # frame exists for days 4..6, each with trend 11; the spike's
    # detrended +6 (and the flanks' -1) land entirely in the seasonal
    # term (each dow appears once), so residuals are exactly 0
    rows = []
    for day in range(1, 10):
        v = 17.0 if day == 5 else 10.0
        rows.append((_dt.datetime(2024, 1, day), v))
    ev = spark.createDataFrame(rows, ["ts", "value"])
    out = {r.day: r for r in seasonal_decompose_daily(ev).collect()}
    assert sorted(out) == [f"2024-01-0{d}" for d in (4, 5, 6)]
    spike = out["2024-01-05"]
    assert spike.value == 17.0 and spike.trend == 11.0
    assert spike.seasonal == 6.0 and spike.residual == 0.0
    flank = out["2024-01-04"]
    assert flank.trend == 11.0 and flank.seasonal == -1.0
    assert flank.residual == 0.0


def test_pq_distortion_zero_when_codes_cover_corpus(spark):
    from recmetrics_pyspark_spark.operators.similarity import pq_distortion

    # 16 distinct vectors, 16 codes: every vector is its own seed and
    # stays its own centroid -> reconstruction error exactly 0
    rows = [
        (i, [float(i + j) for j in range(8)]) for i in range(16)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = pq_distortion(df, m=2, k_codes=16).collect()
    assert [r.sub for r in out] == [0, 1]
    for r in out:
        assert r.n_vectors == 16
        assert r.mse == 0.0 and r.max_sq_err == 0.0


def test_shipping_sla_lag_math(spark):
    import __spark_entry__ as e

    orders = spark.createDataFrame(
        [(1, "1-URGENT", _dt.date(2024, 1, 1))],
        ["o_orderkey", "o_orderpriority", "o_orderdate"],
    )
    li = spark.createDataFrame(
        [(1, _dt.date(2024, 1, 3)), (1, _dt.date(2024, 1, 20))],
        ["l_orderkey", "l_shipdate"],
    )
    tables = {"orders": orders, "lineitem": li}
    entry_orig = e.load_table
    try:
        e.load_table = lambda s, d, n: tables[n]
        r = e._shipping_sla_compliance(spark, "unused").collect()[0]
    finally:
        e.load_table = entry_orig
    assert r.n_lines == 2
    assert r.pct_within_7d == 0.5  # lags 2 and 19
    assert r.avg_lag_days == 10.5
    assert r.p90_lag_days == 2 + 0.9 * 17  # interpolated percentile
