"""Hand-computed fixtures for the round-5 fourth batch: JS source
divergence, session summary, degree distribution, GMV MTD report,
catalog freshness, LSH parameter planner."""

from __future__ import annotations

import datetime as _dt
import math


def test_source_divergence_symmetric_and_zero(spark):
    from recmetrics_pyspark_spark.functions.curation import (
        source_divergence,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a", "s1"),
            (2, "b b", "s2"),
            (3, "a a", "s3"),  # identical distribution to s1
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        (r.source_a, r.source_b): r.js_divergence
        for r in source_divergence(docs).collect()
    }
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert out[("s1", "s3")] == 0.0  # identical smoothed distributions

    # mirror: V=2, N=2 per source -> P1 = (.75, .25), P2 = (.25, .75)
    def js(p, q):
        tot = 0.0
        for pa, pb in zip(p, q):
            m = (pa + pb) / 2
            tot += round(
                0.5 * pa * math.log2(pa / m) + 0.5 * pb * math.log2(pb / m),
                9,
            )
        return round(tot, 6)

    expect = js([0.75, 0.25], [0.25, 0.75])
    assert out[("s1", "s2")] == expect == out[("s2", "s3")]
    assert 0.0 < expect < 1.0


def test_session_summary_counts_and_bounce(spark):
    from recmetrics_pyspark_spark.operators.funnel import session_summary

    t0 = _dt.datetime(2024, 1, 1, 12, 0)

    def mins(m):
        return t0 + _dt.timedelta(minutes=m)

    rows = [
        (1, mins(0)), (1, mins(10)),   # session 1: 2 events, 600 s
        (1, mins(50)),                  # >30 min gap -> session 2
        (2, mins(5)),                   # session 3: single event
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    r = session_summary(ev).collect()[0]
    assert r.n_sessions == 3
    assert r.avg_events_per_session == round(4 / 3, 6)
    assert r.bounce_rate == round(2 / 3, 6)
    assert r.avg_duration_sec == 200.0
    assert r.median_duration_sec == 0.0


def test_degree_distribution_histogram_and_alpha(spark):
    from recmetrics_pyspark_spark.operators.graph import degree_distribution

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["ia", "ib"]
    )
    out = sorted(
        degree_distribution(pairs).collect(), key=lambda r: r.degree
    )
    assert [(r.degree, r.n_nodes) for r in out] == [(1, 1), (2, 2), (3, 1)]

    xs = [round(math.log10(d), 9) for d in (1, 2, 3)]
    ys = [round(math.log10(n), 9) for n in (1, 2, 1)]
    mx, my = sum(xs) / 3, sum(ys) / 3
    num = sum(round((x - mx) * (y - my), 9) for x, y in zip(xs, ys))
    den = sum(round((x - mx) * (x - mx), 9) for x in xs)
    assert out[0].powerlaw_alpha == round(num / den, 6)


def test_gmv_mtd_running_totals_and_mom(spark):
    from recmetrics_pyspark_spark.operators.timeseries import gmv_mtd_report

    rows = [
        (_dt.date(2024, 1, 5), 100.0),
        (_dt.date(2024, 1, 6), 50.0),
        (_dt.date(2024, 2, 5), 200.0),
    ]
    orders = spark.createDataFrame(rows, ["o_orderdate", "o_totalprice"])
    out = {r.day: r for r in gmv_mtd_report(orders).collect()}
    assert out["2024-01-05"].mtd_gmv == 100.0
    assert out["2024-01-06"].mtd_gmv == 150.0
    assert out["2024-02-05"].mtd_gmv == 200.0
    assert out["2024-02-05"].mom_ratio == 2.0  # 200 vs Jan 5's 100
    assert out["2024-01-05"].mom_ratio is None


def test_catalog_freshness_new_item_share(spark):
    from recmetrics_pyspark_spark.operators.recommend import (
        catalog_freshness,
    )

    # week 1 (Jan 1 2024 is a Monday): A twice; week 2: A and B
    rows = [
        ("A", _dt.date(2024, 1, 1)),
        ("A", _dt.date(2024, 1, 2)),
        ("A", _dt.date(2024, 1, 8)),
        ("B", _dt.date(2024, 1, 9)),
    ]
    df = spark.createDataFrame(rows, ["item", "dt"])
    out = {r.week: r for r in catalog_freshness(df).collect()}
    assert out["2024-01-01"].n_interactions == 2
    assert out["2024-01-01"].new_item_share == 1.0
    assert out["2024-01-08"].n_interactions == 2
    assert out["2024-01-08"].n_new_item_interactions == 1
    assert out["2024-01-08"].new_item_share == 0.5


def test_lsh_parameter_plan_s_curve(spark):
    from recmetrics_pyspark_spark.operators.dedup import lsh_parameter_plan

    out = {
        (r.bands, r.rows_per_band): r
        for r in lsh_parameter_plan(spark).collect()
    }
    assert len(out) == 12
    r16x4 = out[(16, 4)]
    assert r16x4.approx_threshold == 0.5  # (1/16)^(1/4)
    expect = round(round(1.0 - (1.0 - 0.5 ** 4) ** 16, 9), 6)
    assert r16x4.p_at_s50 == expect
    # capture probability increases with bands at fixed s and r
    assert out[(32, 4)].p_at_s80 > out[(4, 4)].p_at_s80
    # and decreases with rows per band at fixed bands
    assert out[(8, 2)].p_at_s50 > out[(8, 8)].p_at_s50


def test_user_lifecycle_stages_accounting(spark):
    from recmetrics_pyspark_spark.operators.funnel import (
        user_lifecycle_stages,
    )

    def wk(week, day=0):  # week 1 starts Mon 2024-01-01
        return _dt.datetime(2024, 1, 1 + (week - 1) * 7 + day)

    rows = [
        (1, wk(1)), (1, wk(2)), (1, wk(3)),   # always active
        (2, wk(1)), (2, wk(3)),               # skips week 2
        (3, wk(2)),                            # week-2 one-off
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r.week: r for r in user_lifecycle_stages(ev).collect()}
    w1, w2, w3 = "2024-01-01", "2024-01-08", "2024-01-15"
    assert (out[w1].n_new, out[w1].n_retained, out[w1].n_resurrected,
            out[w1].n_churned) == (2, 0, 0, 0)
    assert (out[w2].n_new, out[w2].n_retained, out[w2].n_resurrected,
            out[w2].n_churned) == (1, 1, 0, 1)
    assert (out[w3].n_new, out[w3].n_retained, out[w3].n_resurrected,
            out[w3].n_churned) == (0, 1, 1, 1)


def test_revenue_concentration_pareto(spark):
    from recmetrics_pyspark_spark.operators.funnel import (
        revenue_concentration,
    )

    orders = spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, 30.0), (4, 20.0)],
        ["o_custkey", "o_totalprice"],
    )
    out = {
        r.top_fraction: r for r in revenue_concentration(orders).collect()
    }
    # interpolated 99th pct of [20,30,50,100] is 98.5 -> only the 100
    r01 = out[0.01]
    assert r01.n_customers == 1 and r01.revenue_share == 0.5
    # 50th pct is 40 -> {50, 100} hold 150/200
    r50 = out[0.5]
    assert r50.n_customers == 2 and r50.revenue_share == 0.75


def test_embedding_outliers_distance_ranking(spark):
    from recmetrics_pyspark_spark.operators.similarity import (
        embedding_outliers,
    )

    rows = [
        (1, [0.0, 0.0]),
        (2, [0.0, 0.0]),
        (3, [0.0, 0.0]),
        (4, [4.0, 0.0]),  # centroid (1, 0): dist 3 vs 1 for the rest
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = embedding_outliers(df, k=4).collect()
    assert [(r.vec_id, r.dist_to_centroid, r.rnk) for r in out] == [
        (4, 3.0, 1),
        (1, 1.0, 2),
        (2, 1.0, 3),
        (3, 1.0, 4),
    ]


def test_user_lifecycle_interior_dead_week_emits_churn_row(spark):
    from recmetrics_pyspark_spark.operators.funnel import (
        user_lifecycle_stages,
    )

    # active week 1, NOBODY active week 2, returns week 3: the dead
    # week must still emit its churn row so the growth identity
    # (new + retained + resurrected - churned = WoW delta) holds
    rows = [
        (1, _dt.datetime(2024, 1, 1)),
        (1, _dt.datetime(2024, 1, 15)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r.week: r for r in user_lifecycle_stages(ev).collect()}
    assert sorted(out) == ["2024-01-01", "2024-01-08", "2024-01-15"]
    dead = out["2024-01-08"]
    assert (dead.n_new, dead.n_retained, dead.n_resurrected,
            dead.n_churned) == (0, 0, 0, 1)
    back = out["2024-01-15"]
    assert back.n_resurrected == 1 and back.n_churned == 0
