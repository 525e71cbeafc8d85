"""Hand-computed fixtures for the round-5 operators: user behavior
entropy, UCB1 arm stats, OLS trend slopes, prefix dedup, first-seen
n-gram novelty, repurchase cadence."""

from __future__ import annotations

import datetime as _dt
import hashlib
import math


def d(day):
    return _dt.date(2024, 1, day)


def test_user_behavior_entropy_hand_computed(spark):
    from recmetrics_pyspark_spark.operators.metrics import (
        user_behavior_entropy,
    )

    rows = [
        # u1: A,A,B,B -> H = 1.0, norm = 1.0
        (1, "A"), (1, "A"), (1, "B"), (1, "B"),
        # u2: A x3 -> H = 0, single item -> norm NULL
        (2, "A"), (2, "A"), (2, "A"),
        # u3: 4 distinct once each -> H = 2.0, norm = 1.0
        (3, "A"), (3, "B"), (3, "C"), (3, "D"),
    ]
    df = spark.createDataFrame(rows, ["user", "item"])
    out = user_behavior_entropy(df, k=10).collect()
    assert [(r.user, r.rnk) for r in out] == [(3, 1), (1, 2), (2, 3)]
    by_user = {r.user: r for r in out}
    assert by_user[3].entropy == 2.0 and by_user[3].norm_entropy == 1.0
    assert by_user[1].entropy == 1.0 and by_user[1].norm_entropy == 1.0
    assert by_user[1].n_events == 4 and by_user[1].n_items == 2
    assert by_user[2].entropy == 0.0 and by_user[2].norm_entropy is None


def test_ucb_arm_stats_matches_reference_math(spark):
    from recmetrics_pyspark_spark.operators.experiment import ucb_arm_stats

    rows = [(u, float(u % 7)) for u in range(1, 41)]
    df = spark.createDataFrame(rows, ["unit", "reward"])
    out = {r.arm: r for r in ucb_arm_stats(
        df, "unit", "reward", salt="s1", n_arms=4
    ).collect()}

    # reference arm assignment + UCB1 math in plain Python
    arms = {}
    for u, v in rows:
        a = int(hashlib.md5(f"s1|{u}".encode()).hexdigest()[:8], 16) % 4
        arms.setdefault(a, []).append(v)
    n_total = len(rows)
    for a, vals in arms.items():
        r = out[a]
        assert r.n_pulls == len(vals)
        assert r.n_total == n_total
        mean9 = round(sum(vals) / len(vals), 9)
        assert r.mean_reward == round(mean9, 6)
        bonus9 = round(
            math.sqrt(2.0 * math.log(n_total) / len(vals)), 9
        )
        assert r.ucb1 == round(mean9 + bonus9, 6)
        assert r.ucb1 > r.mean_reward
    assert sum(r.n_pulls for r in out.values()) == n_total


def test_trend_slope_hand_computed(spark):
    from recmetrics_pyspark_spark.operators.timeseries import (
        trend_slope_topk,
    )

    rows = (
        # X: counts 1,2,3 on days 1,2,3 -> slope 1.0
        [("X", d(1))] * 1 + [("X", d(2))] * 2 + [("X", d(3))] * 3
        # Y: counts 5 on day 1, 1 on day 3 -> slope -2.0
        + [("Y", d(1))] * 5 + [("Y", d(3))] * 1
        # Z: single day -> NULL slope, dropped
        + [("Z", d(2))] * 4
    )
    df = spark.createDataFrame(rows, ["key", "dt"])
    out = trend_slope_topk(df, "key", "dt", k=10).collect()
    assert [(r.key, r.slope, r.rnk) for r in out] == [
        ("X", 1.0, 1),
        ("Y", -2.0, 2),
    ]
    by = {r.key: r for r in out}
    assert by["X"].n_days == 3 and by["X"].n_events == 6
    assert by["Y"].n_days == 2 and by["Y"].n_events == 6


def test_prefix_dedup_groups_and_sources(spark):
    from recmetrics_pyspark_spark.operators.dedup import prefix_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d then it diverges wildly", "s1"),
            (2, "a b c d completely other tail", "s2"),
            (3, "q w e r t unrelated text", "s1"),
            # shorter than k_tokens: whole text is the prefix
            (4, "a b", "s1"),
            (5, "a b", "s1"),
        ],
        ["doc_id", "text", "source"],
    )
    out = prefix_dedup(docs, k_tokens=4).collect()
    assert len(out) == 2
    by_keeper = {r.keeper: r for r in out}
    g1 = by_keeper[1]  # docs 1,2 share "a b c d"
    assert g1.n_docs == 2 and g1.n_sources == 2
    g4 = by_keeper[4]  # docs 4,5 share the short prefix "a b"
    assert g4.n_docs == 2 and g4.n_sources == 1
    assert {r.rnk for r in out} == {1, 2}


def test_ngram_novelty_first_seen_credit(spark):
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_novelty_by_source,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),  # introduces both shingles -> 1.0
            (2, "a b c d", "s2"),  # exact dup, all seen -> 0.0
            (3, "a b c x", "s2"),  # one of two new -> 0.5
        ],
        ["doc_id", "text", "source"],
    )
    out = {r.source: r for r in ngram_novelty_by_source(docs).collect()}
    assert out["s1"].n_docs == 1 and out["s1"].avg_novelty == 1.0
    assert out["s2"].n_docs == 2 and out["s2"].avg_novelty == 0.25


def test_repurchase_intervals_gaps_and_median(spark):
    from recmetrics_pyspark_spark.operators.funnel import (
        repurchase_intervals,
    )

    rows = [
        # itemA gaps: u1 -> 2, 3; u2 -> 1
        (1, "A", d(1)), (1, "A", d(3)), (1, "A", d(6)),
        (2, "A", d(10)), (2, "A", d(11)),
        # itemB: same-day duplicates collapse -> no gap, absent
        (1, "B", d(5)), (1, "B", d(5)),
    ]
    df = spark.createDataFrame(rows, ["user", "item", "dt"])
    out = repurchase_intervals(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.item == "A" and r.n_repurchases == 3 and r.rnk == 1
    assert r.avg_gap_days == 2.0
    assert r.median_gap_days == 2.0
