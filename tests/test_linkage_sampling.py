"""Edge-semantics tests for the round-3 late additions: negative
sampling, hard-negative mining, record linkage, incremental dedup, and
rolling-origin CV folds. The oracle-parity suite pins their values
against DuckDB; these pin the CONTRACTS (exclusions, bounds,
determinism) on handcrafted frames where violations are visible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from recmetrics_pyspark_spark.functions.curation import rolling_origin_folds
from recmetrics_pyspark_spark.operators.dedup import (
    incremental_dedup,
    record_linkage_pairs,
)
from recmetrics_pyspark_spark.operators.recommend import negative_sampling
from recmetrics_pyspark_spark.operators.similarity import hard_negative_mining


def test_negative_sampling_excludes_positives_and_bounds_k(spark):
    inter = spark.createDataFrame(
        [(u, i) for u in (1, 2, 3) for i in range(1, 40, u)],
        "user long, item long",
    )
    neg = negative_sampling(inter, k=5).collect()
    pos = {(r.user, r.item) for r in inter.collect()}
    assert neg, "sampler produced nothing"
    for r in neg:
        assert (r.user, r.neg_item) not in pos
        assert 1 <= r.rnk <= 5
    per_user = {}
    for r in neg:
        per_user.setdefault(r.user, set()).add(r.neg_item)
    for u, items in per_user.items():
        assert len(items) <= 5
    # deterministic: same plan, same draws
    again = negative_sampling(inter, k=5).collect()
    assert sorted(map(tuple, neg)) == sorted(map(tuple, again))


def test_negative_sampling_item_domain(spark):
    inter = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 20)], "user long, item long"
    )
    for r in negative_sampling(inter, k=3).collect():
        assert 1 <= r.neg_item <= 20  # domain = [1, max(item)]


def test_hard_negatives_never_share_label(spark):
    rows = [
        (i, [float(i % 3), float(i % 5), 1.0], i % 2) for i in range(20)
    ]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negative_mining(
        embs, embs.filter(F.col("vec_id") < 3), k=4
    ).collect()
    labels = {r.vec_id: r.label for r in embs.collect()}
    assert out
    for r in out:
        assert labels[r.query_id] != r.neighbor_label
        assert labels[r.neighbor_id] == r.neighbor_label
        assert r.rnk <= 4


def test_record_linkage_blocks_and_orders_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "golden lace spring", "B1"),
            (2, "golden lace sprint", "B1"),  # dist 1, same block
            (3, "golden lace spring", "B2"),  # same name, other brand
            (4, "navy rose winter", "B1"),  # other first token
        ],
        "id long, name string, brand string",
    )
    pairs = record_linkage_pairs(df, "id", "name", ["brand"], max_dist=3)
    got = {(r.id_a, r.id_b, r.edit_dist) for r in pairs.collect()}
    assert got == {(1, 2, 1)}  # cross-block and cross-token never pair


def test_incremental_dedup_statuses(spark):
    batch = spark.createDataFrame(
        [(10, "aaa"), (11, "aaa"), (12, "bbb"), (13, "ccc")],
        "doc_id long, text string",
    )
    seen = spark.createDataFrame([("bbb",)], "text string").select(
        F.md5("text").alias("content_hash")
    )
    out = {r.doc_id: r.status for r in
           incremental_dedup(batch, seen).collect()}
    assert out == {
        10: "new",
        11: "dup_in_batch",
        12: "dup_seen",
        13: "new",
    }


def test_rolling_origin_folds_never_leak_future(spark):
    import datetime

    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=d), 1.0)
        for d in range(40)
    ]
    df = spark.createDataFrame(rows, "ts date, v double")
    out = rolling_origin_folds(df, "ts", n_folds=3, value_col="v")
    got = {(r.fold, r.split): r.n_rows for r in out.collect()}
    # 4 equal slices of 10 days; fold f: train = slices < f, test = f
    assert got[(1, "train")] == 10
    assert got[(1, "test")] == 10
    assert got[(2, "train")] == 20
    assert got[(2, "test")] == 10
    assert got[(3, "train")] == 30
    assert got[(3, "test")] == 10
    # train set grows monotonically with the fold (forward chaining)
    assert got[(1, "train")] < got[(2, "train")] < got[(3, "train")]
