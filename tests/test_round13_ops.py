"""Round-13 optimization pins: the mmr_rerank symmetric-sims contract
(canonical i<j pair join must be value-identical to the 2x
bidirectional-union path) and the k-core memo's convergence guard
(the memoized fixed-8 peel is served to kcore_items_converged only
when its `converged` witness is true; otherwise a real
until-converged peel runs)."""

import os

import pytest

F = pytest.importorskip("pyspark.sql.functions")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)


def test_mmr_symmetric_equals_bidir_union(spark):
    """symmetric=True over a canonical (ia < ib) similarity table is
    row-identical to the default path over its explicit 2x
    bidirectional union — including users whose candidates share no
    sims (map absent -> penalty 0) and pool-exhaustion tails."""
    from recmetrics_pyspark_spark.operators.recommend import mmr_rerank

    cands = spark.createDataFrame(
        [
            (1, 10, 1.0), (1, 11, 0.95), (1, 20, 0.6), (1, 21, 0.59),
            (2, 10, 0.8), (2, 30, 0.7),            # no sims between them
            (3, 11, 0.4),                           # single-candidate pool
        ],
        ["user_id", "item_id", "score"],
    )
    canon = spark.createDataFrame(
        [(10, 11, 0.9), (10, 20, 0.05), (11, 20, 0.05), (20, 21, 0.8)],
        ["ia", "ib", "sim"],
    )
    bidir = canon.unionByName(
        canon.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), "sim"
        )
    )
    old = sorted(map(tuple, mmr_rerank(cands, bidir, k=3, lam=0.5).collect()))
    new = sorted(
        map(
            tuple,
            mmr_rerank(cands, canon, k=3, lam=0.5, symmetric=True).collect(),
        )
    )
    assert old == new
    assert len(new) > 0


def test_kcore_converged_guard_falls_back_on_unconverged_memo(spark):
    """If the memoized fixed-8 peel did NOT converge (adversarial
    graph: a long path peels only from the ends), the declared
    until-converged query must NOT serve the superset table — it
    re-runs a real until-converged peel instead (round-12 verdict
    item 5)."""
    import __spark_entry__ as e
    from recmetrics_pyspark_spark.operators.graph import k_core_decompose

    # path graph 0-1-2-...-24 with k=2: each peel only removes the two
    # endpoints, so 8 rounds leave a non-empty superset, converged=false
    n = 25
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["ia", "ib"]
    )
    fixed8 = k_core_decompose(pairs, k=2, rounds=8)
    rows8 = fixed8.collect()
    assert rows8 and not rows8[0]["converged"]  # precondition violated

    key = (spark.sparkContext.applicationId, "<r13-kcore-guard>")
    e._KCORE_MEMO[key] = fixed8
    calls = {"n": 0}

    def fake_pairs(*a, **kw):
        calls["n"] += 1
        return pairs

    orig_inter = e.R.interactions
    orig_sims = e.M.item_similarity_pairs
    orig_k = e._KCORE_K
    e.R.interactions = lambda spark, sf: None
    e.M.item_similarity_pairs = fake_pairs
    e._KCORE_K = 2
    try:
        out = e._kcore_items_converged(spark, "<r13-kcore-guard>")
        rows = out.collect()
    finally:
        e.R.interactions = orig_inter
        e.M.item_similarity_pairs = orig_sims
        e._KCORE_K = orig_k
        e._KCORE_MEMO.pop(key, None)

    assert calls["n"] == 1  # the fallback peel actually ran
    # a 25-node path has NO 2-core: the true fixed point is empty
    assert rows == []


def test_kcore_converged_guard_serves_converged_memo(spark):
    """Happy path: a memoized table whose witness is true is served
    as-is (no rebuild)."""
    import __spark_entry__ as e
    from recmetrics_pyspark_spark.operators.graph import k_core_decompose

    # triangle: already a 2-core, converges in round 1
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], ["ia", "ib"]
    )
    memo = k_core_decompose(pairs, k=2, rounds=8)
    key = (spark.sparkContext.applicationId, "<r13-kcore-happy>")
    e._KCORE_MEMO[key] = memo

    def boom(*a, **kw):  # the fallback must NOT run
        raise AssertionError("fallback peel ran on a converged memo")

    orig_sims = e.M.item_similarity_pairs
    e.M.item_similarity_pairs = boom
    try:
        out = e._kcore_items_converged(spark, "<r13-kcore-happy>")
        rows = sorted(r["node"] for r in out.collect())
    finally:
        e.M.item_similarity_pairs = orig_sims
        e._KCORE_MEMO.pop(key, None)

    assert rows == [1, 2, 3]
