"""Round-10 additions: the IVF-routed semantic decontamination lane,
the quantized-lane recall report, the composed selection/mixture
pipeline handoffs, the line_dedup min_df sensitivity row, and the
round-9-advice hardening (distributed AUC prefix sum, ANN null
guards, calibration clamp, NB NULL-text conservation)."""

import math

import pytest

F = pytest.importorskip("pyspark.sql.functions")


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


# ---------------------------------------------------------------------------
# semantic_decontaminate_ivf
# ---------------------------------------------------------------------------


def _clustered_vectors():
    """Two tight clusters + one outlier pair, ids arranged so the
    deterministic seeds (vec_id < n_cells) straddle both clusters."""
    rows = []
    # cluster A around (1, 0, 0, 0); cluster B around (0, 1, 0, 0)
    for i in range(20):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        jitter = 0.01 * (i % 5)
        rows.append((i, [base[0] + jitter, base[1] + jitter, 0.0, 0.1]))
    return rows


def test_ivf_decontamination_is_subset_of_broadcast(spark):
    """Every train vector the IVF router flags is also flagged by the
    broadcast path with the SAME best match (the router only bounds
    candidates, never scores differently), and at nprobe = n_cells
    the two paths agree exactly."""
    from recmetrics_pyspark_spark.operators.similarity import (
        semantic_decontaminate,
        semantic_decontaminate_ivf,
    )

    vecs = _vec_df(spark, _clustered_vectors())
    train = vecs.filter(F.col("vec_id") >= 8)
    ev = vecs.filter(F.col("vec_id") < 8)
    full = {
        r.train_id: r
        for r in semantic_decontaminate(train, ev, threshold=0.9).collect()
    }
    routed = {
        r.train_id: r
        for r in semantic_decontaminate_ivf(
            train, ev, threshold=0.9, n_cells=4, nprobe=2,
            quantizer=vecs,
        ).collect()
    }
    assert set(routed) <= set(full)
    for tid, r in routed.items():
        assert r.best_cos <= full[tid].best_cos
        assert r.n_eval_hits <= full[tid].n_eval_hits
    exhaustive = {
        r.train_id: r
        for r in semantic_decontaminate_ivf(
            train, ev, threshold=0.9, n_cells=4, nprobe=4,
            quantizer=vecs,
        ).collect()
    }
    assert set(exhaustive) == set(full)
    for tid, r in exhaustive.items():
        assert r.best_eval_id == full[tid].best_eval_id
        assert r.best_cos == full[tid].best_cos
        assert r.n_eval_hits == full[tid].n_eval_hits


def test_ivf_decontamination_recall_on_testdata(spark):
    """On the declared query's own split (sf0.001 embeddings,
    threshold 0.4, 8 cells / nprobe 3) the router keeps a usable
    fraction of the broadcast path's flags and invents none."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    full = {
        r.train_id
        for r in e.queries()["semantic_decontaminate"](spark, sf).collect()
    }
    routed = {
        r.train_id
        for r in e.queries()["semantic_decontaminate_ivf"](
            spark, sf
        ).collect()
    }
    assert routed <= full
    assert len(routed) >= 0.5 * len(full)


# ---------------------------------------------------------------------------
# sq_recall_report
# ---------------------------------------------------------------------------


def test_sq_recall_report_lanes_and_bounds(spark):
    """One row per (lane, query); recall in [0, 1]; the SQ8 lane is
    near-lossless on the test corpus (recall@10 >= 0.9 per query, the
    docstring's measured claim)."""
    import __spark_entry__ as e

    rows = e.queries()["sq_recall_report"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    lanes = {r.lane for r in rows}
    assert lanes == {"sq8", "ivfsq8"}
    seen = set()
    for r in rows:
        assert (r.lane, r.query_id) not in seen
        seen.add((r.lane, r.query_id))
        assert r.n_exact == 10
        assert 0 <= r.n_hit <= r.n_exact
        assert 0.0 <= r.recall_at_10 <= 1.0
        if r.lane == "sq8":
            assert r.recall_at_10 >= 0.9


# ---------------------------------------------------------------------------
# data_mixture_pipeline stage handoffs
# ---------------------------------------------------------------------------


def test_data_mixture_pipeline_handoffs(spark):
    """The composed allocator's invariants: weighted mass never
    exceeds the raw inventory (weights <= 1), temperature weights sum
    to ~1, allocations sum to <= budget (floor loses < n_sources
    tokens), and the equal-weight twin matches budget DIV sources."""
    import __spark_entry__ as e

    rows = e.queries()["data_mixture_pipeline"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 1
    budget = 10_000_000
    wsum = sum(r.weight for r in rows)
    asum = sum(r.allocated_tokens for r in rows)
    eq = budget // len(rows)
    for r in rows:
        assert r.eff_tokens <= r.n_tokens
        assert r.eff_tokens > 0
        assert r.equal_allocated_tokens == eq
        assert r.allocated_tokens <= budget
        # sample_rate is the capped epochs
        assert r.sample_rate == min(1.0, r.epochs)
    assert math.isclose(wsum, 1.0, abs_tol=1e-5)
    assert budget - len(rows) < asum <= budget


def test_data_mixture_weights_flatten_shares(spark):
    """T = 0.7 flattens: sources above the mean natural share get a
    temperature weight BELOW their natural share, sources below get
    one above (the defining property of temperature mixing)."""
    import __spark_entry__ as e

    rows = e.queries()["data_mixture_pipeline"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r.natural_share > mean_share + 1e-9:
            assert r.weight < r.natural_share
        elif r.natural_share < mean_share - 1e-9:
            assert r.weight > r.natural_share


# ---------------------------------------------------------------------------
# line_dedup min_df sensitivity
# ---------------------------------------------------------------------------


def test_line_dedup_min_df_monotone(spark):
    """Raising min_df only ever KEEPS more lines: a line dropped at
    min_df=3 is dropped at min_df=2, never the other way."""
    from recmetrics_pyspark_spark.operators.dedup import line_dedup

    pages = spark.createDataFrame(
        [
            (1, "shared line\nunique one"),
            (2, "shared line\nunique two"),
            (3, "shared line\nunique three"),
            (4, "pair line\nunique four"),
            (5, "pair line\nunique five"),
        ],
        ["doc_id", "text"],
    )
    k2 = {
        r.doc_id: r.n_lines_kept
        for r in line_dedup(pages, min_df=2, mode="keep_first").collect()
    }
    k3 = {
        r.doc_id: r.n_lines_kept
        for r in line_dedup(pages, min_df=3, mode="keep_first").collect()
    }
    for d in k2:
        assert k3[d] >= k2[d]
    # df-3 "shared line" dedups under BOTH; df-2 "pair line" only
    # under min_df=2 (doc 5 loses it there, keeps it at min_df=3)
    assert k2[5] == 1 and k3[5] == 2
    assert k2[2] == 1 and k3[2] == 1


# ---------------------------------------------------------------------------
# round-9 advice hardening
# ---------------------------------------------------------------------------


def test_classifier_eval_bucketed_auc_matches_naive(spark):
    """The two-level prefix-sum AUC equals a naive driver-side
    Mann-Whitney computation, including tie handling, across bucket
    counts (1 bucket = everything in one partition window; 1024 =
    the default)."""
    from recmetrics_pyspark_spark.functions.evals import classifier_eval

    rows = []
    # deterministic pseudo-random scores with heavy ties
    for i in range(400):
        s = ((i * 2654435761) % 97) / 10.0 - 4.0
        y = 1 if ((i * 40503) % 100) < (30 + 4 * s) else 0
        rows.append((y, s))
    df = spark.createDataFrame(rows, ["y", "s"])

    # naive reference: average ranks
    import collections

    by_score = collections.Counter(s for _, s in rows)
    order = sorted(by_score)
    cum = 0
    avg_rank = {}
    for s in order:
        n = by_score[s]
        avg_rank[s] = cum + (n + 1) / 2.0
        cum += n
    n_pos = sum(y for y, _ in rows)
    n_neg = len(rows) - n_pos
    rank_sum = sum(avg_rank[s] for y, s in rows if y == 1)
    want_auc = round(
        (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6
    )

    for nb in (1, 7, 1024):
        got = classifier_eval(df, "y", "s", score_buckets=nb).collect()[0]
        assert got.auc == want_auc
        assert got.n_pos == n_pos and got.n_neg == n_neg


def test_classifier_eval_constant_scores_auc_half(spark):
    """All-constant scorer: degenerate range lands every score in
    bucket 0 and ties give AUC exactly 0.5."""
    from recmetrics_pyspark_spark.functions.evals import classifier_eval

    df = spark.createDataFrame(
        [(1, 3.3)] * 5 + [(0, 3.3)] * 7, ["y", "s"]
    )
    got = classifier_eval(df, "y", "s").collect()[0]
    assert got.auc == 0.5


def test_calibration_bins_clamps_out_of_range(spark):
    """p < 0 clamps into bin 0 and p > 1 into the top bin — no
    negative bin ids, row mass conserved."""
    from recmetrics_pyspark_spark.functions.evals import calibration_bins

    df = spark.createDataFrame(
        [(1, -0.25), (0, -0.01), (1, 0.55), (0, 1.25)], ["y", "p"]
    )
    rows = {r.bin: r for r in calibration_bins(df, "y", "p").collect()}
    assert set(rows) == {0, 5, 9}
    assert rows[0].n == 2 and rows[9].n == 1
    assert sum(r.n for r in rows.values()) == 4
    assert all(r.bin >= 0 for r in rows.values())


def test_nb_null_text_rows_conserved(spark):
    """NULL-text documents survive scoring with NULL scores (loud
    NULL) in both the one-pass classifier and the train/score split;
    non-NULL rows score exactly as before."""
    from recmetrics_pyspark_spark.functions.curation import (
        nb_quality_classifier,
        nb_score,
        nb_train,
    )

    df = spark.createDataFrame(
        [
            (1, 1, "good clean prose here"),
            (2, 0, "spam spam spam buy now"),
            (3, 1, None),
            (4, 0, "more spam text spam"),
            (5, 1, "clean good text prose"),
        ],
        ["doc_id", "y", "text"],
    )
    out = {r.doc_id: r for r in nb_quality_classifier(df, "y").collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[3].nb_log_odds is None
    assert out[3].predicted_pos is None
    assert out[3].is_labeled_pos == 1
    assert out[1].nb_log_odds is not None

    model = nb_train(df.filter(F.col("text").isNotNull()), "y")
    scored = {r.doc_id: r for r in nb_score(model, df).collect()}
    assert set(scored) == {1, 2, 3, 4, 5}
    assert scored[3].nb_log_odds is None
    assert scored[3].n_tokens is None
    assert scored[1].nb_log_odds is not None


def test_ann_zero_norm_vectors_rank_last(spark):
    """A zero-norm corpus vector scores NULL (not a DIVIDE_BY_ZERO
    error, not NaN-first) and ranks after every real neighbour in
    the brute-force and SQ lanes."""
    from recmetrics_pyspark_spark.operators.similarity import (
        ann_bruteforce_topk,
        sq_ann_topk,
    )

    rows = [(i, [float(i % 3 + 1), 1.0, 0.5]) for i in range(6)]
    rows.append((6, [0.0, 0.0, 0.0]))
    vecs = _vec_df(spark, rows)
    q = vecs.filter(F.col("vec_id") < 1)
    out = ann_bruteforce_topk(vecs, q, k=10).collect()
    ranks = {r.neighbor_id: r.rnk for r in out}
    sims = {r.neighbor_id: r.cos_sim for r in out}
    assert sims[6] is None
    assert ranks[6] == max(ranks.values())
    # SQ lane: queries stay full-precision, so a zero-norm QUERY
    # NULLs every pair (the corpus-side reconstruction of a zero
    # vector is a bucket midpoint, deliberately non-zero) — ranks
    # fall back to the id tiebreak instead of raising under ANSI
    zq = _vec_df(spark, [(0, [0.0, 0.0, 0.0])])
    zout = sq_ann_topk(vecs, zq, k=3).collect()
    assert all(r.cos_sim is None for r in zout)
    assert [r.neighbor_id for r in sorted(zout, key=lambda r: r.rnk)] == [
        1, 2, 3
    ]


# ---------------------------------------------------------------------------
# bradley_terry_ratings
# ---------------------------------------------------------------------------


def _bt_reference(games, iters=8):
    """Naive driver-side MM replay with the operator's exact rounding
    rules (round-half-up at 9 via the same double arithmetic)."""
    from collections import defaultdict

    n = defaultdict(int)
    w = defaultdict(int)
    items = set()
    for a, b in games:
        n[(min(a, b), max(a, b))] += 1
        w[a] += 1
        items.add(a)
        items.add(b)
    r = {i: 1.0 for i in items}
    for _ in range(iters):
        raw = {}
        for i in items:
            s = 0.0
            terms = []
            for (x, y), c in n.items():
                if i in (x, y):
                    j = y if i == x else x
                    terms.append(round(c / (r[i] + r[j]), 9))
            # DECIMAL-exact sum: sort for stability, but the values
            # are 9-dp so plain fsum of rounded terms is exact enough
            s = round(sum(sorted(terms)), 9)
            raw[i] = round((w.get(i, 0) + 0.5) / s, 9)
        z = round(sum(sorted(round(v, 9) for v in raw.values())), 9)
        r = {i: round(v / z, 9) for i, v in raw.items()}
    return {i: round(v, 6) for i, v in r.items()}


def test_bradley_terry_hand_fixture(spark):
    """3-item arena: A beats B twice, B beats C twice, A beats C once
    — ratings must order A > B > C, sum to ~1, and match the naive
    MM replay at 6 decimals."""
    from recmetrics_pyspark_spark.operators.ranking import (
        bradley_terry_ratings,
    )

    games = [(1, 2), (1, 2), (2, 3), (2, 3), (1, 3)]
    df = spark.createDataFrame(games, ["winner", "loser"])
    rows = {r.item: r for r in bradley_terry_ratings(df).collect()}
    assert rows[1].rating > rows[2].rating > rows[3].rating
    assert rows[1].rnk == 1 and rows[3].rnk == 3
    assert rows[1].n_wins == 3 and rows[3].n_wins == 0
    assert rows[1].n_games == 3 and rows[2].n_games == 4
    assert abs(sum(r.rating for r in rows.values()) - 1.0) < 1e-4
    want = _bt_reference(games)
    for i, r in rows.items():
        assert abs(r.rating - want[i]) < 2e-6, (i, r.rating, want[i])


def test_bradley_terry_symmetry_and_zero_wins(spark):
    """A perfectly balanced head-to-head gives equal ratings; an
    all-loss item still gets a small positive rating (the +0.5
    pseudo-win), never 0 or NULL."""
    from recmetrics_pyspark_spark.operators.ranking import (
        bradley_terry_ratings,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (2, 3)], ["winner", "loser"]
    )
    rows = {r.item: r for r in bradley_terry_ratings(df).collect()}
    assert rows[1].rating == rows[2].rating
    assert rows[3].n_wins == 0
    assert rows[3].rating is not None and rows[3].rating > 0
    assert rows[3].rnk == 3


# ---------------------------------------------------------------------------
# lsh_recall_report
# ---------------------------------------------------------------------------


def test_lsh_recall_report_consistent_with_pair_queries(spark):
    """The report's counts must equal what the two declared pair
    queries actually return, and recall their ratio."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    n_exact = e.queries()["ngram_jaccard_pairs"](spark, sf).count()
    n_lsh = e.queries()["minhash_lsh_pairs"](spark, sf).count()
    row = e.queries()["lsh_recall_report"](spark, sf).collect()[0]
    assert row.n_exact == n_exact
    # the LSH path verifies candidates against exact Jaccard, so its
    # pairs are a subset of the exact set and n_hit == |LSH pairs|
    assert row.n_hit == n_lsh
    assert row.recall == round(n_lsh / n_exact, 6)
    if row.n_hit < row.n_exact:
        assert row.missed_mean_jaccard is not None
        assert 0.1 <= row.missed_mean_jaccard < 1.0
