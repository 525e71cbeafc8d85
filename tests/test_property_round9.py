"""Round-9 property batch: line_dedup laws — exact Python replay of
both modes over randomized multi-line corpora (boilerplate pool +
numbered-banner variants + blank/whitespace lines), plus the
idempotence and conservation laws a rewrite operator must satisfy."""

from __future__ import annotations

import re
from collections import defaultdict

from hypothesis import given, settings, strategies as st

_POOL = [
    "Share on Facebook",
    "share   ON  facebook",
    "Page 1 of 20",
    "page 7 of 20",
    "",
    "   ",
    "cookie notice applies",
    "unique-ish filler words here",
]


def _norm(line: str) -> str:
    s = re.sub(r"[0-9]", "", line.lower())
    s = re.sub(r"[ \t]+", " ", s)
    # strip SPACES only: Spark's F.trim and DuckDB's trim are
    # space-only, while Python's bare .strip() would also eat
    # \r/\f/\v and unicode whitespace the engines keep
    return s.strip(" ")


def _replay(docs, min_df=2, mode="keep_first"):
    docs_per = defaultdict(set)
    first = {}
    for d, text in docs:
        for p, ln in enumerate(text.split("\n")):
            n = _norm(ln)
            if n == "":
                continue
            docs_per[n].add(d)
            if n not in first or (d, p) < first[n]:
                first[n] = (d, p)
    out = {}
    for d, text in docs:
        ls = text.split("\n")
        kept = []
        for p, ln in enumerate(ls):
            n = _norm(ln)
            if (
                n == ""
                or len(docs_per[n]) < min_df
                or (mode == "keep_first" and first[n] == (d, p))
            ):
                kept.append(ln)
        out[d] = ("\n".join(kept), len(ls), len(kept))
    return out


_corpus = st.lists(
    st.tuples(
        st.integers(0, 19),
        st.lists(
            st.one_of(
                st.sampled_from(_POOL),
                st.text(
                    alphabet="ab 3\t\r", min_size=0, max_size=8
                ).filter(lambda s: "\n" not in s),
            ),
            min_size=1,
            max_size=6,
        ),
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)


@settings(max_examples=5, deadline=None)
@given(_corpus, st.sampled_from(["keep_first", "drop_all"]))
def test_line_dedup_matches_python_replay(spark, corpus, mode):
    from recmetrics_pyspark_spark.operators.dedup import line_dedup

    docs = [(d, "\n".join(lines)) for d, lines in corpus]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_lines_kept)
        for r in line_dedup(df, mode=mode).collect()
    }
    assert got == _replay(docs, mode=mode)


@settings(max_examples=5, deadline=None)
@given(_corpus, st.sampled_from(["keep_first", "drop_all"]))
def test_line_dedup_idempotent_and_conservative(spark, corpus, mode):
    """Laws: (i) every input line is counted exactly once (n_lines
    matches the input split; kept <= n_lines); (ii) clean_text's
    lines are an ordered subsequence of the input's; (iii) a second
    pass over the rewritten corpus drops nothing — after keep_first
    every surviving normalized line lives in <2 documents' worth of
    duplicates, and after drop_all none remain at all."""
    from recmetrics_pyspark_spark.operators.dedup import line_dedup

    docs = [(d, "\n".join(lines)) for d, lines in corpus]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = line_dedup(df, mode=mode).collect()
    by_id = dict(docs)
    for r in out:
        src = by_id[r.doc_id].split("\n")
        assert r.n_lines == len(src)
        assert 0 <= r.n_lines_kept <= r.n_lines
        kept = r.clean_text.split("\n") if r.clean_text != "" else []
        # ordered-subsequence check (blank kept lines make the split
        # ambiguous when EVERYTHING kept is blank — skip those)
        if not (r.clean_text == "" and r.n_lines_kept > 0):
            it = iter(enumerate(src))
            for ln in kept:
                assert any(s == ln for _, s in it)
    # second pass: rewritten docs with >= 1 surviving line
    redocs = [
        (r.doc_id, r.clean_text) for r in out if r.n_lines_kept > 0
    ]
    if redocs:
        df2 = spark.createDataFrame(redocs, ["doc_id", "text"])
        again = line_dedup(df2, mode=mode).collect()
        assert all(r2.frac_lines_dropped == 0.0 for r2 in again)


@settings(max_examples=5, deadline=None)
@given(_corpus)
def test_incremental_line_dedup_equals_batch_when_history_precedes(
    spark, corpus
):
    """Stream-consistency law: when every history id is smaller than
    every batch id (history arrived first), incremental_line_dedup
    over the state equals batch line_dedup(keep_first) over
    history ∪ batch restricted to the batch documents."""
    from recmetrics_pyspark_spark.operators.dedup import (
        incremental_line_dedup,
        line_dedup,
        line_stats_table,
    )

    docs = [(d, "\n".join(lines)) for d, lines in corpus]
    hist = [(d, t) for d, t in docs if d < 10]
    batch = [(d + 100, t) for d, t in docs if d >= 10]
    if not batch:
        return
    bdf = spark.createDataFrame(batch, ["doc_id", "text"])
    if hist:
        hdf = spark.createDataFrame(hist, ["doc_id", "text"])
        stats = line_stats_table(hdf)
        union = hdf.unionByName(bdf)
    else:
        stats = line_stats_table(bdf.limit(0))
        union = bdf
    inc = sorted(
        map(tuple, incremental_line_dedup(bdf, stats).collect())
    )
    batch_ids = {d for d, _ in batch}
    full = sorted(
        tuple(r)
        for r in line_dedup(union).collect()
        if r.doc_id in batch_ids
    )
    assert inc == full


# ---------------------------------------------------------------------------
# Late round-9 laws: RRF, NB, classifier_eval, semantic decontamination
# ---------------------------------------------------------------------------

_rank_lists = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        min_size=1,
        max_size=5,
        unique=True,
    ),
    min_size=1,
    max_size=3,
)


@settings(max_examples=5, deadline=None)
@given(_rank_lists)
def test_rrf_is_invariant_under_list_order(spark, lists):
    """Fusing [l1, l2, ...] in any input order gives identical
    output: RRF is a sum over lists."""
    from recmetrics_pyspark_spark.operators.ranking import rrf_fuse

    dfs = [
        spark.createDataFrame(
            [(1, item, i + 1) for i, item in enumerate(lst)],
            ["query_id", "neighbor_id", "rnk"],
        )
        for lst in lists
    ]
    fwd = sorted(tuple(r) for r in rrf_fuse(dfs, k=10).collect())
    rev = sorted(tuple(r) for r in rrf_fuse(dfs[::-1], k=10).collect())
    assert fwd == rev


@settings(max_examples=5, deadline=None)
@given(_rank_lists)
def test_rrf_duplicate_list_preserves_that_lists_order(spark, lists):
    """Fusing a list with itself doubles every score and reproduces
    the list's own ranking exactly."""
    from recmetrics_pyspark_spark.operators.ranking import rrf_fuse

    lst = lists[0]
    df = spark.createDataFrame(
        [(1, item, i + 1) for i, item in enumerate(lst)],
        ["query_id", "neighbor_id", "rnk"],
    )
    single = {r.neighbor_id: (r.rnk, r.rrf_score)
              for r in rrf_fuse([df], k=10).collect()}
    doubled = {r.neighbor_id: (r.rnk, r.rrf_score)
               for r in rrf_fuse([df, df], k=10).collect()}
    assert set(single) == set(doubled)
    for it in single:
        assert doubled[it][0] == single[it][0]          # same rank
        assert abs(doubled[it][1] - 2 * single[it][1]) < 2e-6


_nb_corpus = st.lists(
    st.tuples(
        st.sampled_from(
            ["good fine", "good nice words", "bad awful", "bad sad text",
             "neutral filler here"]
        ),
        st.booleans(),
    ),
    min_size=4,
    max_size=10,
).filter(lambda rows: len({y for _, y in rows}) == 2)


@settings(max_examples=5, deadline=None)
@given(_nb_corpus)
def test_nb_is_exactly_repartition_invariant(spark, rows):
    """DECIMAL log sums make the classifier EXACTLY equal (not just
    close) under any physical partitioning."""
    from recmetrics_pyspark_spark.functions.curation import (
        nb_quality_classifier,
    )

    docs = [(i, t, y) for i, (t, y) in enumerate(rows)]
    df = spark.createDataFrame(docs, ["doc_id", "text", "is_hq"])
    a = sorted(tuple(r)
               for r in nb_quality_classifier(df, "is_hq").collect())
    b = sorted(
        tuple(r)
        for r in nb_quality_classifier(
            df.repartition(7), "is_hq"
        ).collect()
    )
    assert a == b


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(-20, 20)),
        min_size=4,
        max_size=12,
    ).filter(lambda rows: len({y for y, _ in rows}) == 2)
)
def test_auc_invariant_under_monotone_score_transform(spark, rows):
    """ROC AUC depends only on score ORDER: s -> 3s + 7 leaves it
    unchanged (ties map to ties)."""
    from recmetrics_pyspark_spark.functions.evals import (
        classifier_eval,
    )

    df = spark.createDataFrame(
        [(int(y), float(s)) for y, s in rows], ["y", "s"]
    )
    a = classifier_eval(df, "y", "s").collect()[0].auc
    df2 = df.selectExpr("y", "3.0 * s + 7.0 AS s")
    b = classifier_eval(df2, "y", "s").collect()[0].auc
    assert a == b


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 1000))
def test_semantic_decontaminate_threshold_monotone(spark, seed):
    """Raising the threshold can only SHRINK the flagged set (and
    hit counts are monotone too)."""
    from recmetrics_pyspark_spark.operators.similarity import (
        semantic_decontaminate,
    )

    # deterministic pseudo-corpus from the seed (no RNG in Spark)
    train = spark.createDataFrame(
        [
            (100 + i,
             [1.0 + ((seed + i) % 7) * 0.1, ((seed + 3 * i) % 5) * 0.2])
            for i in range(6)
        ],
        ["vec_id", "embedding"],
    )
    ev = spark.createDataFrame(
        [(1, [1.0, 0.1]), (2, [0.3, 1.0])], ["vec_id", "embedding"]
    )
    lo = {r.train_id: r.n_eval_hits
          for r in semantic_decontaminate(train, ev, 0.6).collect()}
    hi = {r.train_id: r.n_eval_hits
          for r in semantic_decontaminate(train, ev, 0.9).collect()}
    assert set(hi) <= set(lo)
    for t in hi:
        assert hi[t] <= lo[t]
