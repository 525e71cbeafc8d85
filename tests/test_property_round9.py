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
