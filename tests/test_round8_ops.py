"""Round-8 operators: cross-corpus eval decontamination
(operators/dedup.py::ngram_decontaminate)."""

import pytest

F = pytest.importorskip("pyspark.sql.functions")

from recmetrics_pyspark_spark.sources.io import load_table  # noqa: E402


QUOTE = "q1 q2 q3 q4 q5 q6"


def _corpora(spark):
    train = spark.createDataFrame(
        [
            # embeds the 6-word eval quote: exactly two colliding
            # 5-grams (q1..q5, q2..q6)
            (101, "t1 t2 " + QUOTE + " t3"),
            # clean: shares words but no 5-gram run
            (102, "q1 x q2 x q3 x q4 x q5 x q6 and more words"),
            (103, "entirely different content with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(1, QUOTE), (2, "unrelated eval question about something else")],
        ["doc_id", "text"],
    )
    return train, eval_df


def test_planted_quote_is_flagged(spark):
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    train, eval_df = _corpora(spark)
    out = {
        r.doc_id: r
        for r in ngram_decontaminate(train, eval_df, k=5).collect()
    }
    assert set(out) == {101}  # only the embedding doc is flagged
    r = out[101]
    assert r.n_collisions == 2
    assert r.n_eval_docs == 1
    assert r.sample_shingle == "q1 q2 q3 q4 q5"


def test_disjoint_corpora_flag_nothing(spark):
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    eval_df = spark.createDataFrame(
        [(9, "one two three four five six")], ["doc_id", "text"]
    )
    assert ngram_decontaminate(train, eval_df, k=5).count() == 0


def test_n_eval_docs_counts_distinct_eval_hits(spark):
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    train = spark.createDataFrame([(7, QUOTE)], ["doc_id", "text"])
    # the same quote appears in TWO eval docs
    eval_df = spark.createDataFrame(
        [(1, QUOTE + " tail"), (2, "head " + QUOTE)], ["doc_id", "text"]
    )
    r = ngram_decontaminate(train, eval_df, k=5).collect()[0]
    assert r.doc_id == 7 and r.n_eval_docs == 2


def test_broadcast_guard_fallback_branch_matches(spark):
    """Both size-guard branches (broadcast vs shuffle fallback) give
    identical results — the house both-branches rule."""
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    train, eval_df = _corpora(spark)

    def canon(df):
        return sorted(map(tuple, df.collect()))

    assert canon(
        ngram_decontaminate(train, eval_df, k=5, broadcast_eval_limit=0)
    ) == canon(ngram_decontaminate(train, eval_df, k=5))


def test_k13_default_and_short_doc_partial_shingle(spark):
    """Default k=13; a sub-k document contributes its single partial
    shingle (word_shingles semantics), so an exact short-doc copy in
    both corpora still flags."""
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    short = "only five words right here"
    train = spark.createDataFrame(
        [(1, short), (2, "another tiny doc")], ["doc_id", "text"]
    )
    eval_df = spark.createDataFrame([(9, short)], ["doc_id", "text"])
    out = ngram_decontaminate(train, eval_df).collect()
    assert [(r.doc_id, r.n_collisions) for r in out] == [(1, 1)]


def test_kcore_until_converged_on_deep_chain(spark):
    """A long path hanging off a K4 needs >8 peels at k=2: the fixed
    default leaves a superset with converged=false, the auto mode
    peels to the exact fixed point (the K4) with converged=true."""
    from recmetrics_pyspark_spark.operators.graph import (
        k_core_decompose,
    )

    clique = [(100, 101), (100, 102), (100, 103), (101, 102),
              (101, 103), (102, 103)]
    chain = [(i, i + 1) for i in range(1, 25)] + [(25, 100)]
    pairs = spark.createDataFrame(clique + chain, ["ia", "ib"])

    fixed = k_core_decompose(pairs, k=2, rounds=8).collect()
    assert fixed and not fixed[0].converged  # honest superset flag
    assert len(fixed) > 4  # chain remnants still present

    auto = k_core_decompose(pairs, k=2, until_converged=True).collect()
    assert auto and auto[0].converged
    assert sorted(r.node for r in auto) == [100, 101, 102, 103]
    assert all(r.degree == 3 for r in auto)


def test_kcore_until_converged_max_rounds_backstop(spark):
    """If max_rounds bites before the fixed point, converged stays
    false — a loud bound, never a silent truncation."""
    from recmetrics_pyspark_spark.operators.graph import (
        k_core_decompose,
    )

    chain = [(i, i + 1) for i in range(1, 25)]
    pairs = spark.createDataFrame(chain, ["ia", "ib"])
    out = k_core_decompose(
        pairs, k=2, until_converged=True, max_rounds=2
    ).collect()
    assert out and not out[0].converged

    done = k_core_decompose(pairs, k=2, until_converged=True).collect()
    assert done == []  # a bare path has no 2-core; empty == converged


def test_ngram_decontaminate_empty_corpora(spark):
    """Empty train or eval side: empty output, no crash (the round-6
    degenerate-input rule)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    schema = "doc_id BIGINT, text STRING"
    empty = spark.createDataFrame([], schema)
    docs = spark.createDataFrame([(1, "some words here")], ["doc_id", "text"])
    assert ngram_decontaminate(empty, docs, k=3).count() == 0
    assert ngram_decontaminate(docs, empty, k=3).count() == 0
    assert ngram_decontaminate(empty, empty, k=3).count() == 0


def test_whitespace_formatting_does_not_defeat_decontamination(spark):
    """A line-wrapped / double-spaced copy of a single-spaced eval
    quote still collides: tokenization is the whitespace CLASS, not
    the literal space (the ADVICE-r7 defect class, cross-corpus
    edition)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [
            (1, "t1 t2 q1 q2\nq3  q4\tq5 q6 t3"),  # wrapped + doubled
            (2, "clean other words entirely different here"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame([(9, QUOTE)], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           ngram_decontaminate(train, eval_df, k=5).collect()}
    assert set(out) == {1}
    assert out[1].n_collisions == 2  # q1..q5 and q2..q6


def test_c4_clean_hand_cases(spark):
    """Raffel et al. 2020 §2.2 line rules, hand-computed."""
    from recmetrics_pyspark_spark.functions.text import c4_clean

    rows = [
        # 6 lines: kept are the 5-word '.', the multi-sentence, and
        # the quote-terminated 5-word line; 'short.' (1 word), the
        # 4-word '.' line (paper keeps >= 5 words), and the punct-less
        # line drop. Sentences in kept text: 1+4+1 = 6.
        (1, 'Good line number one here.\nshort.\nFour words drop'
            ' now.\nno punct line at all\n'
            'Another full sentence ends here! Also this. And this.'
            ' Plus one more?\nQuote line ends so well."'),
        (2, "Has lorem Ipsum inside. One. Two. Three. Four. Five."),
        (3, "code { brace } here. One. Two. Three. Four. Five."),
        (4, ""),
        # >= 5 words per line but only 2 sentences -> dropped page
        # (paper keeps pages of >= 3 sentences)
        (5, "First sentence has five words.\n"
            "Second sentence has five words."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in c4_clean(df).collect()}

    r1 = out[1]
    assert (r1.n_lines, r1.n_kept_lines, r1.n_sentences) == (6, 3, 6)
    assert r1.keep
    assert r1.clean_text.startswith("Good line number one here.")
    assert "short." not in r1.clean_text
    assert "Four words drop" not in r1.clean_text
    assert "no punct" not in r1.clean_text

    assert out[2].has_lorem_ipsum and not out[2].keep  # case-folded
    assert out[3].has_curly_brace and not out[3].keep
    assert out[4].n_kept_lines == 0 and not out[4].keep
    r5 = out[5]
    assert r5.n_kept_lines == 2 and r5.n_sentences == 2
    assert not r5.keep  # 2 < 3 sentences


def test_normalize_mode_collides_across_case_and_punct(spark):
    """normalize=True applies the GPT-3-style lowercase +
    punctuation-strip before shingling."""
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [(1, "prefix The Quick, Brown Fox; Jumps! suffix")],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(9, "the quick brown fox jumps")], ["doc_id", "text"]
    )
    # raw tokens differ (case + punctuation) -> no collision
    assert ngram_decontaminate(train, eval_df, k=5).count() == 0
    out = ngram_decontaminate(train, eval_df, k=5, normalize=True)
    rows = out.collect()
    assert [(r.doc_id, r.n_collisions) for r in rows] == [(1, 1)]
    assert rows[0].sample_shingle == "the quick brown fox jumps"


def test_decontaminate_monotonicity_laws(spark):
    """(a) eval-superset monotonicity: adding eval docs never
    un-flags a train doc; (b) k-monotonicity: a (k+1)-gram collision
    implies a k-gram collision, so flagged(k+1) is a subset of
    flagged(k)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
            (3, "totally unrelated words in this training document"),
        ],
        ["doc_id", "text"],
    )
    ev_small = spark.createDataFrame(
        [(10, "beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    ev_big = spark.createDataFrame(
        [
            (10, "beta gamma delta epsilon zeta"),
            (11, "three four five six seven eight"),
        ],
        ["doc_id", "text"],
    )

    def flagged(tr, ev, k):
        return {
            r.doc_id for r in ngram_decontaminate(tr, ev, k=k).collect()
        }

    # (a) superset eval flags a superset of train docs
    assert flagged(train, ev_small, 5) <= flagged(train, ev_big, 5)
    assert flagged(train, ev_big, 5) == {1, 2}
    # (b) flagged at k+1 is a subset of flagged at k
    for k in (3, 4, 5):
        assert flagged(train, ev_big, k + 1) <= flagged(train, ev_big, k)


def test_eval_contamination_report_flip_side(spark):
    """The eval-grain report agrees with the train-grain scan on the
    same collision set (conservation: distinct (train, eval) doc-pair
    coverage matches from both directions)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        eval_contamination_report,
        ngram_decontaminate,
    )

    train, eval_df = _corpora(spark)
    ev_rep = {
        r.eval_id: r
        for r in eval_contamination_report(train, eval_df, k=5).collect()
    }
    # only eval doc 1 (the quote) is burned, by exactly one train doc
    assert set(ev_rep) == {1}
    assert ev_rep[1].n_train_docs == 1
    assert ev_rep[1].n_collisions == 2
    assert ev_rep[1].sample_shingle == "q1 q2 q3 q4 q5"
    # conservation vs the train-grain view
    tr_rep = ngram_decontaminate(train, eval_df, k=5).collect()
    assert sum(r.n_eval_docs for r in tr_rep) == sum(
        r.n_train_docs for r in ev_rep.values()
    )


def test_c4_clean_idempotent_on_clean_text(spark):
    """Cleaning the cleaned text is a fixed point: every kept line
    still ends in terminal punctuation with >= 5 words, so
    n_kept_lines and clean_text are invariant under a second pass."""
    from recmetrics_pyspark_spark.functions.text import c4_clean

    df = spark.createDataFrame(
        [
            (1, 'Good line number one here.\nshort.\nno punct\n'
                'Second keeper sentence lives here!'),
            (2, "All of these words stay.\nAnd these words stay too."),
        ],
        ["doc_id", "text"],
    )
    once = c4_clean(df).select("doc_id", "clean_text")
    twice = c4_clean(
        once.withColumnRenamed("clean_text", "text")
    ).select("doc_id", "clean_text")
    a = {r.doc_id: r.clean_text for r in once.collect()}
    b = {r.doc_id: r.clean_text for r in twice.collect()}
    assert a == b


def test_corpus_datacard_hand_fixture(spark):
    """Per-source card over a fixture with known language mix, exact
    duplicates, and a zero-length doc (NULL quality excluded)."""
    from recmetrics_pyspark_spark.functions.text import corpus_datacard

    rows = [
        (1, "the cat and the dog", "a"),     # en (3 EN lexicon hits)
        (2, "the cat and the dog", "a"),     # exact dup of doc 1
        (3, "el que de la y", "a"),          # es
        (4, "", "a"),                        # zero-length: NULL quality
        (5, "der das und ist die", "b"),     # de
        (6, "le chat et les chiens", "b"),   # fr (3 FR lexicon hits)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.source: r for r in corpus_datacard(df).collect()}

    a = out["a"]
    assert a.n_docs == 4 and a.n_dup_docs == 1
    assert a.exact_dup_rate == 0.25
    assert (a.n_lang_en, a.n_lang_es, a.n_lang_de, a.n_lang_fr) == (
        3, 1, 0, 0,
    )
    # ties go en: the empty doc scores 0 hits everywhere -> 'en'
    assert a.total_tokens == 5 + 5 + 5 + 1  # split('') is ['']
    assert a.mean_quality is not None  # 3 non-null quality docs

    b = out["b"]
    assert (b.n_lang_en, b.n_lang_es, b.n_lang_de, b.n_lang_fr) == (
        0, 0, 1, 1,
    )
    assert b.n_dup_docs == 0 and b.exact_dup_rate == 0.0


def test_c4_clean_runs_in_structured_streaming(spark, tmp_path):
    """c4_clean is a pure scan-side projection, so it applies to a
    readStream source unchanged and matches its batch output."""
    rows = [
        (1, "Kept sentence number one.\nno punct here\nAnd two more."
            " Also three. Then four! Finally five?"),
        (2, "short.\nnothing kept here at all"),
    ]
    from recmetrics_pyspark_spark.functions.text import c4_clean

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    src = tmp_path / "docs_stream"
    df.write.parquet(str(src))
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        str(src)
    )
    q = (
        c4_clean(stream)
        .writeStream.format("memory")
        .queryName("c4_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            tuple(r)
            for r in spark.sql("SELECT * FROM c4_stream").collect()
        )
    finally:
        q.stop()
    want = sorted(tuple(r) for r in c4_clean(df).collect())
    assert got == want


def test_corpus_datacard_conservation(spark):
    """Volumes are conserved: per-source doc/char/token totals sum to
    the corpus totals, and language counts partition n_docs."""
    from recmetrics_pyspark_spark.functions.text import corpus_datacard

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    card = corpus_datacard(docs).collect()
    assert sum(r.n_docs for r in card) == docs.count()
    total_chars = docs.selectExpr("sum(length(text))").collect()[0][0]
    assert sum(r.total_chars for r in card) == total_chars
    for r in card:
        assert (
            r.n_lang_en + r.n_lang_es + r.n_lang_de + r.n_lang_fr
            == r.n_docs
        )
        assert 0 <= r.exact_dup_rate <= 1
