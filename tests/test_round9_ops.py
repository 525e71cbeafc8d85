"""Round-9 decontamination hardening: the GPT-3 min(k, len)
short-eval containment rule, the zero-token filter, and the
no-persist-leak contract (operators/dedup.py)."""

import pytest

F = pytest.importorskip("pyspark.sql.functions")


def _collect_map(df):
    return {r[0]: r for r in df.collect()}


def test_short_eval_doc_embedded_in_long_train_doc_is_flagged(spark):
    """An eval doc with fewer than k words quoted inside a longer
    train doc must collide: the train side emits full n-grams at the
    eval doc's length (GPT-3 matches min(13, len)-grams against the
    full training text)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [
            (101, "a b c SHORT EVAL ANSWER d e f g h i j k l m n"),
            (102, "no quoted material anywhere in this page at all"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(1, "SHORT EVAL ANSWER")], ["doc_id", "text"]
    )
    out = _collect_map(ngram_decontaminate(train, eval_df, k=13))
    assert set(out) == {101}
    assert out[101].n_collisions == 1
    assert out[101].n_eval_docs == 1
    assert out[101].sample_shingle == "SHORT EVAL ANSWER"


def test_short_eval_rule_covers_multiple_lengths_and_eval_grain(spark):
    """Two short eval docs of DIFFERENT lengths both collide (the
    train emitter compiles one gram level per distinct short length),
    and the eval-grain report sees the same hits."""
    from recmetrics_pyspark_spark.operators.dedup import (
        eval_contamination_report,
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [
            (101, "x1 x2 TWO WORDS x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"),
            (102, "y1 A THREE WORD y2 y3 y4 y5 y6 y7 y8 y9 y10 y11"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(1, "TWO WORDS"), (2, "A THREE WORD"), (3, "NOWHERE AT ALL")],
        ["doc_id", "text"],
    )
    tr_out = _collect_map(ngram_decontaminate(train, eval_df, k=13))
    assert set(tr_out) == {101, 102}
    assert tr_out[101].sample_shingle == "TWO WORDS"
    assert tr_out[102].sample_shingle == "A THREE WORD"
    ev_out = _collect_map(
        eval_contamination_report(train, eval_df, k=13)
    )
    assert set(ev_out) == {1, 2}
    assert ev_out[1].n_train_docs == 1
    assert ev_out[2].n_train_docs == 1


def test_short_train_doc_still_matches_whole_doc_equality(spark):
    """A train doc SHORTER than k keeps the historical min(k, len)
    emission: its whole text is its shingle, so an identical short
    eval doc still collides (and a short train doc that merely
    CONTAINS a shorter eval doc now collides via the extra levels)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [
            (201, "THE EXACT SHORT DOC"),      # equality match (len 4)
            (202, "pre TINY ANSWER post end"),  # containment (len 5)
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(1, "THE EXACT SHORT DOC"), (2, "TINY ANSWER")],
        ["doc_id", "text"],
    )
    out = _collect_map(ngram_decontaminate(train, eval_df, k=13))
    assert set(out) == {201, 202}
    assert out[201].sample_shingle == "THE EXACT SHORT DOC"
    assert out[202].sample_shingle == "TINY ANSWER"


def test_zero_token_docs_never_collide(spark):
    """Whitespace-only documents emit NO shingles on either side:
    without the filter, the empty partial shingle would report any
    whitespace-only train doc as contaminated by any whitespace-only
    eval doc (ADVICE r8)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        eval_contamination_report,
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [(1, "   \t  \n "), (2, ""), (3, "real words in here now")],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(9, " \n\t "), (10, "")], ["doc_id", "text"]
    )
    assert ngram_decontaminate(train, eval_df, k=5).count() == 0
    assert eval_contamination_report(train, eval_df, k=5).count() == 0


def test_default_path_persists_nothing(spark):
    """The default (no-injection) decontamination path must not leak
    a cached table into the session (round-8 verdict residual #2)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        eval_contamination_report,
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m")], ["doc_id", "text"]
    )
    eval_df = spark.createDataFrame(
        [(9, "c d e f g")], ["doc_id", "text"]
    )
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    ngram_decontaminate(train, eval_df, k=5).collect()
    eval_contamination_report(train, eval_df, k=5).collect()
    assert jsc.getPersistentRDDs().size() == before


def test_injected_eval_shingles_match_default_and_unpersist(spark):
    """build_eval_shingles + injection returns the identical result
    to the default path; the caller-owned cache unpersists cleanly."""
    from recmetrics_pyspark_spark.operators.dedup import (
        build_eval_shingles,
        eval_contamination_report,
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [
            (101, "t1 t2 q1 q2 q3 q4 q5 q6 t3 t4 t5 t6 t7"),
            (102, "pad SHORT ONE pad2 pad3 pad4 pad5 pad6 pad7 pad8"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(1, "q1 q2 q3 q4 q5 q6"), (2, "SHORT ONE")],
        ["doc_id", "text"],
    )

    def _rows(df):
        return sorted(tuple(r) for r in df.collect())

    base_tr = _rows(ngram_decontaminate(train, eval_df, k=5))
    base_ev = _rows(eval_contamination_report(train, eval_df, k=5))

    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    shingles = build_eval_shingles(eval_df, k=5)
    assert jsc.getPersistentRDDs().size() == before + 1
    got_tr = _rows(
        ngram_decontaminate(
            train, eval_df, k=5, eval_shingles=shingles
        )
    )
    got_ev = _rows(
        eval_contamination_report(
            train, eval_df, k=5, eval_shingles=shingles
        )
    )
    shingles.unpersist(blocking=True)
    assert jsc.getPersistentRDDs().size() == before
    assert got_tr == base_tr
    assert got_ev == base_ev


def test_short_eval_containment_matches_duckdb_mirror_when_live(spark):
    """Live-regime cross-engine pin: the declared oracle's short-eval
    CTEs are INERT at every test SF (min corpus doc is 10 words > the
    query's k=5), so run the same SQL shape in DuckDB on synthetic
    rows where the rule bites and diff against Spark (the
    test_basket_cap pattern)."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    rows = [
        (1, "src0", "PLANTED SHORT"),                       # eval, len 2
        (2, "src0", "e1 e2 e3 e4 e5 e6"),                   # eval, len 6
        (3, "src1", "w1 PLANTED SHORT w2 w3 w4 w5 w6 w7"),  # containment
        (4, "src1", "e2 e3 e4 e5 e6 tail1 tail2 tail3"),    # 5-gram hit
        (5, "src1", "clean page with nothing quoted here"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    import __spark_entry__ as e

    oracle = con.execute(e.oracle_sql()["ngram_decontaminate"]).df()
    want = sorted(
        (int(r.doc_id), int(r.n_collisions), int(r.n_eval_docs),
         r.sample_shingle)
        for r in oracle.itertuples()
    )

    docs = spark.createDataFrame(pdf)
    ev = docs.filter(F.col("source") == "src0").select("doc_id", "text")
    tr = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    got = sorted(
        (r.doc_id, r.n_collisions, r.n_eval_docs, r.sample_shingle)
        for r in ngram_decontaminate(tr, ev, k=5).collect()
    )
    assert got == want
    assert {g[0] for g in got} == {3, 4}


def test_mismatched_injected_shingles_raise(spark):
    """An eval_shingles table built with a different (k, normalize)
    than the consuming call can never collide with the train side's
    grams — the operator must refuse it rather than silently report
    a clean corpus (round-9 review finding)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        build_eval_shingles,
        eval_contamination_report,
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n o p")], ["doc_id", "text"]
    )
    eval_df = spark.createDataFrame(
        [(9, "c d e f g h i j k l m n o")], ["doc_id", "text"]
    )
    shingles = build_eval_shingles(eval_df, k=13)
    try:
        with pytest.raises(ValueError, match="k=13"):
            ngram_decontaminate(
                train, eval_df, k=5, eval_shingles=shingles
            )
        with pytest.raises(ValueError, match="normalize"):
            eval_contamination_report(
                train,
                eval_df,
                k=13,
                normalize=True,
                eval_shingles=shingles,
            )
    finally:
        shingles.unpersist(blocking=True)


def test_unstamped_overlength_injected_shingles_raise(spark):
    """A caller-built shingle table without the metadata stamp still
    trips the free length sanity check when its shingles are longer
    than k (they were built with a larger k and cannot match)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        ngram_decontaminate,
    )

    train = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], ["doc_id", "text"]
    )
    eval_df = spark.createDataFrame(
        [(9, "c d e f g h i")], ["doc_id", "text"]
    )
    handmade = spark.createDataFrame(
        [(9, "c d e f g h i")], ["doc_id", "shingle"]
    )
    with pytest.raises(ValueError, match="7-token"):
        ngram_decontaminate(
            train, eval_df, k=5, eval_shingles=handmade
        ).collect()


def test_line_dedup_keep_first_and_drop_all(spark):
    """Hand fixture: boilerplate shared across docs is dropped
    (canonical copy survives in keep_first, nobody in drop_all);
    normalization unifies case/digits/whitespace; blank lines and
    within-single-doc repeats are always kept."""
    from recmetrics_pyspark_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, "Unique alpha\nShare on Facebook\n\nPage 1 of 20\nself\nself"),
            (2, "Share   on FACEBOOK\nUnique beta\nPage 9 of 20"),
            (3, "Unique gamma\nShare on Facebook"),
        ],
        ["doc_id", "text"],
    )
    got = _collect_map(line_dedup(df))
    assert got[1].clean_text == (
        "Unique alpha\nShare on Facebook\n\nPage 1 of 20\nself\nself"
    )
    assert (got[1].n_lines, got[1].n_lines_kept) == (6, 6)
    # doc 2's banner AND its "Page N of M" normalize into doc 1's
    assert got[2].clean_text == "Unique beta"
    assert got[2].frac_lines_dropped == 0.666667
    assert got[3].clean_text == "Unique gamma"

    dropped = _collect_map(line_dedup(df, mode="drop_all"))
    assert dropped[1].clean_text == "Unique alpha\n\nself\nself"
    assert dropped[3].clean_text == "Unique gamma"


def test_line_dedup_doc_losing_everything_and_min_df(spark):
    from recmetrics_pyspark_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(1, "only line"), (2, "only line"), (3, "only line")],
        ["doc_id", "text"],
    )
    got = _collect_map(line_dedup(df, mode="drop_all"))
    assert all(
        (r.clean_text, r.n_lines, r.n_lines_kept,
         r.frac_lines_dropped) == ("", 1, 0, 1.0)
        for r in got.values()
    )
    # min_df above the occurrence count -> untouched
    loose = _collect_map(line_dedup(df, min_df=4))
    assert all(r.clean_text == "only line" for r in loose.values())
    with pytest.raises(ValueError, match="mode"):
        line_dedup(df, mode="bogus")


def test_line_dedup_null_text_keeps_the_document(spark):
    """NULL text must not vanish from the output (split(NULL) explodes
    to zero rows without the coalesce guard) — it reads as empty
    text: one empty line, kept."""
    from pyspark.sql import types as T
    from recmetrics_pyspark_spark.operators.dedup import line_dedup

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, None), (3, "")], schema
    )
    got = _collect_map(line_dedup(df))
    assert set(got) == {1, 2, 3}
    for d in (2, 3):
        r = got[d]
        assert (
            r.clean_text,
            r.n_lines,
            r.n_lines_kept,
            r.frac_lines_dropped,
        ) == ("", 1, 1, 0.0)


def test_incremental_line_dedup_hand_fixture(spark):
    """History-duplicated lines are always dropped from the batch
    (the shipped copy is immutable); a line first duplicated WITHIN
    the batch keeps its smallest (id, pos) occurrence; unseen unique
    lines pass through."""
    from recmetrics_pyspark_spark.operators.dedup import (
        incremental_line_dedup,
        line_stats_table,
        merge_line_stats,
    )

    hist = spark.createDataFrame(
        [(1, "Share on Facebook\nold body"),
         (2, "Share on Facebook\nother old")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(10, "Share   on FACEBOOK\nNew banner\nfresh ten"),
         (11, "New banner\nfresh eleven")],
        ["doc_id", "text"],
    )
    stats = line_stats_table(hist)
    got = _collect_map(incremental_line_dedup(batch, stats))
    # history copy wins: batch's facebook line dropped everywhere;
    # "New banner" never in history -> doc 10 (smaller id) keeps it
    assert got[10].clean_text == "New banner\nfresh ten"
    assert got[11].clean_text == "fresh eleven"
    assert (got[10].n_lines, got[10].n_lines_kept) == (3, 2)
    # state roll-forward: merged stats equal stats over the union
    merged = merge_line_stats(stats, line_stats_table(batch))
    full = line_stats_table(hist.unionByName(batch))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_incremental_line_dedup_no_history_equals_batch_keep_first(
    spark,
):
    """With an empty state the incremental form IS batch keep_first."""
    from recmetrics_pyspark_spark.operators.dedup import (
        incremental_line_dedup,
        line_dedup,
        line_stats_table,
    )

    batch = spark.createDataFrame(
        [(1, "dup line\na"), (2, "dup line\nb"), (3, "solo")],
        ["doc_id", "text"],
    )
    empty = line_stats_table(batch.limit(0))
    inc = sorted(map(tuple, incremental_line_dedup(batch, empty).collect()))
    full = sorted(map(tuple, line_dedup(batch).collect()))
    assert inc == full


def test_incremental_line_dedup_runs_under_foreach_batch(
    spark, tmp_path
):
    """The streaming shape of boilerplate removal: each micro-batch is
    rewritten against the accumulated line-hash state inside
    foreachBatch, then the state rolls forward via merge_line_stats —
    and the stream's outputs equal the sequential batch-API replay.
    A banner introduced by batch 1 must be dropped from batch 2."""
    from recmetrics_pyspark_spark.operators.dedup import (
        incremental_line_dedup,
        line_stats_table,
        merge_line_stats,
    )

    b1 = [(1, "Subscribe now\nalpha body"), (2, "beta body")]
    b2 = [(10, "Subscribe now\ngamma body"), (11, "delta body")]
    schema = "doc_id bigint, text string"
    src = tmp_path / "stream_src"
    src.mkdir()

    state = {"stats_rows": []}
    got = []

    def handle(bdf, _bid):
        bdf = bdf.select("doc_id", "text")
        if state["stats_rows"]:
            stats = spark.createDataFrame(
                state["stats_rows"], "line_key string, n_docs bigint"
            )
        else:
            stats = line_stats_table(bdf.limit(0))
        got.extend(tuple(r) for r in
                   incremental_line_dedup(bdf, stats).collect())
        state["stats_rows"] = [
            tuple(r)
            for r in merge_line_stats(
                stats, line_stats_table(bdf)
            ).collect()
        ]

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(handle)
        .start()
    )
    try:
        spark.createDataFrame(b1, ["doc_id", "text"]).coalesce(
            1
        ).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        spark.createDataFrame(b2, ["doc_id", "text"]).coalesce(
            1
        ).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    # sequential batch-API replay
    d1 = spark.createDataFrame(b1, ["doc_id", "text"])
    d2 = spark.createDataFrame(b2, ["doc_id", "text"])
    s0 = line_stats_table(d1.limit(0))
    want = [tuple(r) for r in incremental_line_dedup(d1, s0).collect()]
    s1 = merge_line_stats(s0, line_stats_table(d1))
    want += [tuple(r) for r in incremental_line_dedup(d2, s1).collect()]
    assert sorted(got) == sorted(want)
    by_id = {t[0]: t for t in got}
    # batch 1 keeps its banner (first sighting); batch 2 loses it
    assert by_id[1][1] == "Subscribe now\nalpha body"
    assert by_id[10][1] == "gamma body"


def test_temperature_mixture_plan_flattens_toward_uniform(spark):
    """T=1 reproduces the natural shares; T=0 is uniform; 0<T<1 lifts
    the tail source above its natural share and pulls the dominant
    one below — the XLM-R flattening property. Allocations never
    exceed the budget (floor) and weights sum to 1."""
    from recmetrics_pyspark_spark.functions.curation import (
        temperature_mixture_plan,
    )

    docs = spark.createDataFrame(
        [("big", "w " * 89 + "w"), ("small", "w " * 9 + "w")],
        ["source", "text"],
    )
    # "w " * 89 + "w" splits to 90 tokens; the small source to 10
    nat = {
        r.source: r
        for r in temperature_mixture_plan(docs, 1000, 1.0).collect()
    }
    assert nat["big"].weight == nat["big"].natural_share == 0.9
    assert nat["small"].weight == 0.1
    assert nat["big"].allocated_tokens == 900

    uni = {
        r.source: r
        for r in temperature_mixture_plan(docs, 1000, 0.0).collect()
    }
    assert uni["big"].weight == uni["small"].weight == 0.5

    t7 = {
        r.source: r
        for r in temperature_mixture_plan(docs, 1000, 0.7).collect()
    }
    assert t7["small"].weight > 0.1  # tail upsampled
    assert t7["big"].weight < 0.9    # head flattened
    assert abs(t7["big"].weight + t7["small"].weight - 1.0) < 2e-6
    total = t7["big"].allocated_tokens + t7["small"].allocated_tokens
    assert total <= 1000
    # epochs > sample_rate cap only when allocation exceeds inventory
    assert t7["small"].epochs > 1.0  # 10 tokens, ~33% of 1000
    assert t7["small"].sample_rate == 1.0


# ---------------------------------------------------------------------------
# rouge_n — clipped n-gram overlap eval metric
# ---------------------------------------------------------------------------


def test_rouge2_hand_values(spark):
    """Textbook ROUGE-2 on a hand-computable pair: pred has 5
    bigrams, ref has 4, exactly {the cat, the mat} shared."""
    from recmetrics_pyspark_spark.functions.evals import rouge_n

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat", "the cat ate the mat")],
        ["doc_id", "pred", "ref"],
    )
    r = rouge_n(df, "doc_id", "pred", "ref", n=2).collect()[0]
    assert (r.n_pred_grams, r.n_ref_grams, r.overlap) == (5, 4, 2)
    assert r.rouge_p == 0.4 and r.rouge_r == 0.5
    assert r.rouge_f1 == round(2 * 0.4 * 0.5 / 0.9, 6)


def test_rouge2_clipping_and_short_sides(spark):
    """Repeated grams clip at the reference count; a side shorter
    than n has zero grams and scores 0 without dividing by zero."""
    from recmetrics_pyspark_spark.functions.evals import rouge_n

    df = spark.createDataFrame(
        [
            (1, "a a a", "a a"),  # pred [a a, a a], ref [a a] -> 1
            (2, "x", "x y"),      # pred has no bigrams
            (3, "p q", "r s"),    # disjoint
        ],
        ["doc_id", "pred", "ref"],
    )
    out = _collect_map(rouge_n(df, "doc_id", "pred", "ref", n=2))
    assert out[1].overlap == 1 and out[1].rouge_r == 1.0
    assert out[2].n_pred_grams == 0 and out[2].rouge_f1 == 0.0
    assert out[3].overlap == 0 and out[3].rouge_f1 == 0.0


def test_rouge1_equals_token_overlap(spark):
    """n=1 degenerates to clipped unigram overlap (ROUGE-1)."""
    from recmetrics_pyspark_spark.functions.evals import rouge_n

    df = spark.createDataFrame(
        [(1, "b a a", "a b b")], ["doc_id", "pred", "ref"]
    )
    r = rouge_n(df, "doc_id", "pred", "ref", n=1).collect()[0]
    # clipped: min(2,1) 'a' + min(1,2) 'b' = 2 of 3 each side
    assert r.overlap == 2
    assert r.rouge_p == r.rouge_r == round(2 / 3, 6)


def test_rouge_rejects_bad_n(spark):
    from recmetrics_pyspark_spark.functions.evals import rouge_n

    df = spark.createDataFrame([(1, "a", "a")], ["i", "p", "r"])
    with pytest.raises(ValueError):
        rouge_n(df, "i", "p", "r", n=0)


# ---------------------------------------------------------------------------
# nb_quality_classifier — one-pass multinomial Naive Bayes
# ---------------------------------------------------------------------------

_NB_DOCS = [
    (1, "good good fine", True),
    (2, "good nice", True),
    (3, "bad bad awful", False),
    (4, "bad fine", False),
]


def test_nb_hand_computed_log_odds(spark):
    """Balanced 2x2 corpus: V=5, N_pos=N_neg=5, prior 0; doc 1's
    score is 2*llr(good) + llr(fine), reproduced with the same
    round-9-then-sum rule the operator uses."""
    import math

    from recmetrics_pyspark_spark.functions.curation import (
        nb_quality_classifier,
    )

    df = spark.createDataFrame(_NB_DOCS, ["doc_id", "text", "is_hq"])
    out = _collect_map(nb_quality_classifier(df, "is_hq"))

    def llr(cp, cn):
        return round(math.log((cp + 1) / 10.0), 9) - round(
            math.log((cn + 1) / 10.0), 9
        )

    assert out[1].nb_log_odds == round(2 * llr(3, 0) + llr(1, 1), 6)
    assert out[1].predicted_pos == 1 and out[1].is_labeled_pos == 1
    assert out[3].predicted_pos == 0 and out[3].is_labeled_pos == 0
    assert all(r.n_tokens in (2, 3) for r in out.values())


def test_nb_label_flip_negates_scores(spark):
    """Swapping the classes exactly negates every log-odds (symmetric
    alpha): llr and prior both flip sign."""
    from recmetrics_pyspark_spark.functions.curation import (
        nb_quality_classifier,
    )

    df = spark.createDataFrame(_NB_DOCS, ["doc_id", "text", "is_hq"])
    a = _collect_map(nb_quality_classifier(df, "is_hq"))
    b = _collect_map(
        nb_quality_classifier(df.withColumn("is_hq", ~F.col("is_hq")),
                              "is_hq")
    )
    for k in a:
        assert abs(a[k].nb_log_odds + b[k].nb_log_odds) < 2e-6


def test_nb_one_class_corpus_is_loudly_null(spark):
    """A corpus with no negative documents yields NULL scores and
    NULL predictions (nullif-guarded prior), never silent ±inf."""
    from recmetrics_pyspark_spark.functions.curation import (
        nb_quality_classifier,
    )

    df = spark.createDataFrame(_NB_DOCS, ["doc_id", "text", "is_hq"])
    out = nb_quality_classifier(
        df.withColumn("is_hq", F.lit(True)), "is_hq"
    ).collect()
    assert all(
        r.nb_log_odds is None and r.predicted_pos is None for r in out
    )


def test_nb_separates_the_planted_vocabulary(spark):
    """On a corpus whose classes use disjoint content words, every
    document is classified back to its own class."""
    from recmetrics_pyspark_spark.functions.curation import (
        nb_quality_classifier,
    )

    rows = [(i, "alpha beta gamma common", True) for i in range(10)]
    rows += [(100 + i, "zeta eta theta common", False) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_hq"])
    out = nb_quality_classifier(df, "is_hq").collect()
    assert all(r.predicted_pos == int(r.is_labeled_pos) for r in out)


# ---------------------------------------------------------------------------
# SQ8 scalar quantization — codes + asymmetric ANN
# ---------------------------------------------------------------------------


def test_sq_quantize_codes_and_reconstruction_error(spark):
    """Codes stay in [0, 255]; the midpoint reconstruction is within
    half a bucket (range/512) of the original on every dimension,
    including the min and max boundary values."""
    from recmetrics_pyspark_spark.operators.similarity import (
        sq_ann_topk,
        sq_quantize,
    )

    rows = [
        (1, [0.0, 10.0]),
        (2, [1.0, 20.0]),
        (3, [0.5, 15.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    codes = {r.vec_id: r.codes for r in sq_quantize(df).collect()}
    assert codes[1] == [0, 0]        # mins land in bucket 0
    assert codes[2] == [255, 255]    # maxs clamp into the top bucket
    assert all(0 <= c <= 255 for cs in codes.values() for c in cs)
    # reconstruction error bound: |recon - x| <= range/512 per dim
    out = sq_ann_topk(df, df.filter(F.col("vec_id") == 3), k=2)
    assert out.count() == 2  # self excluded, two neighbours


def test_sq_constant_dimension_is_stable(spark):
    """A zero-range dimension codes to 0 and reconstructs exactly to
    the constant — no 0/0, no NaN in the cosine."""
    from recmetrics_pyspark_spark.operators.similarity import (
        sq_ann_topk,
        sq_quantize,
    )

    rows = [(i, [7.5, float(i)]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    codes = {r.vec_id: r.codes for r in sq_quantize(df).collect()}
    assert all(cs[0] == 0 for cs in codes.values())
    out = sq_ann_topk(df, df.filter(F.col("vec_id") == 0), k=3)
    rows_out = out.collect()
    assert len(rows_out) == 3
    assert all(r.cos_sim is not None for r in rows_out)


def test_sq_ann_matches_exact_on_separated_clusters(spark):
    """With two well-separated clusters, SQ8 retrieval returns the
    same top set as exact brute force (8 bits per dim is near-
    lossless at this scale)."""
    from recmetrics_pyspark_spark.operators.similarity import (
        ann_bruteforce_topk,
        sq_ann_topk,
    )

    rows = [(i, [1.0 + 0.01 * i, 0.02 * i]) for i in range(10)]
    rows += [(100 + i, [0.02 * i, 1.0 + 0.01 * i]) for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qs = df.filter(F.col("vec_id").isin(0, 100))
    a = {(r.query_id, r.neighbor_id)
         for r in sq_ann_topk(df, qs, k=5).collect()}
    b = {(r.query_id, r.neighbor_id)
         for r in ann_bruteforce_topk(df, qs, k=5).collect()}
    assert len(a & b) / len(b) >= 0.8
    # every retrieved neighbour is from the query's own cluster
    assert all((q < 50) == (nb < 50) for q, nb in a)


# ---------------------------------------------------------------------------
# nb_train / nb_score — the deployable train-offline / score-online split
# ---------------------------------------------------------------------------


def test_nb_split_reproduces_one_pass_on_training_corpus(spark):
    """score(train(df), df) equals the one-pass classifier exactly:
    every token is in-vocabulary, so the LEFT join never takes the
    unseen fallback and the DECIMAL sums are identical."""
    from recmetrics_pyspark_spark.functions.curation import (
        nb_quality_classifier,
        nb_score,
        nb_train,
    )

    df = spark.createDataFrame(_NB_DOCS, ["doc_id", "text", "is_hq"])
    one = {r.doc_id: (r.nb_log_odds, r.predicted_pos)
           for r in nb_quality_classifier(df, "is_hq").collect()}
    two = {r.doc_id: (r.nb_log_odds, r.predicted_pos)
           for r in nb_score(nb_train(df, "is_hq"), df).collect()}
    assert one == two


def test_nb_score_unseen_tokens_take_the_laplace_constant(spark):
    """A held-out doc of entirely novel words scores n * unseen_llr9
    + prior — the standard Laplace OOV treatment, with the known NB
    artifact that unseen mass favors the smaller class."""
    from recmetrics_pyspark_spark.functions.curation import (
        nb_score,
        nb_train,
    )

    df = spark.createDataFrame(_NB_DOCS, ["doc_id", "text", "is_hq"])
    model = nb_train(df, "is_hq")
    m0 = model.select("prior9", "unseen_llr9").first()
    held = spark.createDataFrame(
        [(99, "novel words only here")], ["doc_id", "text"]
    )
    r = nb_score(model, held).collect()[0]
    assert r.n_tokens == 4
    want = round(
        float(m0.prior9) + 4 * float(m0.unseen_llr9), 6
    )
    assert abs(r.nb_log_odds - want) < 1e-6


def test_nb_score_runs_under_foreach_batch(spark, tmp_path):
    """Streaming scoring: the model is static state read once; each
    micro-batch scores through nb_score inside foreachBatch, and the
    union of micro-batch outputs equals the one-shot batch score."""
    from recmetrics_pyspark_spark.functions.curation import (
        nb_score,
        nb_train,
    )

    df = spark.createDataFrame(_NB_DOCS, ["doc_id", "text", "is_hq"])
    model = nb_train(df, "is_hq").cache()
    model.count()

    b1 = [(10, "good fine"), (11, "bad awful")]
    b2 = [(12, "nice good good"), (13, "unseen mystery")]
    schema = "doc_id bigint, text string"
    src = tmp_path / "nb_stream_src"
    src.mkdir()
    got = []

    def handle(bdf, _bid):
        got.extend(
            tuple(r)
            for r in nb_score(model, bdf.select("doc_id", "text"))
            .collect()
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(handle)
        .start()
    )
    try:
        for batch in (b1, b2):
            spark.createDataFrame(batch, ["doc_id", "text"]).coalesce(
                1
            ).write.mode("append").parquet(str(src))
            q.processAllAvailable()
    finally:
        q.stop()

    allb = spark.createDataFrame(b1 + b2, ["doc_id", "text"])
    want = [tuple(r) for r in nb_score(model, allb).collect()]
    model.unpersist()
    assert sorted(got) == sorted(want)


# ---------------------------------------------------------------------------
# classifier_eval — confusion + tie-aware rank-sum AUC
# ---------------------------------------------------------------------------


def test_classifier_eval_hand_auc_and_confusion(spark):
    """Four points with known ranks: AUC = (6 - 3)/4 = 0.75; at
    threshold 0 all four predict positive."""
    from recmetrics_pyspark_spark.functions.evals import (
        classifier_eval,
    )

    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.8), (1, 0.7), (0, 0.1)], ["y", "s"]
    )
    r = classifier_eval(df, "y", "s").collect()[0]
    assert r.auc == 0.75
    assert (r.tp, r.fp, r.fn, r.tn) == (2, 2, 0, 0)
    assert r.precision == 0.5 and r.recall == 1.0
    assert r.f1 == round(2 * 0.5 * 1.0 / 1.5, 6)


def test_classifier_eval_tie_and_degenerate_behavior(spark):
    """All-tied scores land at exactly AUC 0.5 (average ranks);
    perfect separation at 1.0; a one-class input yields NULL AUC,
    never a silent 0."""
    from recmetrics_pyspark_spark.functions.evals import (
        classifier_eval,
    )

    tied = spark.createDataFrame(
        [(1, 1.0), (0, 1.0), (1, 1.0), (0, 1.0)], ["y", "s"]
    )
    assert classifier_eval(tied, "y", "s").collect()[0].auc == 0.5
    sep = spark.createDataFrame(
        [(1, 5.0), (1, 4.0), (0, -1.0)], ["y", "s"]
    )
    assert classifier_eval(sep, "y", "s").collect()[0].auc == 1.0
    one = spark.createDataFrame([(1, 5.0), (1, 4.0)], ["y", "s"])
    r = classifier_eval(one, "y", "s").collect()[0]
    assert r.auc is None and r.precision == 1.0 and r.tn == 0


def test_classifier_eval_threshold_moves_the_confusion(spark):
    """Raising the threshold trades recall for precision while AUC
    (threshold-free) is unchanged."""
    from recmetrics_pyspark_spark.functions.evals import (
        classifier_eval,
    )

    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.8), (1, 0.7), (0, 0.1)], ["y", "s"]
    )
    lo = classifier_eval(df, "y", "s", threshold=0.0).collect()[0]
    hi = classifier_eval(df, "y", "s", threshold=0.85).collect()[0]
    assert hi.auc == lo.auc == 0.75
    assert (hi.tp, hi.fp) == (1, 0) and hi.precision == 1.0
    assert hi.recall == 0.5


# ---------------------------------------------------------------------------
# dim_truncation_recall — Matryoshka storage/recall sizing report
# ---------------------------------------------------------------------------


def test_dim_truncation_full_fraction_is_identity(spark):
    """frac 1.0 reproduces the exact ranking (recall 1 by
    construction), and recall is monotone in the kept fraction on a
    corpus whose leading dims carry the signal."""
    from recmetrics_pyspark_spark.operators.similarity import (
        dim_truncation_recall,
    )

    # leading 2 dims carry cluster structure; trailing 2 are noise
    rows = [
        (i, [1.0, 0.01 * i, 0.001 * (i % 3), 0.001 * (i % 5)])
        for i in range(8)
    ]
    rows += [
        (50 + i, [0.01 * i, 1.0, 0.001 * (i % 7), 0.001 * (i % 2)])
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qs = df.filter(F.col("vec_id").isin(0, 50))
    out = {
        r.trunc_frac: r
        for r in dim_truncation_recall(
            df, qs, k=5, fractions=(1.0, 0.5, 0.25)
        ).collect()
    }
    assert out[1.0].recall == 1.0
    assert out[1.0].n_exact == out[0.5].n_exact == 10
    # half keeps both signal dims -> still perfect; quarter keeps
    # only dim 1, degrading at most to something <= half's recall
    assert out[0.5].recall == 1.0
    assert out[0.25].recall <= out[0.5].recall


def test_dim_truncation_single_dim_floor(spark):
    """A fraction that floors below one dimension clamps to one dim
    (greatest guard) instead of producing empty vectors."""
    from recmetrics_pyspark_spark.operators.similarity import (
        dim_truncation_recall,
    )

    rows = [(i, [float(i + 1), 1.0]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qs = df.filter(F.col("vec_id") == 0)
    out = dim_truncation_recall(
        df, qs, k=3, fractions=(0.1,)
    ).collect()
    assert len(out) == 1
    r = out[0]
    # one positive dim: every cosine is exactly 1.0, ranking falls to
    # the id tiebreak, which the exact ranking need not share
    assert r.n_exact == 3 and 0.0 <= r.recall <= 1.0


# ---------------------------------------------------------------------------
# rrf_fuse — reciprocal rank fusion
# ---------------------------------------------------------------------------


def test_rrf_hand_fusion_prefers_consensus(spark):
    """An item ranked 2nd by BOTH lists outscores items ranked 1st
    by only one (1/62+1/62 > 1/61): the RRF consensus property."""
    from recmetrics_pyspark_spark.operators.ranking import rrf_fuse

    l1 = spark.createDataFrame(
        [(1, "a", 1), (1, "c", 2)],
        ["query_id", "neighbor_id", "rnk"],
    )
    l2 = spark.createDataFrame(
        [(1, "b", 1), (1, "c", 2)],
        ["query_id", "neighbor_id", "rnk"],
    )
    out = rrf_fuse([l1, l2], k0=60, k=3).collect()
    byrank = {r.rnk: r for r in out}
    assert byrank[1].neighbor_id == "c" and byrank[1].n_lists == 2
    assert {byrank[2].neighbor_id, byrank[3].neighbor_id} == {"a", "b"}
    assert byrank[1].rrf_score == round(
        round(1 / 62, 9) + round(1 / 62, 9), 6
    )


def test_rrf_disjoint_pools_and_ties(spark):
    """Items in only one list still fuse (no imputation); exact
    decimal ties fall to the id tiebreak deterministically."""
    from recmetrics_pyspark_spark.operators.ranking import rrf_fuse

    l1 = spark.createDataFrame(
        [(1, "x", 1)], ["query_id", "neighbor_id", "rnk"]
    )
    l2 = spark.createDataFrame(
        [(1, "y", 1)], ["query_id", "neighbor_id", "rnk"]
    )
    out = rrf_fuse([l1, l2], k0=60, k=5).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rnk)] \
        == ["x", "y"]  # equal scores -> id order
    assert all(r.n_lists == 1 for r in out)


def test_rrf_rejects_empty_input(spark):
    from recmetrics_pyspark_spark.operators.ranking import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


# ---------------------------------------------------------------------------
# semantic_decontaminate — embedding twin of ngram_decontaminate
# ---------------------------------------------------------------------------


def test_semantic_decontaminate_flags_the_planted_paraphrase(spark):
    """A train vector nearly parallel to an eval vector is flagged
    with the right best match; orthogonal train vectors are not."""
    from recmetrics_pyspark_spark.operators.similarity import (
        semantic_decontaminate,
    )

    train = spark.createDataFrame(
        [
            (100, [1.0, 0.01, 0.0]),   # ~parallel to eval 1
            (101, [0.0, 0.0, 1.0]),    # orthogonal to both
            (102, [0.7, 0.71, 0.0]),   # between the two evals
        ],
        ["vec_id", "embedding"],
    )
    ev = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {r.train_id: r
           for r in semantic_decontaminate(train, ev, 0.9).collect()}
    assert set(out) == {100}
    assert out[100].best_eval_id == 1 and out[100].n_eval_hits == 1
    # lower threshold: 102 hits BOTH evals; tie-break prefers the
    # higher cosine (eval 2, since 0.71 > 0.7 after normalization)
    out2 = {r.train_id: r
            for r in semantic_decontaminate(train, ev, 0.5).collect()}
    assert set(out2) == {100, 102}
    assert out2[102].n_eval_hits == 2
    assert out2[102].best_eval_id == 2


def test_semantic_decontaminate_exact_tie_prefers_low_eval_id(spark):
    """Two eval vectors at identical cosine: the deterministic
    tiebreak picks the lower eval id on both engines."""
    from recmetrics_pyspark_spark.operators.similarity import (
        semantic_decontaminate,
    )

    train = spark.createDataFrame(
        [(100, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    ev = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    r = semantic_decontaminate(train, ev, 0.5).collect()[0]
    assert r.n_eval_hits == 2 and r.best_eval_id == 1


def test_semantic_decontaminate_empty_eval_set_is_clean(spark):
    from recmetrics_pyspark_spark.operators.similarity import (
        semantic_decontaminate,
    )

    train = spark.createDataFrame(
        [(100, [1.0, 0.0])], ["vec_id", "embedding"]
    )
    ev = train.filter(F.col("vec_id") < 0)
    assert semantic_decontaminate(train, ev, 0.1).count() == 0


# ---------------------------------------------------------------------------
# ivfsq_ann_topk — IVF cells composed with SQ8 reconstruction
# ---------------------------------------------------------------------------


def test_ivfsq_stays_within_probed_cells_and_near_ivf(spark):
    """IVF-SQ8 retrieves a subset of what IVF-Flat retrieves from the
    same probed cells (SQ8 only perturbs ranking inside cells, never
    which cells are probed), and on separated clusters it agrees with
    IVF-Flat entirely."""
    from recmetrics_pyspark_spark.operators.similarity import (
        ivf_ann_topk,
        ivfsq_ann_topk,
    )

    # ids 0,1 + 4..13 are cluster A; 2,3 + 100.. are cluster B, so
    # the deterministic seeds (lowest 4 ids) cover BOTH clusters
    a_ids = [0, 1] + list(range(4, 14))
    b_ids = [2, 3] + list(range(100, 110))
    rows = [(i, [1.0 + 0.001 * i, 0.002 * i, 0.0, 0.0])
            for i in a_ids]
    rows += [(i, [0.002 * i, 1.0 + 0.001 * i, 0.0, 0.0])
             for i in b_ids]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qs = df.filter(F.col("vec_id").isin(0, 2))
    a = {(r.query_id, r.neighbor_id)
         for r in ivfsq_ann_topk(df, qs, k=5, n_cells=4,
                                 nprobe=2).collect()}
    b = {(r.query_id, r.neighbor_id)
         for r in ivf_ann_topk(df, qs, k=5, n_cells=4,
                               nprobe=2).collect()}
    assert len(a) == len(b) == 10
    assert len(a & b) / len(b) >= 0.8
    # neighbours stay in the query's own cluster
    in_a = set(a_ids)
    assert all((q in in_a) == (nb in in_a) for q, nb in a)


def test_semantic_decontaminate_runs_under_foreach_batch(
    spark, tmp_path
):
    """Streaming ingest scrub: the benchmark embedding set is static
    state; each micro-batch of train vectors is scrubbed inside
    foreachBatch, and the union of micro-batch outputs equals the
    one-shot batch scrub."""
    from recmetrics_pyspark_spark.operators.similarity import (
        semantic_decontaminate,
    )

    ev = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    ).cache()
    ev.count()

    b1 = [(100, [1.0, 0.05]), (101, [0.5, 0.5])]
    b2 = [(102, [0.05, 1.0]), (103, [-1.0, 0.0])]
    schema = "vec_id bigint, embedding array<double>"
    src = tmp_path / "sd_stream_src"
    src.mkdir()
    got = []

    def handle(bdf, _bid):
        got.extend(
            tuple(r)
            for r in semantic_decontaminate(
                bdf.select("vec_id", "embedding"), ev, 0.9
            ).collect()
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(handle)
        .start()
    )
    try:
        for batch in (b1, b2):
            spark.createDataFrame(
                batch, ["vec_id", "embedding"]
            ).coalesce(1).write.mode("append").parquet(str(src))
            q.processAllAvailable()
    finally:
        q.stop()

    allb = spark.createDataFrame(b1 + b2, ["vec_id", "embedding"])
    want = [tuple(r)
            for r in semantic_decontaminate(allb, ev, 0.9).collect()]
    ev.unpersist()
    assert sorted(got) == sorted(want)
    flagged = {t[0] for t in got}
    assert flagged == {100, 102}  # near-parallel rows; 103 is opposite


# ---------------------------------------------------------------------------
# remove_duplicated_spans — the exact-substring dedup rewrite
# ---------------------------------------------------------------------------


def test_remove_duplicated_spans_deletes_the_planted_quote(spark):
    """A 5-token run shared by two docs is deleted from BOTH (the
    drop-all convention); unique docs pass through untouched."""
    from recmetrics_pyspark_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    docs = [
        (1, "u1 u2 COPY ME PLEASE NOW OK u3 u4"),
        (2, "v1 COPY ME PLEASE NOW OK v2 v3 v4"),
        (3, "totally unique content in here w9"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = _collect_map(remove_duplicated_spans(df))
    assert out[1].clean_text == "u1 u2 u3 u4"
    assert out[2].clean_text == "v1 v2 v3 v4"
    assert out[1].n_tokens_removed == out[2].n_tokens_removed == 5
    assert out[3].clean_text == docs[2][1]
    assert out[3].n_tokens_removed == 0


def test_remove_duplicated_spans_fully_duplicated_doc_empties(spark):
    """A document that IS a duplicated span becomes the empty string
    (loud, filterable), and token conservation holds everywhere."""
    from recmetrics_pyspark_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    docs = [
        (1, "THE WHOLE THING IS A COPY"),
        (2, "THE WHOLE THING IS A COPY"),
        (3, "pre THE WHOLE THING IS A COPY post"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = _collect_map(remove_duplicated_spans(df))
    assert out[1].clean_text == "" and out[2].clean_text == ""
    assert out[3].clean_text == "pre post"
    for i, (_, text) in zip(sorted(out), docs):
        r = out[i]
        kept = len(r.clean_text.split(" ")) if r.clean_text else 0
        assert r.n_tokens == len(text.split(" "))
        assert r.n_tokens - r.n_tokens_removed == kept


def test_remove_duplicated_spans_idempotent_on_clean_output(spark):
    """Re-running the rewrite on its own output (as a fresh corpus)
    with the SAME partner docs removed changes nothing: within-doc
    repeats alone never form corpus-duplicated spans."""
    from recmetrics_pyspark_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    docs = [
        (1, "a b c SHARED RUN HERE d e f"),
        (2, "x y SHARED RUN HERE z w q"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    once = remove_duplicated_spans(df).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = _collect_map(remove_duplicated_spans(once))
    base = _collect_map(remove_duplicated_spans(df))
    for k in base:
        assert twice[k].clean_text == base[k].clean_text
        assert twice[k].n_tokens_removed == 0


# ---------------------------------------------------------------------------
# calibration_bins — reliability diagram + ECE
# ---------------------------------------------------------------------------


def test_calibration_hand_bins_and_ece(spark):
    """Two occupied decile bins with hand-computable means, rates,
    gaps, and the N-weighted ECE; p = 1.0 clamps into the top bin."""
    from recmetrics_pyspark_spark.functions.evals import (
        calibration_bins,
    )

    rows = [(1, 0.05), (0, 0.05), (0, 0.05), (0, 0.05),
            (1, 0.95), (1, 0.95), (1, 1.0), (1, 1.0)]
    df = spark.createDataFrame(rows, ["y", "p"])
    out = {r.bin: r for r in calibration_bins(df, "y", "p").collect()}
    assert set(out) == {0, 9}
    assert out[0].mean_prob == 0.05 and out[0].pos_rate == 0.25
    assert out[0].abs_gap == 0.2
    assert out[9].mean_prob == 0.975 and out[9].abs_gap == 0.025
    assert out[0].ece == out[9].ece == round(
        (0.2 * 4 + 0.025 * 4) / 8, 6
    )


def test_calibration_perfectly_calibrated_scorer_has_zero_ece(spark):
    """When each bin's positive rate equals its mean probability the
    ECE is exactly 0."""
    from recmetrics_pyspark_spark.functions.evals import (
        calibration_bins,
    )

    rows = [(1, 0.25), (0, 0.25), (0, 0.25), (0, 0.25),
            (1, 0.75), (1, 0.75), (1, 0.75), (0, 0.75)]
    df = spark.createDataFrame(rows, ["y", "p"])
    out = calibration_bins(df, "y", "p").collect()
    assert all(r.ece == 0.0 and r.abs_gap == 0.0 for r in out)


def test_calibration_null_rows_excluded_and_bins_scale(spark):
    from recmetrics_pyspark_spark.functions.evals import (
        calibration_bins,
    )

    rows = [(1, 0.5), (None, 0.5), (0, None), (0, 0.55)]
    df = spark.createDataFrame(rows, ["y", "p"])
    out = calibration_bins(df, "y", "p", n_bins=10).collect()
    assert len(out) == 1 and out[0].n == 2
    assert out[0].bin == 5 and out[0].pos_rate == 0.5


# ---------------------------------------------------------------------------
# excess_surprisal — RHO-loss-style reference-model selection signal
# ---------------------------------------------------------------------------


def test_excess_surprisal_signs_and_symmetry(spark):
    """In-corpus boilerplate absent from the reference scores
    negative; reference-typical wording rare in-corpus scores
    positive; identical corpora score ~0 everywhere."""
    from recmetrics_pyspark_spark.functions.text import (
        excess_surprisal,
    )

    train = [
        (1, "spam spam spam spam"),
        (2, "quality reference prose"),
        (3, "spam spam spam spam"),
    ]
    ref = [(10, "quality reference prose here and more quality "
                "reference prose")]
    df = spark.createDataFrame(train, ["doc_id", "text"])
    rf = spark.createDataFrame(ref, ["doc_id", "text"])
    out = _collect_map(excess_surprisal(df, rf))
    assert out[1].excess_bits < 0 < out[2].excess_bits
    assert out[1].excess_bits == out[3].excess_bits  # same content
    # self-reference: identical distributions -> zero excess
    self_out = excess_surprisal(df, df).collect()
    assert all(abs(r.excess_bits) < 1e-9 for r in self_out)


def test_excess_surprisal_oov_tokens_well_defined(spark):
    """Tokens absent from the reference (or from the corpus) take
    the Laplace floor on that side — no NULLs, no infinities."""
    from recmetrics_pyspark_spark.functions.text import (
        excess_surprisal,
    )

    df = spark.createDataFrame(
        [(1, "only corpus words")], ["doc_id", "text"]
    )
    rf = spark.createDataFrame(
        [(10, "entirely different reference tokens")],
        ["doc_id", "text"],
    )
    r = excess_surprisal(df, rf).collect()[0]
    assert r.bits_self is not None and r.bits_ref is not None
    # corpus tokens are cheap in-corpus, at the Laplace floor in ref
    assert r.bits_ref > r.bits_self


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets — head/middle/tail LM filtering
# ---------------------------------------------------------------------------


def test_ccnet_buckets_partition_and_rates(spark):
    """Every scored doc lands in exactly one bucket; head keeps
    everything (rate 1.0); bucket boundaries follow the tercile
    cutoffs; the keep decision is the deterministic md5 rule."""
    from recmetrics_pyspark_spark.functions.curation import (
        ccnet_perplexity_buckets,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    out = ccnet_perplexity_buckets(docs).collect()
    assert len(out) == docs.count()  # every doc has >= 1 bigram here
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert all(r.keep for r in by_bucket["head"])
    assert all(r.keep_rate == 1.0 for r in by_bucket["head"])
    assert all(r.keep_rate == 0.1 for r in by_bucket["tail"])
    hi_head = max(r.avg_bits for r in by_bucket["head"])
    lo_tail = min(r.avg_bits for r in by_bucket["tail"])
    assert hi_head <= lo_tail
    # determinism: a rerun keeps exactly the same docs
    again = {r.doc_id: r.keep
             for r in ccnet_perplexity_buckets(docs).collect()}
    assert all(again[r.doc_id] == r.keep for r in out)


def test_soft_dedup_weights_conserve_cluster_mass(spark):
    """Each near-dup cluster's weights sum to ~1 (one document's
    worth of training mass); singletons weigh exactly 1."""
    from recmetrics_pyspark_spark.operators.dedup import (
        canonical_docs,
    )

    docs = spark.createDataFrame(
        [
            (1, "shared shingle content block one two three"),
            (2, "shared shingle content block one two three"),
            (3, "completely different standalone page text"),
        ],
        ["doc_id", "text"],
    )
    out = canonical_docs(docs).select(
        "doc_id", "component_id", "n_members",
        (F.lit(1.0) / F.col("n_members")).alias("weight"),
    ).collect()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r.component_id, []).append(r)
    for members in by_comp.values():
        assert abs(sum(m.weight for m in members) - 1.0) < 1e-9
    singles = [r for r in out if r.n_members == 1]
    assert all(r.weight == 1.0 for r in singles)
