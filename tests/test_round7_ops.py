"""Round-7 operator additions: the k-core convergence witness and the
tie-group decomposition of the popularity rank windows (exactness vs
the naive single-window form)."""

from __future__ import annotations


def test_kcore_converged_flag_true_at_fixed_point(spark):
    from recmetrics_pyspark_spark.operators.graph import k_core_decompose

    # triangle + tail: converges in 2 peels, so 4 rounds hit the
    # fixed point and every row carries the witness
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["ia", "ib"]
    )
    rows = k_core_decompose(pairs, k=2, rounds=4).collect()
    assert {r.node for r in rows} == {1, 2, 3}
    assert all(r.converged for r in rows)


def test_kcore_converged_flag_false_when_rounds_exhausted(spark):
    from recmetrics_pyspark_spark.operators.graph import k_core_decompose

    # path graph 1-2-...-8 under k=2: each peel only sheds the two
    # endpoints, so 1 round leaves a shrinking (non-fixed) subgraph
    # and the witness must say so instead of silently returning the
    # superset
    path = [(i, i + 1) for i in range(1, 8)]
    pairs = spark.createDataFrame(path, ["ia", "ib"])
    rows = k_core_decompose(pairs, k=2, rounds=1).collect()
    assert rows  # superset of the (empty) 2-core survives...
    assert all(not r.converged for r in rows)  # ...and is flagged

    # peeled to convergence the witness flips true (empty core: no
    # rows, vacuous) — rounds+1 idempotence already property-pinned
    done = k_core_decompose(pairs, k=2, rounds=4).collect()
    assert done == []


def test_long_tail_decomposition_matches_naive_window(spark):
    """The tie-group offsets + per-group row_number plan must equal
    the naive global-window rank/cumsum exactly (integers)."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from recmetrics_pyspark_spark.operators.metrics import long_tail_stats

    rows = [(u,) for u in [1] * 5 + [2] * 5 + [3] * 3 + [4, 5, 6]]
    df = spark.createDataFrame(rows, ["id_product"])
    got = {
        r.id_product: (r.item_rank, r.cumulative_volume, r.pct_cumulative)
        for r in long_tail_stats(df).collect()
    }

    vol = df.groupBy("id_product").agg(F.count(F.lit(1)).alias("v"))
    w = Window.orderBy(F.desc("v"), F.asc("id_product"))
    naive = {
        r.id_product: (r.rnk, r.cum)
        for r in vol.select(
            "id_product",
            F.row_number().over(w).alias("rnk"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
        ).collect()
    }
    assert {k: v[:2] for k, v in got.items()} == naive
    total = float(sum(1 for _ in rows))
    for k, (_, cum, pct) in got.items():
        assert abs(pct - round(cum / total, 6)) < 1e-12


def test_equi_width_bin_null_and_degenerate_slots(spark):
    import pyspark.sql.functions as F
    import pytest

    from recmetrics_pyspark_spark.operators.quality import (
        equi_width_bin,
        psi_drift,
    )

    df = spark.createDataFrame(
        [(None,), (5.0,), (0.0,), (10.0,)], "v double"
    )
    rows = df.select(
        equi_width_bin(F.col("v"), F.lit(0.0), F.lit(10.0), 10).alias("b"),
        equi_width_bin(F.col("v"), F.lit(5.0), F.lit(5.0), 10).alias("bz"),
        # n_bins=2: the constant slot clamps to least(1, n_bins-1)=1,
        # a valid index (it was silently == the top edge bin before)
        equi_width_bin(F.col("v"), F.lit(5.0), F.lit(5.0), 2).alias("b2"),
        equi_width_bin(F.col("v"), F.lit(5.0), F.lit(5.0), 1).alias("b1"),
    ).collect()
    got = {r.b: (r.bz, r.b2, r.b1) for r in rows}
    # NULL measurements bin to NULL in BOTH branches — never to an
    # edge bin where they'd register as shifted mass
    assert None in got and got[None] == (None, None, None)
    # constant-range semantics: below/at/above → 0 / slot / top
    assert got[0] == (0, 0, 0)      # below the constant
    assert got[5] == (1, 1, 0)      # at it (slot clamped for n_bins<=2)
    assert got[9] == (9, 1, 0)      # above: top edge bin

    # monitors that rely on the separation guarantee reject n_bins < 3
    ev = spark.createDataFrame(
        [("a", 1.0, __import__("datetime").datetime(2024, 1, 1))],
        ["event_type", "value", "ts"],
    )
    with pytest.raises(ValueError, match="n_bins >= 3"):
        psi_drift(ev, n_bins=2)


def test_long_tail_tie_buckets_preserves_curve(spark):
    """tie_buckets salts the tie-group ranking (the ~B× single-task
    shrink for the volume=1 tail at catalog scale) without changing
    the curve: the (rank, cumulative, pct) point set and each item's
    volume are invariant — only which tied item holds which tied rank
    may differ."""
    import pyspark.sql.functions as F  # noqa: F401

    from recmetrics_pyspark_spark.operators.metrics import long_tail_stats

    rows = [(u,) for u in [1] * 6 + [2] * 6 + [3] * 3 + [4, 5, 6, 7]]
    df = spark.createDataFrame(rows, ["id_product"])
    base = long_tail_stats(df).collect()
    salted = long_tail_stats(df, tie_buckets=4).collect()

    def curve(rs):
        return sorted(
            (r.item_rank, r.cumulative_volume, r.pct_cumulative, r.bucket)
            for r in rs
        )

    assert curve(base) == curve(salted)
    # each item keeps its own volume (identity never crosses groups)
    vb = {r.id_product: r.volume for r in base}
    vs = {r.id_product: r.volume for r in salted}
    assert vb == vs
    # within a tie group the rank RANGE is the same set of integers
    def ranks_by_vol(rs):
        out = {}
        for r in rs:
            out.setdefault(r.volume, set()).add(r.item_rank)
        return out

    assert ranks_by_vol(base) == ranks_by_vol(salted)


def test_gopher_quality_flags_hand_cases(spark):
    """Rae et al. 2021 A1.1 rules, hand-computed per rule."""
    from recmetrics_pyspark_spark.functions.text import (
        gopher_quality_flags,
    )

    rows = [
        (1, " ".join(["the", "of", "and"] * 20)),  # wlen 2.67 fails
        # 55 DISTINCT words + 2 stopwords: passes every quality AND
        # repetition rule (each n-gram occurs once)
        (2, " ".join(f"alpha{i:02d}" for i in range(55)) + " the of"),
        (3, "- b\n- b\nreal text line..."),  # bullet/ellipsis lines
        (4, ""),  # empty: all-false, no crash
        (5, "### #### " + " ".join(["word"] * 60)),  # symbol ratio
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}

    assert out[2].keep and out[2].n_words == 57
    assert abs(out[2].mean_word_len - round(390 / 57, 6)) < 1e-9

    assert not out[1].keep and not out[1].ok_mean_word_len
    assert out[1].ok_word_count and out[1].ok_stopwords  # 3 distinct

    r3 = out[3]
    assert not r3.ok_word_count  # 7 words < 50
    assert r3.bullet_line_frac == round(2 / 3, 6)
    assert r3.ellipsis_line_frac == round(1 / 3, 6)
    assert not r3.ok_ellipsis_lines  # 0.333 > 0.3
    assert r3.ok_bullet_lines  # 0.667 <= 0.9

    r4 = out[4]
    assert r4.n_words == 0 and not r4.keep
    assert r4.mean_word_len is None  # undefined, not crashed

    r5 = out[5]
    assert not r5.ok_symbol_ratio  # 7 '#' / 62 words > 0.1
    assert r5.ok_word_count and r5.ok_alpha_words


def test_gopher_whitespace_word_split(spark):
    """Words split on a whitespace CLASS (ADVICE r7): one-word-per-line
    prose counts every word, not one merged token."""
    from recmetrics_pyspark_spark.functions.text import (
        gopher_quality_flags,
    )

    df = spark.createDataFrame(
        [(1, "one\ntwo\tthree\r\nfour  five")], ["doc_id", "text"]
    )
    r = gopher_quality_flags(df).collect()[0]
    assert r.n_words == 5
    # 3+3+5+4+4 = 19 chars over 5 words
    assert abs(r.mean_word_len - 3.8) < 1e-9


def test_gopher_repetition_rules_hand_cases(spark):
    """Rae et al. A1.1 repetition axes, hand-computed."""
    from recmetrics_pyspark_spark.functions.text import (
        gopher_quality_flags,
    )

    rows = [
        # 7 non-empty lines: 'dup line' x3 (2 dups) + 'para a' x2
        # (1 dup) -> 3/7; paragraphs: 4 non-empty, 'para a' dup -> 1/4
        (1, "dup line\ndup line\ndup line\nuniq one\n\n"
            "para a\n\npara a\n\npara b"),
        # 'spam' x7: top 2-gram 'spam spam' count 6 x len 9 = 54 over
        # 58 chars (overlapping repeats can exceed 1 by design)
        (2, "spam spam spam spam spam spam spam and the be to of it all"),
        # one word: no 2/3/4-grams -> fractions 0, rules pass
        (3, "single"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}

    r1 = out[1]
    assert r1.dup_line_frac == round(3 / 7, 6)
    assert r1.dup_para_frac == 0.25
    assert not r1.ok_dup_lines and r1.ok_dup_paras

    r2 = out[2]
    assert r2.dup_line_frac == 0.0
    assert r2.top_2gram_char_frac == round(54 / 58, 6)
    assert not r2.ok_top_2gram and not r2.ok_top_3gram

    r3 = out[3]
    assert (
        r3.top_2gram_char_frac == 0.0
        and r3.top_3gram_char_frac == 0.0
        and r3.top_4gram_char_frac == 0.0
    )
    assert r3.ok_top_2gram and r3.ok_dup_lines and r3.ok_dup_paras


def test_gopher_full_repetition_table_hand_cases(spark):
    """The remaining A1.1 repetition rules: dup line/para CHAR
    fractions and duplicate 5..10-gram char mass, hand-computed."""
    from recmetrics_pyspark_spark.functions.text import (
        gopher_quality_flags,
    )

    rows = [
        # lines_ne chars 8+8+4+5+5=30, distinct 17 -> dup 13 over 36
        # text chars; paras 21+5+5=31, distinct 26 -> dup 5 over 36
        (1, "dup line\ndup line\nuniq\n\npp qq\n\npp qq"),
        # 'v w x y z' 5-gram repeats: every 5-gram window of the
        # repeated block recurs; no 10-gram repeats (text too short)
        (2, "v w x y z v w x y z and tail words here now"),
        (3, "single"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}

    r1 = out[1]
    assert r1.dup_line_char_frac == round(13 / 36, 6)
    assert r1.dup_para_char_frac == round(5 / 36, 6)
    assert not r1.ok_dup_line_chars  # 0.361 > 0.2
    assert r1.ok_dup_para_chars  # 0.139 <= 0.2

    r2 = out[2]
    # only 'v w x y z' occurs twice among 5-grams: (2-1)*9 = 9 chars
    # over len(text) = 43
    assert r2.dup_5gram_char_frac == round(9 / 43, 6)
    assert r2.dup_10gram_char_frac == 0.0
    assert not r2.ok_dup_5gram  # 0.2045 > 0.15
    assert r2.ok_dup_10gram

    r3 = out[3]
    assert r3.dup_5gram_char_frac == 0.0 and r3.ok_dup_5gram
