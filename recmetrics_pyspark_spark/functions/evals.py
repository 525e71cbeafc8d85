"""Model-evaluation metrics for LLM pipelines: SQuAD-style exact
match / token F1, and the unbiased pass@k estimator.

Both are scan-local per example — the multiset token intersection is
an array expression (bounded by answer length), and pass@k is exact
integer combinatorics on per-task (n, c) counts — so evaluation
scales with the predictions table: no shuffle beyond the optional
macro aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# multiset (Counter) intersection size, SQuAD-F1 style: for each
# DISTINCT predicted token, min(occurrences in pred, occurrences in
# ref), summed. O(n²) per row on answer-length arrays — array-local.
_COMMON_EXPR = """
aggregate(array_distinct(ptoks), 0, (acc, t) ->
  acc + least(size(filter(ptoks, x1 -> x1 = t)),
              size(filter(rtoks, x2 -> x2 = t))))
"""


def qa_token_f1(
    df: DataFrame,
    col_id: str,
    col_pred: str,
    col_ref: str,
) -> DataFrame:
    """Per-example exact match and token F1 (Rajpurkar et al. 2016
    normalization minus article-stripping: lowercase, collapse
    whitespace). F1 uses the MULTISET token intersection — repeated
    tokens must match per occurrence, which a set intersection gets
    wrong. Output: (id, em, n_pred, n_ref, f1)."""

    def norm(c):
        return F.split(
            F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " "
        )

    t = df.select(
        F.col(col_id).alias("id"),
        norm(F.col(col_pred)).alias("ptoks"),
        norm(F.col(col_ref)).alias("rtoks"),
    ).withColumn("common", F.expr(_COMMON_EXPR))
    p = F.col("common") / F.size("ptoks")
    r = F.col("common") / F.size("rtoks")
    return t.select(
        "id",
        (F.col("ptoks") == F.col("rtoks")).alias("em"),
        F.size("ptoks").alias("n_pred"),
        F.size("rtoks").alias("n_ref"),
        F.when(F.col("common") == 0, F.lit(0.0))
        .otherwise(F.round(2 * p * r / (p + r), 6))
        .alias("f1"),
    )


def rouge_n(
    df: DataFrame,
    col_id: str,
    col_pred: str,
    col_ref: str,
    n: int = 2,
) -> DataFrame:
    """ROUGE-N per example (Lin 2004): clipped n-gram overlap between
    a candidate and its reference — for each DISTINCT candidate
    n-gram, min(occurrences in candidate, occurrences in reference),
    summed. Precision = overlap / candidate grams, recall = overlap /
    reference grams, F1 their harmonic mean. The clipping is the
    multiset intersection (repeated grams must match per occurrence),
    same rule as ``qa_token_f1``.

    Like the reference's per-example eval metrics (cf.
    /root/reference README's metric-per-row style), this is entirely
    scan-local: n-grams are built by a JVM ``transform`` over token
    positions and the clipped overlap by an array ``aggregate`` —
    O(L²) on answer-length arrays, ZERO shuffles, so it rides the
    predictions scan at any corpus size. Texts shorter than ``n``
    tokens have zero grams on that side (standard ROUGE; score 0).

    Output: (id, n_pred_grams, n_ref_grams, overlap, rouge_p,
    rouge_r, rouge_f1)."""
    if n < 1:
        raise ValueError(f"rouge_n needs n >= 1, got {n}")

    def grams(toks: str) -> str:
        # empty array when size < n: sequence(1, size-n+1) would run
        # DESCENDING for short arrays (Spark generates [1, 0]), so the
        # short side is handled by an explicit CASE, not greatest().
        return (
            f"CASE WHEN size({toks}) < {n} THEN array() "
            f"ELSE transform(sequence(1, size({toks}) - {n - 1}), "
            f"i -> concat_ws(' ', slice({toks}, i, {n}))) END"
        )

    t = df.select(
        F.col(col_id).alias("id"),
        F.expr(grams(f"split({col_pred}, ' ')")).alias("pg"),
        F.expr(grams(f"split({col_ref}, ' ')")).alias("rg"),
    ).withColumn(
        "overlap",
        F.expr(
            """
aggregate(array_distinct(pg), 0, (acc, g) ->
  acc + least(size(filter(pg, x1 -> x1 = g)),
              size(filter(rg, x2 -> x2 = g))))
"""
        ).cast("bigint"),
    )
    p = F.col("overlap") / F.size("pg")
    r = F.col("overlap") / F.size("rg")
    return t.select(
        "id",
        F.size("pg").cast("bigint").alias("n_pred_grams"),
        F.size("rg").cast("bigint").alias("n_ref_grams"),
        "overlap",
        F.when(F.size("pg") == 0, F.lit(0.0))
        .otherwise(F.round(p, 6))
        .alias("rouge_p"),
        F.when(F.size("rg") == 0, F.lit(0.0))
        .otherwise(F.round(r, 6))
        .alias("rouge_r"),
        F.when(F.col("overlap") == 0, F.lit(0.0))
        .otherwise(F.round(2 * p * r / (p + r), 6))
        .alias("rouge_f1"),
    )


def pass_at_k(
    df: DataFrame,
    col_task: str,
    col_n: str,
    col_c: str,
    ks: tuple[int, ...] = (1, 5),
) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, Codex): given n samples per
    task with c passing, pass@k = 1 − C(n−c, k)/C(n, k) — the
    probability that at least one of k drawn samples passes. Exact
    integer combinatorics via factorial (keep n ≤ 10 so the factorial
    ratio is exact in double on every engine); per-task scan-local,
    one row per (task, k)."""

    def comb(a, b):
        return F.when(
            (b > a) | (F.lit(False)), F.lit(0.0)
        ).otherwise(
            F.factorial(a.cast("int"))
            / (
                F.factorial(b.cast("int"))
                * F.factorial((a - b).cast("int"))
            )
        )

    base = df.select(
        F.col(col_task).alias("task"),
        F.col(col_n).cast("int").alias("n"),
        F.col(col_c).cast("int").alias("c"),
    )
    parts = []
    for k in ks:
        kl = F.lit(k)
        pk = F.when(F.col("n") - F.col("c") < kl, F.lit(1.0)).otherwise(
            1.0
            - comb(F.col("n") - F.col("c"), kl) / comb(F.col("n"), kl)
        )
        parts.append(
            base.filter(F.col("n") >= kl).select(
                "task",
                kl.cast("int").alias("k"),
                "n",
                "c",
                F.round(pk, 6).alias("pass_at_k"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def classifier_eval(
    df: DataFrame,
    col_label: str,
    col_score: str,
    threshold: float = 0.0,
    score_buckets: int = 1024,
) -> DataFrame:
    """Binary-classifier quality report in ONE row: confusion matrix
    at ``threshold`` (predict positive iff score > threshold),
    precision/recall/F1, and ROC AUC via the rank-sum identity
    AUC = (Σ ranks of positives − n_pos(n_pos+1)/2) / (n_pos·n_neg)
    with AVERAGE ranks for tied scores (the Mann-Whitney U
    convention — ties contribute 0.5, so an all-constant scorer
    lands at exactly 0.5).

    Scale shape: one aggregate to the DISTINCT-SCORE grain, then a
    TWO-LEVEL prefix sum instead of a single global-ordered window
    (a continuous scorer — NB log-odds, a sigmoid — makes the
    distinct-score grain row-scale, and a global ``orderBy(s)``
    window would sort all of it in one task). Level 1: each distinct
    score lands in one of ``score_buckets`` equal-width value
    buckets over the observed [min, max] range (bucket id is
    monotone in s, equal scores share a bucket, so bucket order IS
    score order); per-bucket totals get their running offset from
    one window over ≤ ``score_buckets`` rows. Level 2: the
    within-bucket running count is a window PARTITIONED by bucket —
    hash-distributed, each task sorts ~1/score_buckets of the
    grain. cum_before = bucket offset + within-bucket prefix,
    exactly the value the global window produced. Rank mass per
    score group is exact in DECIMAL(28,1) (integer + .5 fractions
    only), so the sum is partition-order independent and
    engine-portable. NULL scores and NULL labels are excluded up
    front (both engines agree); NaN scores clamp into the top
    bucket, where the within-bucket sort places them after every
    finite score — Spark's NaN-greatest total order, preserved.

    Output: (n_pos, n_neg, tp, fp, fn, tn, precision, recall, f1,
    auc). Degenerate one-class inputs yield NULL auc (division
    nullif-guarded), never a silent 0."""
    from pyspark.sql.window import Window

    nb = int(score_buckets)
    base = df.select(
        F.col(col_label).cast("int").alias("y"),
        F.col(col_score).cast("double").alias("s"),
    ).filter(F.col("y").isNotNull() & F.col("s").isNotNull())
    g = base.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("np"),
    )
    # level-1 bucketing: finite range from the non-NaN scores (one
    # broadcast row); frac clamps to [0, 1] so ±inf can't overflow
    # the floor-cast, and a constant-score corpus (range 0 → NULL
    # frac) lands everything in bucket 0 via greatest's null-skip
    rng = g.agg(
        F.min(F.when(~F.isnan("s"), F.col("s"))).alias("smin"),
        F.max(F.when(~F.isnan("s"), F.col("s"))).alias("smax"),
    )
    frac = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            (F.col("s") - F.col("smin"))
            / F.nullif(F.col("smax") - F.col("smin"), F.lit(0.0)),
        ),
    )
    gb = g.crossJoin(F.broadcast(rng)).withColumn(
        "bkt",
        F.when(F.isnan("s"), F.lit(nb - 1))
        .otherwise(F.least(F.lit(nb - 1), F.floor(frac * nb)))
        .cast("int"),
    )
    wb = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    boffs = (
        gb.groupBy("bkt")
        .agg(F.sum("n").alias("bn"))
        .select(
            "bkt",
            F.coalesce(F.sum("bn").over(wb), F.lit(0))
            .cast("bigint")
            .alias("bkt_before"),
        )
    )
    ws = Window.partitionBy("bkt").orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # average rank of a tie group = rows before it + (n+1)/2; the
    # group's positive rank mass is np * that — a .0/.5 fraction,
    # exact in DECIMAL(28,1)
    ranked = gb.join(F.broadcast(boffs), "bkt").withColumn(
        "cum_before",
        (
            F.col("bkt_before")
            + F.coalesce(F.sum("n").over(ws), F.lit(0))
        ).cast("bigint"),
    ).select(
        "n",
        "np",
        "s",
        (
            F.col("np")
            * (F.col("cum_before") + (F.col("n") + 1) / 2.0)
        )
        .cast("decimal(28,1)")
        .alias("pos_rank_mass"),
    )
    thr = F.lit(threshold)
    agg = ranked.agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        (F.sum("n") - F.sum("np")).cast("bigint").alias("n_neg"),
        F.sum(F.when(F.col("s") > thr, F.col("np")).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(
            F.when(F.col("s") > thr, F.col("n") - F.col("np")).otherwise(0)
        )
        .cast("bigint")
        .alias("fp"),
        F.sum("pos_rank_mass").alias("sum_pos_ranks"),
    )
    fn = F.col("n_pos") - F.col("tp")
    tn = F.col("n_neg") - F.col("fp")
    prec = F.col("tp") / F.nullif(
        (F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0)
    )
    rec = F.col("tp") / F.nullif(F.col("n_pos").cast("double"), F.lit(0.0))
    auc = (
        F.col("sum_pos_ranks").cast("double")
        - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / F.nullif((F.col("n_pos") * F.col("n_neg")).cast("double"), F.lit(0.0))
    return agg.select(
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        fn.alias("fn"),
        tn.alias("tn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            2 * prec * rec / F.nullif(prec + rec, F.lit(0.0)), 6
        ).alias("f1"),
        F.round(auc, 6).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    col_label: str,
    col_prob: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + Expected Calibration Error: fixed-width
    probability bins (Guo et al. 2017's standard ECE construction);
    per bin the mean predicted probability vs the empirical positive
    rate, plus the N-weighted |gap| total as ``ece`` repeated on
    every row (bins-scale output, so the repeat is free and saves
    callers a second aggregate).

    Determinism: per-row probabilities are rounded to 9 decimals
    into DECIMAL(18,9) before the bin mean, and the bin |gap| mass
    is re-rounded to DECIMAL before the ECE sum — both sums are
    partition-order independent. Callers feeding a libm-derived
    probability (e.g. a sigmoid of log-odds) should pre-round it to
    9 decimals so binning agrees across engines. p = 1.0 clamps into
    the top bin; out-of-range probabilities clamp symmetrically
    (p < 0 into bin 0, p > 1 into the top bin) instead of minting
    negative bin ids that would silently skew the ECE weights. NULL
    labels/probabilities are excluded.

    Scale shape: one scan-side bin assignment + one n_bins-key
    aggregate (map-side combined); the ECE window runs over
    <= n_bins rows. Output: (bin, bin_lo, n, mean_prob, pos_rate,
    abs_gap, ece)."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(col_label).cast("int").alias("y"),
        F.col(col_prob).cast("double").alias("p"),
    ).filter(F.col("y").isNotNull() & F.col("p").isNotNull())
    b = base.withColumn(
        "bin",
        F.greatest(
            F.lit(0),
            F.least(F.lit(n_bins - 1), F.floor(F.col("p") * n_bins)),
        ).cast("int"),
    )
    per = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.round("p", 9).cast("decimal(18,9)")).alias("sp9"),
    )
    mean_prob = F.col("sp9").cast("double") / F.col("n")
    pos_rate = F.col("sy") / F.col("n").cast("double")
    gap_mass = (
        F.round(F.abs(pos_rate - mean_prob) * F.col("n"), 9)
        .cast("decimal(28,9)")
        .alias("gm9")
    )
    w = Window.partitionBy()
    out = per.select("bin", "n", "sy", "sp9", gap_mass).select(
        "bin",
        (F.col("bin") / F.lit(float(n_bins))).alias("bin_lo"),
        "n",
        F.round(F.col("sp9").cast("double") / F.col("n"), 6).alias(
            "mean_prob"
        ),
        F.round(F.col("sy") / F.col("n").cast("double"), 6).alias(
            "pos_rate"
        ),
        F.round(
            F.abs(
                F.col("sy") / F.col("n").cast("double")
                - F.col("sp9").cast("double") / F.col("n")
            ),
            6,
        ).alias("abs_gap"),
        # both sums cast to double BEFORE dividing: decimal-division
        # result-scale rules differ between engines, doubles don't
        F.round(
            F.sum("gm9").over(w).cast("double")
            / F.sum("n").over(w).cast("double"),
            6,
        ).alias("ece"),
    )
    return out
