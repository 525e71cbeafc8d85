"""Text-analysis functions for training-data pipelines over `documents`.

All expressions are built-in (JVM-side, whole-stage codegen) — no Python
UDFs anywhere. Each op is written against the portable SQL subset shared
with DuckDB so the driver's oracle can recompute it exactly:
tokenization is a literal single-space split (the testdata corpus is
single-space joined), character classes via regexp_replace, higher-order
array functions (transform/filter/aggregate) for per-token logic.

Shared lexicon constants are imported by ``__spark_entry__`` to generate
the matching oracle SQL from the same source of truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny stopword lexicons (lowercase). Kept deliberately small and
# hardcoded: they are part of the operator's deterministic contract.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")
LEX_EN = ("the", "and", "of", "to", "is")
LEX_ES = ("el", "la", "de", "que", "y")
LEX_DE = ("der", "die", "und", "das", "ist")


def _sql_set(words: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def tokens_col(col_text: str) -> Column:
    return F.split(F.col(col_text), " ")


def count_in_lexicon(tokens_expr: str, lexicon: tuple[str, ...]) -> Column:
    """# tokens belonging to a lexicon, via a JVM higher-order filter."""
    return F.expr(
        f"size(filter({tokens_expr}, t -> t IN {_sql_set(lexicon)}))"
    )


def text_stats(df: DataFrame, col_id: str = "doc_id", col_text: str = "text") -> DataFrame:
    """Per-document surface statistics: char/token counts, char-class
    ratios, stopword ratio, and a BPE-ish ~4-chars-per-token estimate."""
    t = f"split({col_text}, ' ')"
    return df.select(
        F.col(col_id),
        F.length(col_text).alias("n_chars"),
        F.expr(f"size({t})").cast("long").alias("n_tokens"),
        F.round(
            F.expr(
                f"aggregate(transform({t}, x -> length(x)), 0L, (a, x) -> a + x)"
            )
            / F.expr(f"size({t})").cast("double"),
            6,
        ).alias("avg_token_len"),
        F.round(
            F.length(F.regexp_replace(F.col(col_text), "[^a-zA-Z]", ""))
            / F.length(col_text).cast("double"),
            6,
        ).alias("alpha_ratio"),
        F.round(
            F.length(F.regexp_replace(F.col(col_text), "[^0-9]", ""))
            / F.length(col_text).cast("double"),
            6,
        ).alias("digit_ratio"),
        F.round(
            F.length(F.regexp_replace(F.col(col_text), "[^ ]", ""))
            / F.length(col_text).cast("double"),
            6,
        ).alias("space_ratio"),
        F.round(
            count_in_lexicon(t, STOPWORDS_EN)
            / F.expr(f"size({t})").cast("double"),
            6,
        ).alias("stopword_ratio"),
        F.ceil(F.length(col_text) / F.lit(4.0)).cast("long").alias("token_est_char4"),
    )


def language_id(df: DataFrame, col_id: str = "doc_id", col_text: str = "text") -> DataFrame:
    """N-gram-free language heuristic: argmax of lexicon hit counts,
    deterministic tie-break en > es > de."""
    t = f"split({col_text}, ' ')"
    s_en = count_in_lexicon(t, LEX_EN)
    s_es = count_in_lexicon(t, LEX_ES)
    s_de = count_in_lexicon(t, LEX_DE)
    return df.select(
        F.col(col_id),
        s_en.cast("long").alias("s_en"),
        s_es.cast("long").alias("s_es"),
        s_de.cast("long").alias("s_de"),
    ).withColumn(
        "lang_pred",
        F.when((F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_de")), "en")
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de"),
    )


def doc_fingerprint(
    df: DataFrame, col_id: str = "doc_id", col_text: str = "text", shingle_words: int = 3
) -> DataFrame:
    """Document fingerprints: full-content md5 plus a min-shingle-hash
    (the 1-permutation MinHash: min of md5 over word n-gram shingles —
    a rolling-hash fingerprint robust to local edits)."""
    t = f"split({col_text}, ' ')"
    k = shingle_words
    shingle_hashes = (
        f"transform(sequence(1, size({t}) - {k - 1}),"
        f" i -> md5(concat_ws(' ', slice({t}, i, {k}))))"
    )
    return df.select(
        F.col(col_id),
        F.md5(F.col(col_text)).alias("content_hash"),
        F.when(
            F.expr(f"size({t})") >= k, F.expr(f"array_min({shingle_hashes})")
        )
        .otherwise(F.md5(F.col(col_text)))
        .alias("shingle_fp"),
    )


def quality_score(df: DataFrame, col_id: str = "doc_id", col_text: str = "text") -> DataFrame:
    """Composite document quality heuristic in [0,1]:
    0.4·min(n_tokens/50, 1) + 0.4·alpha_ratio + 0.2·min(5·stopword_ratio, 1)."""
    t = f"split({col_text}, ' ')"
    n_tokens = F.expr(f"size({t})").cast("double")
    alpha = F.length(
        F.regexp_replace(F.col(col_text), "[^a-zA-Z]", "")
    ) / F.length(col_text).cast("double")
    stop = count_in_lexicon(t, STOPWORDS_EN) / n_tokens
    return df.select(
        F.col(col_id),
        F.round(
            F.least(n_tokens / 50.0, F.lit(1.0)) * 0.4
            + alpha * 0.4
            + F.least(stop * 5.0, F.lit(1.0)) * 0.2,
            6,
        ).alias("quality"),
    )


def tfidf_top_terms(
    df: DataFrame,
    col_id: str = "doc_id",
    col_text: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document, pure DataFrame (no HashingTF —
    exact term identities, fully oracle-checkable).

    idf = ln((N+1)/(df+1)) + 1 (sklearn's smooth idf); score = tf·idf.
    Two vocabulary-scale aggregates + a broadcast join; ranking is
    per-document (partitioned window)."""
    from pyspark.sql.functions import broadcast
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(col_id), F.explode(F.split(col_text, " ")).alias("token")
    )
    tf = toks.groupBy(col_id, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    idf = dfreq.crossJoin(broadcast(n_docs)).select(
        "token",
        (
            F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1.0
        ).alias("idf"),
    )
    scored = tf.join(broadcast(idf), "token").select(
        col_id,
        "token",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = Window.partitionBy(col_id).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def token_count_by_lang(
    df: DataFrame, col_lang: str = "lang", col_text: str = "text"
) -> DataFrame:
    """Corpus-level token accounting grouped by language label."""
    t = f"split({col_text}, ' ')"
    return (
        df.select(
            F.col(col_lang),
            F.expr(f"size({t})").cast("long").alias("n_tok"),
        )
        .groupBy(col_lang)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_tok"), 6).alias("avg_tokens"),
        )
    )
