"""Similarity search over embedding columns (`embeddings.embedding`,
array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set against the corpus, score with zip_with/aggregate (JVM
codegen, no UDF), rank per query with a partitioned window. The scale
path buckets the corpus first (block join / LSH) so each query scores a
partition, not the planet; `embedding_near_duplicates` shows the blocked
variant (block key = `label` here; any coarse quantizer key works).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..functions.vectors import as_double, dot, norm


def ann_bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    col_id: str = "vec_id",
    col_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbours for each query vector.

    Broadcast-cross-join (|Q| small) → codegen'd cosine → per-query
    row_number. Self-matches are excluded. Ties broken by neighbour id
    so ranks are deterministic."""
    # norms are precomputed per side so each of the |Q|x|C| pairs does
    # one dot product, not one dot + two norms
    q = queries.select(
        F.col(col_id).alias("query_id"),
        as_double(col_vec).alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(col_id).alias("neighbor_id"),
        as_double(col_vec).alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        c.crossJoin(broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.9,
    col_id: str = "vec_id",
    col_vec: str = "embedding",
    col_block: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ threshold).

    With a block column the self-join is per-block (an IVF-style coarse
    partition: only same-cell pairs are scored); without one it degrades
    to the full cross self-join — exact but corpus²."""
    base = corpus.select(
        F.col(col_id), as_double(col_vec).alias("v"),
        *([F.col(col_block)] if col_block else []),
    ).withColumn("nrm", norm(F.col("v"))).persist()
    join_keys = [col_block] if col_block else []
    a = base.select(
        F.col(col_id).alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), *join_keys,
    )
    b = base.select(
        F.col(col_id).alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), *join_keys,
    )
    joined = a.join(b, join_keys) if join_keys else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            *([F.col(col_block)] if col_block else []),
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
