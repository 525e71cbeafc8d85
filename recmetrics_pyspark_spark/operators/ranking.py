"""Shared global top-k idiom.

Every ranked-output operator in the engine uses the same two-step
shape: ``orderBy(spec).limit(k)`` — which Spark plans as
TakeOrderedAndProject, a map-side partial top-k where every task keeps
only k rows (a global row_number window instead would sort the full
table in ONE partition) — followed by numbering the k-row result with
``row_number`` over the SAME ordering. Keeping both sort specs in one
place guarantees the invariant that the limit's ordering and the rank
column's ordering agree, and makes a tie-break change a one-line edit
per operator instead of two.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ranked_topk(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Global top-``k`` of ``df`` under ``order_cols`` (pass fully
    tie-broken columns, e.g. ``[F.desc("score"), F.asc("id")]``), with
    a BIGINT ``rank_col`` numbered 1..k under the same ordering.

    Plans as TakeOrderedAndProject + a k-row window — constant-memory
    per task at any input scale."""
    wk = Window.orderBy(*order_cols)
    return (
        df.orderBy(*order_cols)
        .limit(k)
        .withColumn(rank_col, F.row_number().over(wk).cast("bigint"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    k: int = 10,
    col_query: str = "query_id",
    col_item: str = "neighbor_id",
    col_rank: str = "rnk",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) — the standard
    hybrid-retrieval combiner: each input ranking contributes
    1/(k0 + rank) per (query, item), the fused score is the sum, and
    the fused top-k re-ranks on it. Items missing from a list simply
    contribute nothing (no imputation), which is what makes RRF
    robust to retrievers with disjoint candidate pools.

    Each per-list contribution is rounded to 9 decimals into
    DECIMAL(18,9) BEFORE the sum (the house cross-engine rule), and
    the fused ordering compares the EXACT decimal sum with an id
    tiebreak — so fusion is deterministic under any partitioning and
    engine. Output: (query_id, neighbor_id, n_lists, rrf_score,
    rnk).

    Scale shape: one union of list-scale inputs (each already
    k-bounded per query), ONE (query, item) aggregate, one bounded
    per-query window — the fusion layer adds no corpus-scale work on
    top of its retrievers."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = (
        F.round(F.lit(1.0) / (F.lit(k0) + F.col(col_rank)), 9)
        .cast("decimal(18,9)")
        .alias("c9")
    )
    parts = [
        r.select(
            F.col(col_query).alias("query_id"),
            F.col(col_item).alias("neighbor_id"),
            contrib,
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = u.groupBy("query_id", "neighbor_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.sum("c9").alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("s"), F.asc("neighbor_id")
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "n_lists",
            F.round(F.col("s").cast("double"), 6).alias("rrf_score"),
            "rnk",
        )
    )
