"""Graph analytics over co-occurrence edge tables: fixed-iteration
PageRank. Complements ``operators.dedup.neardup_components`` (min-label
propagation) as the second iterative-algorithm pattern in the engine.

Fixed iteration count (not convergence-tested) keeps the computation
deterministic and exactly mirrorable as chained SQL CTEs for the DuckDB
oracle — the same contract as neardup_components and the k-means
operators. Each round is one join + one aggregate at EDGE scale, with
``localCheckpoint(eager=True)`` truncating the lineage so planning cost
stays O(1) per round (measured pattern: see neardup_components'
docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_from_edges(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    col_src: str = "src",
    col_dst: str = "dst",
) -> DataFrame:
    """PageRank on a directed edge table, ``iters`` synchronous rounds:

        pr(v) ← (1-d)/N + d · Σ_{u→v} pr(u) / outdeg(u)

    The edge table shuffles once per round (join on src, aggregate on
    dst) — never the node × node matrix. Nodes are taken from the src
    side (callers pass symmetric edge sets, so every node has outbound
    edges and no dangling-mass correction is needed; for asymmetric
    graphs union the dst side in first). N is a driver-side scalar
    (one count of a node-scale table, same class as k-means' centroid
    collect)."""
    e = edges.select(
        F.col(col_src).alias("src"), F.col(col_dst).alias("dst")
    ).localCheckpoint(eager=True)
    # loop-invariant: materialize once, not once per round
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg")
    ).localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr")).localCheckpoint(
        eager=True
    )
    for _ in range(iters):
        # deg/pr/inflow are NODE-scale — broadcast them explicitly:
        # localCheckpoint-backed plans report no size statistics, so
        # without the hint Spark falls back to sort-merge joins of the
        # edge table every round (measured 22s -> 8s for 3 rounds on
        # the 827k-edge graph at sf0.1)
        inflow = (
            e.join(F.broadcast(deg), "src")
            .join(F.broadcast(pr), e.src == pr.node)
            .select(
                F.col("dst").alias("in_node"),
                (F.col("pr") / F.col("outdeg")).alias("c"),
            )
            .groupBy("in_node")
            .agg(F.sum("c").alias("inflow"))
        )
        # superseded generations are GC-reclaimed (localCheckpoint
        # blocks are unreferenced once `pr` rebinds) — storage stays
        # one-generation bounded, same as neardup_components
        pr = (
            nodes.join(
                F.broadcast(inflow), nodes.node == inflow.in_node, "left"
            )
            .select(
                "node",
                (
                    F.lit(base)
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select("node", F.round("pr", 6).alias("pagerank"))
