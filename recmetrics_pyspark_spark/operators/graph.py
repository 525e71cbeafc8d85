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
    # Right-size the loop's edge table: iterative rounds pay per-task
    # overhead every round, so tiny partitions dominate wall time (64
    # inherited partitions → 5.2s for 3 rounds at sf0.1; 8 → 1.2s).
    # ~2M edges/partition ≈ 50MB tasks; the floor keeps local[32] busy
    # and coalesce never goes above the parent count, so big graphs
    # keep their parallelism.
    n_edges = e.count()
    target = max(8, int(n_edges // 2_000_000) + 1)
    if target < e.rdd.getNumPartitions():
        e = e.coalesce(target)
    # Loop-invariant setup, each piece paid ONCE:
    #  - deg doubles as the node list (one row per distinct src), so no
    #    separate distinct scan of the edge table;
    #  - the contribution weight 1/outdeg is folded into the edge table
    #    up front, so the rounds broadcast only pr — re-broadcasting the
    #    static deg table every round was half the per-round cost.
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = (
        e.join(F.broadcast(deg), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes0 = deg.select(F.col("src").alias("node"))
    n = deg.count()
    base = (1.0 - damping) / n
    pr = nodes0.select("node", F.lit(1.0 / n).alias("pr")).localCheckpoint(
        eager=True
    )
    for _ in range(iters):
        # pr is NODE-scale — broadcast it explicitly: localCheckpoint-
        # backed plans report no size statistics, so without the hint
        # Spark falls back to sort-merge joins of the edge table every
        # round (measured 22s -> 8s for 3 rounds on the 827k-edge graph
        # at sf0.1; folding deg out of the loop cut it again).
        # Symmetric edge sets (the documented input contract) mean every
        # node has inbound mass, so pr is rebuilt straight from the
        # aggregate — no per-round left join against a node list.
        # Superseded localCheckpoint generations are GC-reclaimed once
        # `pr` rebinds — storage stays one-generation bounded.
        pr = (
            ew.join(F.broadcast(pr), ew.src == pr.node)
            .select("dst", (F.col("pr") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(
                (F.lit(base) + damping * F.sum("c")).alias("pr")
            )
            .select(F.col("dst").alias("node"), "pr")
            .localCheckpoint(eager=True)
        )
    return pr.select("node", F.round("pr", 6).alias("pagerank"))
