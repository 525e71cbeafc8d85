"""Legacy-adapter cross-check: personalization via RowMatrix
columnSimilarities (DIMSUM) — the reference's default "version 2" path
(reference recmetrics_pyspark.py:403-410).

Our production plan is the exact DataFrame self-join in
``operators.metrics.personalization``; this adapter exists as a mutual
oracle (the reference's own v0/v1/v2 cross-check pattern, :310-312) and
as the template for wrapping an RDD-era algorithm behind a DataFrame
API when one is genuinely needed. Without a threshold argument
columnSimilarities is exact, so the two implementations must agree to
float precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def personalization_dimsum(
    df: DataFrame,
    col_index: str = "person",
    col_columns: str = "product",
    threshold: float = 0.0,
) -> float:
    """P = 1 − 2·Σ(upper-triangle cosine)/(n(n−1)) via DIMSUM.

    Builds the sparse user-vectors-as-matrix-columns directly from
    (user, item) pairs — no dynamic pivot, no dense index window (the
    two scalability cliffs of the reference's construction, SURVEY
    §4.3.5-6): users are densely re-indexed with a vocabulary-sized
    join, items are row indices."""
    from pyspark.mllib.linalg.distributed import CoordinateMatrix, MatrixEntry

    pairs = df.select(
        F.col(col_index).alias("u"), F.col(col_columns).alias("i")
    ).distinct()
    # dense ids 0..n-1; the global-ordered window runs on the distinct
    # vocabularies (post-aggregation scale), not the interaction table —
    # acceptable here because this adapter is a cross-check, not the
    # production path
    users = pairs.select("u").distinct().withColumn(
        "uid", F.dense_rank().over(Window.orderBy("u")) - 1
    )
    items = pairs.select("i").distinct().withColumn(
        "iid", F.dense_rank().over(Window.orderBy("i")) - 1
    )
    n = users.count()
    if n < 2:
        return float("nan")
    indexed = pairs.join(users, "u").join(items, "i").select("iid", "uid")
    entries = indexed.rdd.map(lambda r: MatrixEntry(r["iid"], r["uid"], 1.0))
    mat = CoordinateMatrix(entries).toRowMatrix()
    sims = mat.columnSimilarities(threshold)
    total = sims.entries.map(lambda e: e.value).sum()
    return 1.0 - 2.0 * total / (n * (n - 1))
