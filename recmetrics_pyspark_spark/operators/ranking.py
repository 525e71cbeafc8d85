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
