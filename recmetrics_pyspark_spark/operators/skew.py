"""Skew mitigation for hot-key joins: explicit salting.

AQE's skew-join splitting (on in our session factory) handles most
cases at runtime; explicit salting is the deterministic fallback for
power-law keys known in advance (the long-tail item distribution the
reference itself plots is exactly this shape). The salt changes only
physical distribution — join results are identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: salt the big side into
    ``n_salts`` sub-keys (deterministic spread via xxhash64 of the whole
    row) and replicate the small side once per salt, so one hot key
    fans out over n_salts shuffle partitions instead of one straggler.

    The replicated small side costs n_salts× its size — use for
    dimension-scale right sides only (same rule as broadcasting)."""
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_salted, [on, "_salt"], how).drop("_salt")


def key_skew_stats(
    df: DataFrame, col_key: str, top_k: int = 10
) -> DataFrame:
    """Heavy-hitter diagnostic for a join/aggregation key: the top-k
    keys by row count with each key's share and the running cumulative
    share. This is the measurement that decides WHICH mitigation a
    100 TB join needs (salting, AQE skew split, broadcast of the hot
    slice): if the top key holds >1% of rows, a plain hash join's
    hottest task is ~key_share x table_size.

    One count aggregate to key scale, then ``orderBy().limit(k)`` —
    Spark plans that as per-partition partial top-k + a k-row merge
    (TakeOrderedAndProject), so the key-scale table is never globally
    sorted. Ranking/cumulative math then runs over the k surviving
    rows only; the global total rides along as a 1-row broadcast."""
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(col_key).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("total"))
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(top_k)
    w = Window.orderBy(F.desc("n"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("bigint").alias("rnk"),
            "key",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(
                F.sum("n").over(
                    w.rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                )
                / F.col("total"),
                6,
            ).alias("cum_share"),
        )
    )
