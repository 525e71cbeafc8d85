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


def join_size_report(
    left: DataFrame,
    right: DataFrame,
    col_key_left: str,
    col_key_right: str,
    top_k: int = 10,
) -> DataFrame:
    """Pre-flight cardinality estimate for an equi-join: the EXACT
    output row count Σ_k n_left(k)·n_right(k) plus the top-k keys by
    contribution — the measurement that predicts a shuffle blowup
    BEFORE the join runs (a 100 TB self-join on a power-law key can
    emit 1000× its input; this report costs two key-scale aggregates
    instead).

    Output: one row per top-k contributing key with both side counts,
    the key's pair count, and its share of the total join output; the
    totals (join_rows, left_rows, right_rows, n_matched_keys) ride
    along as broadcast one-row columns so the report is self-contained.

    Scale shape: one count aggregate per side (key-scale), one
    key-scale equi-join of the two count tables (AQE broadcasts the
    smaller), a one-row total aggregate, and ``orderBy().limit(k)``
    planned as TakeOrderedAndProject — the key-scale table is never
    globally sorted and nothing row-scale shuffles twice. Exact BIGINT
    arithmetic everywhere; only the share is a rounded double."""
    lc = left.groupBy(F.col(col_key_left).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_left")
    )
    rc = right.groupBy(F.col(col_key_right).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_right")
    )
    per_key = lc.join(rc, "key").select(
        "key",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).cast("bigint").alias(
            "n_pairs"
        ),
    )
    totals = per_key.agg(
        F.sum("n_pairs").cast("bigint").alias("join_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_matched_keys"),
    )
    sides = lc.agg(F.sum("n_left").cast("bigint").alias("left_rows")).crossJoin(
        rc.agg(F.sum("n_right").cast("bigint").alias("right_rows"))
    )
    top = per_key.orderBy(F.desc("n_pairs"), F.asc("key")).limit(top_k)
    return (
        top.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(sides))
        .select(
            "key",
            "n_left",
            "n_right",
            "n_pairs",
            F.round(
                F.try_divide(
                    F.col("n_pairs").cast("double"),
                    F.col("join_rows").cast("double"),
                ),
                6,
            ).alias("share_of_join"),
            "join_rows",
            "n_matched_keys",
            "left_rows",
            "right_rows",
        )
        .orderBy(F.desc("n_pairs"), F.asc("key"))
    )
