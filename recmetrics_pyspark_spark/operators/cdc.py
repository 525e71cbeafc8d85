"""Snapshot change-data-capture: diff two keyed table snapshots into
insert / delete / update rows — the maintenance primitive behind
incremental ingestion, SCD handling, and materialized-view refresh in a
lakehouse pipeline (the reference has no CDC surface; this extends the
engine the way its batch metrics extend to streaming).

Design for scale: ONE full-outer shuffle join on the key columns — both
snapshots shuffle once, change detection is a codegen'd comparison in
the joined projection (``IS DISTINCT FROM`` per compared column, so
NULL transitions count as changes). For repeated diffs of the same
table family, bucket both snapshots by the key (sources/sinks.py
``write_bucketed``) and the exchange disappears entirely.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level diff of two snapshots sharing a key.

    Returns one row per key present in either snapshot with
    ``change_type`` ∈ {'insert', 'delete', 'update'} (plus 'unchanged'
    when ``include_unchanged``); update rows carry both old and new
    values of every compared column (``old_<c>`` / ``new_<c>``)."""
    o = old.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    joined = o.join(n, key_cols, "full_outer")
    changed = reduce(
        lambda a, b: a | b,
        [
            # IS DISTINCT FROM: NULL -> value and value -> NULL count
            # as changes, NULL -> NULL does not
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *key_cols,
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
