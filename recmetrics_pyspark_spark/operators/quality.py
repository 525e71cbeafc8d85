"""Data-quality constraint checking — the dbt-test / Deequ-style gate a
pipeline runs before promoting a table.

Column constraints (null-rate, range, set membership) compile into ONE
aggregate pass over the table: each check is a conditional-sum column,
so 20 checks cost the same scan as one. Referential checks are
left-anti joins that only shuffle the child table's key column. Output
is one row per check: (check, n_violations, n_rows, pass) — small
enough to broadcast into a gate decision or alert sink at any input
size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_columns(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """Run named violation predicates in one scan. ``checks`` maps
    check name → a Column that is TRUE when the ROW VIOLATES the
    constraint. Names are data, never SQL: the aggregates use internal
    aliases and the unpivot is explode(map(lit(name), ...)), so any
    name (quotes, backticks, spaces, leading digits) is safe."""
    if not checks:
        raise ValueError("check_columns: checks must be non-empty")
    items = list(checks.items())
    total = F.count(F.lit(1))
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"__c{i}")
        for i, (_, cond) in enumerate(items)
    ]
    row = df.agg(total.cast("bigint").alias("__n"), *aggs)
    kv: list[Column] = []
    for i, (name, _) in enumerate(items):
        kv.extend([F.lit(name), F.col(f"__c{i}")])
    return row.select(
        F.explode(F.create_map(*kv)).alias("check", "n_violations"),
        F.col("__n").alias("n_rows"),
    ).select(
        "check",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("pass"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Uniqueness constraint: number of rows beyond the first per key
    (0 = unique). One keyed aggregate, key-scale output."""
    dup = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("c"))
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    viol = dup.agg(
        F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations")
    )
    return viol.crossJoin(F.broadcast(total)).select(
        F.lit(name).alias("check"),
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("pass"),
    )


def check_foreign_key(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Referential integrity: child keys with no parent row. The anti
    join shuffles only the key columns; the parent side prunes to its
    key column at the scan."""
    c = child.select(F.col(child_key).alias("k"))
    p = parent.select(F.col(parent_key).alias("k")).distinct()
    orphans = c.join(p, "k", "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_violations")
    )
    total = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    return orphans.crossJoin(F.broadcast(total)).select(
        F.lit(name).alias("check"),
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("pass"),
    )


def run_checks(parts: list[DataFrame]) -> DataFrame:
    """Union per-check result frames into the one gate table."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
