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


def rollup_merge(
    rollup: DataFrame,
    diff: DataFrame,
    group_cols: list[str],
    col_value: str,
    round_scale: int | None = None,
) -> DataFrame:
    """Incrementally maintain a (group → count, sum) rollup from a
    ``snapshot_diff`` output instead of recomputing it from the full
    snapshot: inserts contribute (+1, +new), deletes (−1, −old), and
    updates are a delete under the old grouping plus an insert under
    the new one (so group-moving updates are handled exactly).

    The delta aggregate is DIFF-scale — at 100 TB the rollup refresh
    costs one shuffle of the day's changes, never a rescan of the
    snapshot. The merge join is GROUP-scale on both sides. Groups whose
    merged count reaches zero are dropped (the group disappeared).

    Correctness contract (used by the oracle): merging yesterday's
    rollup with today's diff must equal the rollup computed directly
    from today's snapshot.

    ``round_scale``: by default the merged sum is carried at full float
    precision — chained merges stay un-rounded, so long diff chains
    don't drift from a direct recompute by re-rounding at every step.
    Pass a scale (e.g. 2 for currency) to round at THIS merge's output,
    i.e. only at a comparison/presentation boundary."""
    old_side = diff.filter(
        F.col("change_type").isin("delete", "update")
    ).select(
        *[F.col(f"old_{c}").alias(c) for c in group_cols],
        F.lit(-1).alias("dn"),
        (-F.col(f"old_{col_value}")).alias("dv"),
    )
    new_side = diff.filter(
        F.col("change_type").isin("insert", "update")
    ).select(
        *[F.col(f"new_{c}").alias(c) for c in group_cols],
        F.lit(1).alias("dn"),
        F.col(f"new_{col_value}").alias("dv"),
    )
    keys = group_cols
    delta = (
        old_side.unionByName(new_side)
        .groupBy(*keys)
        .agg(F.sum("dn").alias("dn"), F.sum("dv").alias("dv"))
    )
    new_sum = F.coalesce(F.col("sum_value"), F.lit(0.0)) + F.coalesce(
        F.col("dv"), F.lit(0.0)
    )
    if round_scale is not None:
        new_sum = F.round(new_sum, round_scale)
    merged = rollup.join(delta, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("dn"), F.lit(0))
        ).cast("bigint").alias("n_rows"),
        new_sum.alias("sum_value"),
    )
    return merged.filter(F.col("n_rows") > 0)


def pair_counts_delta(
    old_baskets: DataFrame,
    delta: DataFrame,
    col_user: str = "user",
    col_item: str = "item",
) -> DataFrame:
    """Incremental maintenance for the item co-occurrence pair table —
    the quadratic intermediate behind item-item similarity, association
    rules and the co-occurrence graph. A full refresh recomputes every
    pair from every basket; this computes only the pairs the DELTA
    creates, which is what a 100 TB recommender actually reruns per
    ingestion cycle:

        new pairs(user) = (new items × existing basket)
                        ∪ (new items × new items, a < b)

    Input: ``old_baskets`` = (u, items array) as built by
    ``metrics.user_baskets``; ``delta`` = raw new (user, item) rows.
    Output: (ia, ib, d_common) canonical pair-count increments
    (ia < ib) — merge into the stored pair table with
    :func:`rollup_merge`-style addition (see ``merge_pair_counts``).

    Scale: one distinct on the delta, one join of the DELTA (not the
    corpus) against baskets on user, and pair fan-out proportional to
    |delta| × basket size — never all baskets × all baskets. Items
    already present in a user's basket are dropped first (set
    semantics, matching collect_set)."""
    d = (
        delta.select(
            F.col(col_user).alias("u"), F.col(col_item).alias("i")
        )
        .distinct()
    )
    with_basket = d.join(old_baskets, "u", "left").select(
        "u",
        "i",
        F.coalesce("items", F.array()).alias("items"),
    )
    genuinely_new = with_basket.filter(
        ~F.array_contains("items", F.col("i"))
    )
    # new × existing (basket explode is delta-scale: only touched users)
    cross_old = genuinely_new.select(
        "u", "i", F.explode("items").alias("j")
    )
    # new × new within the same user's delta
    n2 = genuinely_new.select("u", F.col("i").alias("j"))
    cross_new = (
        genuinely_new.select("u", "i")
        .join(n2, "u")
        .filter(F.col("i") < F.col("j"))
    )
    pairs = cross_old.select("i", "j").unionByName(
        cross_new.select("i", "j")
    )
    return (
        pairs.select(
            F.least("i", "j").alias("ia"),
            F.greatest("i", "j").alias("ib"),
        )
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("d_common"))
    )


def merge_pair_counts(
    old_pairs: DataFrame, delta_pairs: DataFrame
) -> DataFrame:
    """Merge pair-count increments into the stored pair table: one
    full-outer join on the canonical pair key, counts added with null
    as zero — the same diff-scale merge contract as ``rollup_merge``
    (the delta side is small; the join key is the pair, so AQE
    broadcast-joins the delta when it fits)."""
    return (
        old_pairs.withColumnRenamed("n_common", "old_n")
        .join(delta_pairs, ["ia", "ib"], "full")
        .select(
            "ia",
            "ib",
            (
                F.coalesce(F.col("old_n"), F.lit(0))
                + F.coalesce(F.col("d_common"), F.lit(0))
            ).alias("n_common"),
        )
    )


def merge_baskets(
    old_baskets: DataFrame,
    delta: DataFrame,
    col_user: str = "user",
    col_item: str = "item",
) -> DataFrame:
    """Roll the delta's items into the stored per-user baskets (union +
    dedup inside the array — one delta-scale aggregate + one join)."""
    d_items = (
        delta.select(F.col(col_user).alias("u"), F.col(col_item).alias("i"))
        .groupBy("u")
        .agg(F.collect_set("i").alias("d_items"))
    )
    return (
        old_baskets.join(d_items, "u", "full")
        .select(
            "u",
            F.array_distinct(
                F.concat(
                    F.coalesce("items", F.array()),
                    F.coalesce("d_items", F.array()),
                )
            ).alias("items"),
        )
    )


def user_erasure_audit(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    erase_ids: DataFrame,
) -> DataFrame:
    """Right-to-be-forgotten cascade audit: given a deletion set of
    customer keys, compute the referential cascade (customer → their
    orders → those orders' lineitems) and report, per table, rows
    before / deleted / after plus ``residual_refs`` — references to
    erased entities still reachable from the simulated post-deletion
    survivors, computed through an INDEPENDENT derivation of the
    closure (survivors are re-joined through the PARENT TABLES —
    orders→customer, lineitem→orders→erase-set — rather than through
    the same precomputed key lists the deletion used). When both
    derivations agree the residuals are zero; a bug in the cascade
    derivation (wrong join key, missed hop) surfaces as a nonzero
    residual — this is the self-check a production GDPR/CCPA pipeline
    runs against its separately-implemented deletion job.

    Entirely declarative — one returned plan, no driver-side counts.
    Scale shape: the deletion set and the cascaded order-key set are
    deletion-scale (broadcast when small, shuffle otherwise — no
    forced hint, AQE decides from real sizes); each table contributes
    one aggregate over a deletion-keyed left join plus one
    survivors-path residual aggregate. Deleted rows are only counted,
    never materialized."""
    eids = erase_ids.select(
        F.col(erase_ids.columns[0]).alias("eid")
    )
    del_orders = (
        orders.join(eids, orders.o_custkey == eids.eid, "left_semi")
        .select(F.col("o_orderkey").alias("del_okey"))
    )

    def counts(name, base, key_col, del_keys, del_col, residual_df):
        flagged = base.join(
            del_keys, base[key_col] == del_keys[del_col], "left"
        )
        agg = flagged.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_before"),
            # coalesce: an EMPTY table must report 0 deleted (sum over
            # zero rows is NULL, which would poison n_after too)
            F.coalesce(
                F.sum(
                    F.when(F.col(del_col).isNotNull(), 1).otherwise(0)
                ),
                F.lit(0),
            ).cast("bigint").alias("n_deleted"),
        )
        res = residual_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("residual_refs")
        )
        return agg.crossJoin(res).select(
            F.lit(name).alias("table_name"),
            "n_before",
            "n_deleted",
            (F.col("n_before") - F.col("n_deleted")).alias("n_after"),
            "residual_refs",
        )

    # simulated post-deletion survivors per table
    surv_cust = customer.join(
        eids, customer.c_custkey == eids.eid, "left_anti"
    )
    surv_orders = orders.join(
        eids, orders.o_custkey == eids.eid, "left_anti"
    )
    surv_li = lineitem.join(
        del_orders, lineitem.l_orderkey == del_orders.del_okey, "left_anti"
    )
    # INDEPENDENT residual paths: survivors re-joined through parent
    # tables, not the deletion key lists
    res_cust = surv_cust.join(
        eids, surv_cust.c_custkey == eids.eid, "left_semi"
    )
    erased_cust_rows = customer.join(
        eids, customer.c_custkey == eids.eid, "left_semi"
    ).select(F.col("c_custkey").alias("ec"))
    res_orders = surv_orders.join(
        erased_cust_rows, surv_orders.o_custkey == F.col("ec"), "left_semi"
    )
    res_li = (
        surv_li.join(
            orders, surv_li.l_orderkey == orders.o_orderkey, "inner"
        )
        .join(eids, F.col("o_custkey") == eids.eid, "left_semi")
    )

    return (
        counts("customer", customer, "c_custkey", eids, "eid", res_cust)
        .unionByName(
            counts("orders", orders, "o_custkey", eids, "eid", res_orders)
        )
        .unionByName(
            counts(
                "lineitem",
                lineitem,
                "l_orderkey",
                del_orders,
                "del_okey",
                res_li,
            )
        )
    )


def scd2_history(
    changes: DataFrame,
    col_key: str,
    col_attr: str,
    col_ts: str,
    col_tiebreak: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse a change-event
    stream (key, attribute, timestamp) into validity intervals —
    one row per (key, attribute VALUE run) with ``valid_from`` /
    ``valid_to`` / ``is_current`` / ``version`` — the dimension-history
    table every lakehouse warehouse maintains next to its facts (the
    reference has no dimension surface; this extends ``snapshot_diff``
    from "what changed between two snapshots" to "the full interval
    history from the change log").

    Semantics: within one (key, ts) the row with the highest
    ``col_tiebreak`` wins (a change log can carry several updates at
    one timestamp; the tiebreak makes the winner deterministic across
    engines). The ordering is made TOTAL by a final ``col_attr``
    ascending-nulls-first key, so even rows that tie on the tiebreak
    itself resolve identically on every engine and input order —
    supply a unique tiebreak (an ingest sequence / source offset) to
    make the winner semantically meaningful rather than merely
    deterministic. Consecutive equal values collapse into one interval
    (change detection via NULL-safe ``lag`` comparison, with the
    first row per key always opening an interval — so a NULL
    attribute is a value, not a wildcard). ``valid_to`` is the NEXT change's
    ``valid_from`` (half-open intervals, no gaps/overlaps by
    construction); the last interval per key has ``valid_to`` NULL and
    ``is_current`` = 1. ``version`` numbers intervals 1..n per key.

    Scale shape: everything is windowed PARTITION BY key — one shuffle
    on the key, then three codegen'd window passes at change-log
    scale; no self-join, no global window, output is bounded by the
    number of VALUE CHANGES (<< change-log rows for real dimensions).
    At 100 TB the change log is entity-keyed, so AQE coalesces the
    post-shuffle partitions and skewed hot entities split; the
    interval build itself never widens a row beyond (key, attr, ts).
    """
    from pyspark.sql.window import Window

    k, a, t, tb = col_key, col_attr, col_ts, col_tiebreak
    # per-(key, ts) winner WITHOUT a (key, ts)-partitioned window:
    # within the key partition ordered (ts ASC, tiebreak DESC), each
    # timestamp run's FIRST row is its winner — so every window in
    # this build partitions by the key alone and Catalyst reuses ONE
    # exchange for all three passes (a (k, t) window would force a
    # second shuffle)
    w_win = Window.partitionBy(k).orderBy(
        F.asc(t), F.desc(tb), F.asc_nulls_first(a)
    )
    latest = (
        changes.select(k, a, t, tb)
        .withColumn("_pt", F.lag(t).over(w_win))
        .filter(F.col("_pt").isNull() | (F.col("_pt") != F.col(t)))
        .drop("_pt", tb)
    )
    w_key = Window.partitionBy(k).orderBy(t)
    runs = (
        latest.withColumn("_pos", F.row_number().over(w_key))
        .withColumn("_prev", F.lag(a).over(w_key))
        .filter(
            (F.col("_pos") == 1)
            | ~F.col(a).eqNullSafe(F.col("_prev"))
        )
        .drop("_pos", "_prev")
    )
    return (
        runs.withColumn("_next_from", F.lead(t).over(w_key))
        .select(
            F.col(k).alias("key"),
            F.col(a).alias("attr_value"),
            F.col(t).cast("string").alias("valid_from"),
            F.col("_next_from").cast("string").alias("valid_to"),
            F.when(F.col("_next_from").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_current"),
            F.row_number().over(w_key).cast("bigint").alias("version"),
        )
        .orderBy("key", "valid_from")
    )
