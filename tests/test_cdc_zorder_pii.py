"""Operator-level tests for the round-2 lakehouse additions: snapshot
CDC diff, Z-order layout, and PII redaction."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from recmetrics_pyspark_spark.operators.cdc import snapshot_diff
from recmetrics_pyspark_spark.functions.text import redact_pii
from recmetrics_pyspark_spark.sources.io import load_table
from recmetrics_pyspark_spark.sources.sinks import zorder_compact, zorder_value

SF_DIR = "/root/testdata/sf0.001"


def test_snapshot_diff_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", None)],
        "pk long, s string, v double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 value-updated, 3 deleted, 4 NULL->value update,
        # 5 inserted
        [(1, "a", 10.0), (2, "b", 21.0), (4, "d", 40.0), (5, "e", 50.0)],
        "pk long, s string, v double",
    )
    rows = {
        r.pk: r.change_type
        for r in snapshot_diff(old, new, ["pk"], ["s", "v"]).collect()
    }
    assert rows == {2: "update", 3: "delete", 4: "update", 5: "insert"}
    with_unchanged = snapshot_diff(
        old, new, ["pk"], ["s", "v"], include_unchanged=True
    )
    assert with_unchanged.count() == 5
    upd = (
        snapshot_diff(old, new, ["pk"], ["s", "v"])
        .filter(F.col("pk") == 2)
        .collect()[0]
    )
    assert upd.old_v == 20.0 and upd.new_v == 21.0


def test_zorder_value_matches_reference_interleave(spark):
    df = spark.range(64).select(
        ((F.col("id") * 37) % 65536).alias("x"),
        ((F.col("id") * 101) % 65536).alias("y"),
    )
    got = df.select("x", "y", zorder_value("x", "y").alias("z")).collect()

    def morton(x: int, y: int) -> int:
        r = 0
        for i in range(16):
            r |= ((x >> i) & 1) << (2 * i)
            r |= ((y >> i) & 1) << (2 * i + 1)
        return r

    for row in got:
        assert row.z == morton(row.x, row.y)


def test_zorder_compact_tightens_file_ranges(spark, tmp_path):
    """Z-ordered files must each cover a small rectangle of (x, y):
    the mean per-file key span should be far below the global span,
    on BOTH dimensions (that is the data-skipping contract)."""
    # comparable-cardinality dimensions (sf0.001 has only 10 distinct
    # suppliers, which would leave nothing for the y bits to separate)
    li = load_table(spark, SF_DIR, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"),
        (F.col("l_orderkey") % 256).alias("y"),
    )
    path = str(tmp_path / "zordered")
    zorder_compact(li, path, "x", "y", max_records_per_file=500)
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) >= 4

    spans_x, spans_y = [], []
    for f in files:
        md = pq.read_metadata(f)
        lo_x = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        hi_x = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        lo_y = min(
            md.row_group(i).column(1).statistics.min
            for i in range(md.num_row_groups)
        )
        hi_y = max(
            md.row_group(i).column(1).statistics.max
            for i in range(md.num_row_groups)
        )
        spans_x.append(hi_x - lo_x)
        spans_y.append(hi_y - lo_y)
    stats = li.agg(
        (F.max("x") - F.min("x")).alias("gx"),
        (F.max("y") - F.min("y")).alias("gy"),
    ).collect()[0]
    # random layout would give ~full span per file on both dims
    assert sum(spans_x) / len(spans_x) < 0.5 * stats.gx
    assert sum(spans_y) / len(spans_y) < 0.5 * stats.gy


def test_redact_pii_masks_and_counts(spark):
    s = (
        "word contact u123@mail.example.com from 10.57.0.1 "
        "call +1-555-0123 cc admin@ex.org"
    )
    df = spark.createDataFrame([(1, s), (2, "no pii here")],
                               "doc_id long, text string")
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert rows[1].redacted == (
        "word contact [EMAIL] from [IP] call [PHONE] cc [EMAIL]"
    )
    assert (rows[1].n_emails, rows[1].n_ips, rows[1].n_phones) == (2, 1, 1)
    assert rows[2].redacted == "no pii here"
    assert (rows[2].n_emails, rows[2].n_ips, rows[2].n_phones) == (0, 0, 0)


def test_rollup_merge_handles_group_moves(spark):
    from recmetrics_pyspark_spark.operators.cdc import (
        rollup_merge,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "pk long, g string, v double",
    )
    new = spark.createDataFrame(
        # pk2 moves group a->b AND changes value; pk3 deleted;
        # pk4 inserted into a fresh group c
        [(1, "a", 10.0), (2, "b", 25.0), (4, "c", 40.0)],
        "pk long, g string, v double",
    )
    rollup = old.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_value")
    )
    diff = snapshot_diff(old, new, ["pk"], ["g", "v"])
    merged = {
        r.g: (r.n_rows, r.sum_value)
        for r in rollup_merge(rollup, diff, ["g"], "v").collect()
    }
    direct = {
        r.g: (r.n_rows, r.sum_value)
        for r in new.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("v"), 2).alias("sum_value"),
        )
        .collect()
    }
    assert merged == direct
    # group b gained the moved row, group c appeared, empty groups gone
    assert merged["b"] == (1, 25.0) and merged["c"] == (1, 40.0)


def test_incremental_pair_counts_equal_full_recompute(spark):
    """The invariant that makes the incremental path trustworthy:
    baskets+pairs maintained through two delta cycles equal the batch
    pair pipeline on the full interaction set."""
    from recmetrics_pyspark_spark.operators.cdc import (
        merge_baskets,
        merge_pair_counts,
        pair_counts_delta,
    )
    from recmetrics_pyspark_spark.operators.metrics import (
        item_cooccurrence_pairs,
        user_baskets,
    )

    base = [(u, i) for u in range(6) for i in range(u % 4 + 1)]
    d1 = [(0, 7), (0, 8), (1, 7), (5, 0), (5, 7)]
    d2 = [(0, 9), (2, 7), (0, 7), (3, 3)]  # (0,7) and (3,3) are repeats
    full = base + d1 + d2

    def canon(pairs_df, min_common=1):
        return sorted(
            (r["ia"], r["ib"], r["n_common"])
            for r in pairs_df.collect()
            if r["n_common"] >= min_common
        )

    baskets = user_baskets(
        spark.createDataFrame(base, ["user", "item"]), "user", "item"
    )
    pairs, _ = item_cooccurrence_pairs(
        spark.createDataFrame(base, ["user", "item"]),
        "user", "item", min_common=1,
    )
    for drows in (d1, d2):
        ddf = spark.createDataFrame(drows, ["user", "item"])
        pairs = merge_pair_counts(pairs, pair_counts_delta(baskets, ddf))
        baskets = merge_baskets(baskets, ddf)
    want, _ = item_cooccurrence_pairs(
        spark.createDataFrame(full, ["user", "item"]),
        "user", "item", min_common=1,
    )
    assert canon(pairs) == canon(want)
    # and the maintained baskets equal the batch baskets
    got_b = {
        r["u"]: frozenset(r["items"])
        for r in baskets.collect()
    }
    want_b = {
        r["u"]: frozenset(r["items"])
        for r in user_baskets(
            spark.createDataFrame(full, ["user", "item"]), "user", "item"
        ).collect()
    }
    assert got_b == want_b


def test_user_erasure_cascade_hand_computed(spark):
    """Erasing c2 cascades to their order o20 and its lineitems; the
    computed residual_refs must be zero for every table."""
    from recmetrics_pyspark_spark.operators.cdc import user_erasure_audit

    cust = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["c_custkey", "c_name"]
    )
    orders = spark.createDataFrame(
        [(10, 1), (20, 2), (21, 2), (30, 3)],
        ["o_orderkey", "o_custkey"],
    )
    li = spark.createDataFrame(
        [(10, 1), (20, 1), (20, 2), (21, 1), (30, 1)],
        ["l_orderkey", "l_linenumber"],
    )
    erase = spark.createDataFrame([(2,)], ["c_custkey"])
    out = {
        r.table_name: (r.n_before, r.n_deleted, r.n_after, r.residual_refs)
        for r in user_erasure_audit(cust, orders, li, erase).collect()
    }
    assert out == {
        "customer": (3, 1, 2, 0),
        "orders": (4, 2, 2, 0),
        "lineitem": (5, 3, 2, 0),
    }
