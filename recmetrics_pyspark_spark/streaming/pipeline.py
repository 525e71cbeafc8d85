"""Structured Streaming plumbing: sources, watermarks, stateful dedup,
and a test/debug memory sink runner.

Streams are just unbounded DataFrames here — every operator in
``streaming.windows`` composes onto either. Late data policy is a
watermark (state cleanup + late-row drop); duplicate delivery is
handled by ``dropDuplicatesWithinWatermark`` (bounded state, unlike a
global dropDuplicates on a stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import equi_width_bin


def stream_events(
    spark: SparkSession, events_dir: str, schema=None
) -> DataFrame:
    """File-based stream over an events parquet directory. The driver
    testdata ships single files; for a stream source pass a directory
    into which files arrive (tests stage chunks into a tmp dir)."""
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def ensure_event_time(df: DataFrame, col_ts: str = "ts") -> DataFrame:
    """Watermarks require TIMESTAMP (with local-tz semantics); parquet
    event time often arrives as TIMESTAMP_NTZ. Cast it here — under the
    engine's UTC session timezone the instant is unchanged."""
    if dict(df.dtypes).get(col_ts) == "timestamp_ntz":
        df = df.withColumn(col_ts, F.col(col_ts).cast("timestamp"))
    return df


def with_watermark(
    df: DataFrame, col_ts: str = "ts", delay: str = "30 minutes"
) -> DataFrame:
    """Late-data policy: rows later than max(event time) − delay are
    dropped from stateful ops, and window/session state older than the
    watermark is evicted — this is what bounds state at 100 TB/day."""
    return ensure_event_time(df, col_ts).withWatermark(col_ts, delay)


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    col_ts: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates of a key are
    suppressed as long as they arrive within the watermark horizon."""
    return with_watermark(df, col_ts, delay).dropDuplicatesWithinWatermark(keys)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right rows within [left_ts − interval,
    left_ts]. Both sides get watermarks and the join carries an explicit
    event-time range, so Spark can bound the join state — without the
    range condition, stream-stream state grows forever."""
    lw = with_watermark(left, left_ts, watermark)
    rw = with_watermark(right, right_ts, watermark)
    lcol, rcol = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return lw.alias("l").join(
        rw.alias("r"),
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rcol >= lcol - F.expr(f"INTERVAL {interval}"))
        & (rcol <= lcol),
    )


def foreach_batch_parquet(stream_df: DataFrame, path: str, checkpoint: str):
    """Incremental parquet sink via foreachBatch: each micro-batch is
    appended as its own commit — the pattern for sinks that need custom
    write logic (merge, upsert, multi-table) beyond writeStream.format."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
):
    """Run a streaming query into the in-memory sink and block until all
    available input is processed; returns the StreamingQuery (stop it and
    read ``spark.table(query_name)``). Test/debug only — real sinks are
    parquet/kafka/console via the same writeStream surface."""
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.processAllAvailable()
    return q


def foreach_batch_rollup(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    group_cols: list[str],
    col_value: str = "value",
):
    """Streaming materialized-view maintenance: every micro-batch is
    reduced to a GROUP-scale (count, sum) delta and merged into the
    rollup stored at ``path`` — the streaming twin of
    ``operators/cdc.py::rollup_merge`` for append-only streams.

    Per batch: one shuffle of the BATCH (delta aggregate), one
    group-scale read-merge-write of the stored rollup. The corpus is
    never rescanned — at 100 TB/day the refresh cost tracks the batch
    size, which is the whole point of incremental view maintenance.

    Crash safety (not just happy-path exactly-once):

    - foreachBatch may retry a batch, so the merge is guarded by a
      batch-id high-water mark stored with the rollup (idempotent
      re-merge).
    - Each merge writes a NEW snapshot directory ``v_<batch_id>`` under
      ``path`` and then atomically flips the ``_CURRENT`` pointer file
      (``os.replace``); a crash mid-write leaves the previous snapshot
      intact and pointed-to, never a half-deleted rollup (the previous
      overwrite-in-place could lose the whole view on a mid-overwrite
      crash). Read the view back with :func:`read_rollup`.
    - Only a missing ``_CURRENT`` pointer means "first batch"; any
      other failure reading the existing rollup re-raises, instead of
      silently reinitializing the view from one batch's delta.

    The pointer flip relies on POSIX-atomic rename, i.e. a
    local/NFS-like fs (this engine's test surface). On an object store,
    swap the sink for a transactional table format (Delta/Iceberg) —
    same merge logic, table-format commit instead of the pointer."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as SF

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.groupBy(*group_cols).agg(
            SF.count(SF.lit(1)).alias("n_rows"),
            SF.sum(col_value).alias("sum_value"),
        )
        ptr = _os.path.join(path, "_CURRENT")
        current = None
        if _os.path.exists(ptr):
            with open(ptr) as fh:
                current = fh.read().strip()
            # any failure past this point is corruption, not first-batch:
            # let it propagate rather than zeroing accumulated state
            existing = spark.read.parquet(_os.path.join(path, current))
            seen = existing.agg(SF.max("_last_batch")).collect()[0][0]
            if seen is not None and batch_id <= seen:
                return  # retry of an already-merged batch: no-op
            merged = (
                existing.drop("_last_batch")
                .unionByName(delta)
                .groupBy(*group_cols)
                .agg(
                    SF.sum("n_rows").cast("bigint").alias("n_rows"),
                    SF.round(SF.sum("sum_value"), 6).alias("sum_value"),
                )
            )
        else:  # first batch: no rollup yet
            merged = delta.select(
                *group_cols,
                SF.col("n_rows").cast("bigint"),
                SF.round("sum_value", 6).alias("sum_value"),
            )
        out = merged.withColumn("_last_batch", SF.lit(batch_id))
        snap = f"v_{batch_id}"
        out.write.mode("overwrite").parquet(_os.path.join(path, snap))
        tmp_ptr = ptr + ".tmp"
        with open(tmp_ptr, "w") as fh:
            fh.write(snap)
        _os.replace(tmp_ptr, ptr)  # atomic flip
        # prune superseded snapshots (keep the one just written)
        for d in _os.listdir(path):
            if d.startswith("v_") and d != snap:
                _shutil.rmtree(_os.path.join(path, d), ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_rollup(spark, path: str) -> DataFrame:
    """Resolve the current snapshot of a :func:`foreach_batch_rollup`
    materialized view: reads the ``_CURRENT`` pointer and loads the
    snapshot directory it names."""
    import os as _os

    with open(_os.path.join(path, "_CURRENT")) as fh:
        snap = fh.read().strip()
    return spark.read.parquet(_os.path.join(path, snap))


def baseline_histogram(
    df: DataFrame,
    col_group: str = "event_type",
    col_value: str = "value",
    n_bins: int = 10,
) -> DataFrame:
    """Reference distribution for :func:`foreach_batch_drift`: per-group
    Laplace-smoothed bin shares over GLOBAL equi-width bins (edges from
    the baseline's min/max — carried on every row so the monitor bins
    incoming batches identically). Same smoothing and binning as the
    batch ``psi_drift`` operator; group×bin rows, broadcast-scale."""
    if n_bins < 3:
        raise ValueError(
            "baseline_histogram needs n_bins >= 3 (constant-baseline "
            "separation, see equi_width_bin)"
        )
    stats = df.agg(
        F.min(col_value).alias("v_lo"), F.max(col_value).alias("v_hi")
    )
    binned = (
        df.select(col_group, col_value)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(col_group).alias("grp"),
            "v_lo",
            "v_hi",
            # shared rule incl. degenerate-range semantics — see
            # operators/quality.py::equi_width_bin (the batch twin)
            equi_width_bin(
                F.col(col_value), F.col("v_lo"), F.col("v_hi"), n_bins
            ).alias("bin"),
        )
    )
    # NULL bins excluded from counts and totals (same missingness
    # rule as batch psi_drift)
    counts = (
        binned.filter(F.col("bin").isNotNull())
        .groupBy("grp", "v_lo", "v_hi", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy("grp").agg(F.sum("n").alias("tot"))
    slots = (
        counts.select("grp", "v_lo", "v_hi").distinct()
        .join(totals, "grp")
        .crossJoin(
            F.broadcast(
                df.sparkSession.range(n_bins).select(
                    F.col("id").cast("int").alias("bin")
                )
            )
        )
    )
    return (
        slots.join(counts, ["grp", "v_lo", "v_hi", "bin"], "left")
        .select(
            "grp",
            "v_lo",
            "v_hi",
            "bin",
            (
                (F.coalesce(F.col("n"), F.lit(0)) + 0.5)
                / (F.col("tot") + 0.5 * n_bins)
            ).alias("p_ref"),
        )
    )


def foreach_batch_drift(
    stream_df: DataFrame,
    baseline: DataFrame,
    path: str,
    checkpoint: str,
    col_group: str = "event_type",
    col_value: str = "value",
    n_bins: int = 10,
    alert_at: float = 0.2,
):
    """Streaming drift monitor: every micro-batch is binned against the
    frozen baseline edges and scored with PSI per group; one monitoring
    row (batch_id, group, n_events, psi, drift_alert) per group per
    batch is APPENDED to ``path`` — the always-on twin of the batch
    ``psi_drift`` gate, for feeds where you want the alert per arrival
    rather than per table rebuild.

    The baseline is materialized once on the driver side (group×bin
    rows) and re-broadcast into each micro-batch; per-batch work is one
    aggregate at batch×group×bin scale. Append mode + checkpoint give
    the usual at-least-once monitoring-sink semantics; rows carry
    batch_id so replays are idempotent to readers that dedup on
    (batch_id, group)."""
    if n_bins < 3:
        raise ValueError(
            "foreach_batch_drift needs n_bins >= 3 (constant-baseline "
            "separation, see equi_width_bin)"
        )
    ref = baseline.persist()
    ref.count()
    spark = stream_df.sparkSession

    def monitor(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        binned = (
            batch_df.select(col_group, col_value)
            .join(
                F.broadcast(ref.select("grp", "v_lo", "v_hi").distinct()),
                F.col(col_group) == F.col("grp"),
            )
            .select(
                "grp",
                # shared rule; a batch drifted away from a CONSTANT
                # baseline separates into an edge bin (the baseline
                # sits in bin 1) so the monitor ALERTS instead of
                # going blind; out-of-range values clamp to the edges
                equi_width_bin(
                    F.col(col_value), F.col("v_lo"), F.col("v_hi"),
                    n_bins,
                ).alias("bin"),
            )
        )
        counts = (
            binned.filter(F.col("bin").isNotNull())
            .groupBy("grp", "bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        totals = counts.groupBy("grp").agg(F.sum("n").alias("tot"))
        shares = (
            ref.join(totals, "grp")
            .join(counts, ["grp", "bin"], "left")
            .select(
                "grp",
                "p_ref",
                (
                    (F.coalesce(F.col("n"), F.lit(0)) + 0.5)
                    / (F.col("tot") + 0.5 * n_bins)
                ).alias("p_cur"),
                "tot",
            )
        )
        out = (
            shares.groupBy("grp", "tot")
            .agg(
                F.round(
                    F.sum(
                        (F.col("p_cur") - F.col("p_ref"))
                        * F.log(F.col("p_cur") / F.col("p_ref"))
                    ),
                    6,
                ).alias("psi")
            )
            .select(
                F.lit(batch_id).alias("batch_id"),
                F.col("grp").alias(col_group),
                F.col("tot").cast("bigint").alias("n_events"),
                "psi",
                (F.col("psi") > alert_at).alias("drift_alert"),
            )
        )
        out.write.mode("append").parquet(path)

    return (
        stream_df.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def foreach_batch_neardup(
    stream_docs: DataFrame,
    state_path: str,
    decisions_path: str,
    checkpoint: str,
    col_id: str = "doc_id",
    col_text: str = "text",
    min_est: float = 0.5,
):
    """Streaming near-dup ingest: each micro-batch is classified
    against the accumulated MinHash/LSH signature index
    (``operators.dedup.incremental_neardup``), its decisions land in
    ``decisions_path``, and ALL batch rows' signatures append to the
    index so later batches see them — the streaming deployment of the
    batch operator, state never re-shingles history.

    Crash safety / retry idempotence: both the index rows and the
    decisions of batch N are written to ``batch=N`` subdirectories
    with mode=overwrite, so a foreachBatch RETRY of the same batch id
    rewrites the same directories instead of double-appending — the
    directory layout is the idempotence mechanism (the same reasoning
    as foreach_batch_rollup's snapshot+pointer, but append-structured
    state allows plain per-batch partitions). Readers take the union
    of ``batch=*``. The classify step reads the index with
    ``basePath=state_path`` and filters ``batch < batch_id``: a retry
    of batch N (crash between the state write and the checkpoint
    commit) must NOT see batch N's own signatures from the failed
    attempt, or every retried doc would match itself and flip 'new' →
    'near_dup' — the filter makes the retry read exactly what the
    first attempt read.

    Per-batch cost: batch-scale shingling + one bucket join against
    the stored index (read as one parquet scan over the batch= dirs,
    prunable by the runtime bloom filter on bucket keys)."""
    def classify_batch(batch_df: DataFrame, batch_id: int) -> None:
        classify_neardup_batch(
            batch_df,
            batch_id,
            state_path,
            decisions_path,
            col_id,
            col_text,
            min_est,
        )

    return (
        stream_docs.writeStream.foreachBatch(classify_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def classify_neardup_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    decisions_path: str,
    col_id: str = "doc_id",
    col_text: str = "text",
    min_est: float = 0.5,
) -> None:
    """One micro-batch step of :func:`foreach_batch_neardup`, exposed
    module-level so the retry path is directly testable: calling it
    again with the same ``batch_id`` (a foreachBatch retry after a
    crash between the state write and the checkpoint commit) must
    produce byte-identical decisions."""
    import os as _os

    from ..operators.dedup import incremental_neardup, lsh_index

    spark = batch_df.sparkSession
    batch_df = batch_df.persist()
    try:
        if batch_df.isEmpty():
            return
        # explicit existence probe (NOT a bare except around the
        # read — any real read failure must propagate, the same
        # crash-safety rule as foreach_batch_rollup): "no state"
        # means no batch=* directory BELOW this batch id exists yet
        import glob as _glob

        batch_dirs = _glob.glob(_os.path.join(state_path, "batch=*"))
        have_prior = any(
            int(p.rsplit("batch=", 1)[-1]) < batch_id for p in batch_dirs
        )
        if have_prior:
            # basePath makes `batch` a partition column; the filter
            # excludes this batch's own signatures left by a failed
            # prior attempt (retry idempotence — see the
            # foreach_batch_neardup docstring) and is
            # partition-pruned, so a retry never even scans the
            # stale directory.
            index = (
                spark.read.option("basePath", state_path)
                .parquet(_os.path.join(state_path, "batch=*"))
                .filter(F.col("batch") < F.lit(batch_id))
                .drop("batch")
            )
            decisions = incremental_neardup(
                batch_df, index, col_id, col_text, min_est=min_est
            )
        else:
            decisions = batch_df.select(
                F.col(col_id),
                F.lit("new").alias("status"),
                # match the id column's type, whatever it is — a
                # hardcoded long would make later batches' string
                # match_id mis-merge on the union read
                F.lit(None)
                .cast(batch_df.schema[col_id].dataType)
                .alias("match_id"),
                F.lit(None).cast("double").alias("est_jaccard"),
            )
        decisions.write.mode("overwrite").parquet(
            _os.path.join(decisions_path, f"batch={batch_id}")
        )
        lsh_index(batch_df, col_id, col_text).write.mode(
            "overwrite"
        ).parquet(_os.path.join(state_path, f"batch={batch_id}"))
    finally:
        batch_df.unpersist()
