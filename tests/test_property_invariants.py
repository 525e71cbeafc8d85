"""Property-based invariants (hypothesis): the algebraic contracts the
example-based tests can't sweep — incremental rollup maintenance must
equal a direct recompute for ARBITRARY snapshot pairs, and the Morton
key must interleave bits exactly for arbitrary coordinates.

Spark jobs are slow per example, so the strategies draw small composite
cases (a whole snapshot pair per example) and run few, large examples
rather than many tiny ones."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from recmetrics_pyspark_spark.operators.cdc import rollup_merge, snapshot_diff
from recmetrics_pyspark_spark.sources.sinks import zorder_value


def _morton(x: int, y: int) -> int:
    r = 0
    for i in range(16):
        r |= ((x >> i) & 1) << (2 * i)
        r |= ((y >> i) & 1) << (2 * i + 1)
    return r


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_zorder_matches_reference_for_arbitrary_coords(spark, coords):
    df = spark.createDataFrame(coords, "x long, y long")
    got = df.select("x", "y", zorder_value("x", "y").alias("z")).collect()
    for row in got:
        assert row.z == _morton(row.x, row.y)


_snapshot = st.lists(
    st.tuples(
        st.integers(1, 12),                      # pk (forced overlap)
        st.sampled_from(["a", "b", "c"]),        # group
        st.integers(0, 50).map(float),           # value
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None)
@given(old_rows=_snapshot, new_rows=_snapshot)
def test_rollup_merge_equals_direct_recompute(spark, old_rows, new_rows):
    """For ANY pair of keyed snapshots: applying snapshot_diff deltas
    to the old rollup must reproduce the new snapshot's rollup exactly
    (groups vanish when empty, appear when new, move when rows move)."""
    schema = "pk long, g string, v double"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
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
