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


def test_min_label_components_contract_both_sides(spark):
    """Pin the documented convergence contract exactly: fixed iters=4
    labels every node within 4 hops of its component's min-id node
    (dense near-dup clusters), and does NOT fully merge a path longer
    than that — while until_converged reaches the unique fixpoint on
    the same pathological chain."""
    import random

    from recmetrics_pyspark_spark.operators.dedup import (
        min_label_components,
    )

    rng = random.Random(7)
    n = 20
    ids = list(range(100, 100 + n))
    rng.shuffle(ids)
    chain = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], ["src", "dst"]
    )
    # fixed iters: a 19-hop path must NOT collapse to one label (the
    # min sits at a random position; radius-4 coverage can reach at
    # most 9 of 20 nodes) — this is the documented boundary, so a
    # future "optimization" that silently changes it fails here
    fixed = {
        r["node"]: r["label"]
        for r in min_label_components(edges, iters=4).collect()
    }
    assert len(set(fixed.values())) > 1
    # every label must still be exact within the radius: the min id
    # labels all nodes within 4 hops of it along the chain
    pos = {v: i for i, v in enumerate(ids)}
    mn = min(ids)
    for node, lab in fixed.items():
        if abs(pos[node] - pos[mn]) <= 4:
            assert lab == mn
    # until_converged: the same chain reaches the unique fixpoint
    conv = {
        r["node"]: r["label"]
        for r in min_label_components(edges, until_converged=True).collect()
    }
    assert set(conv.values()) == {mn}


def test_min_label_components_dense_cluster_fast(spark):
    """A star/dense cluster (the realistic near-dup shape, diameter 2)
    is fully labeled in the default fixed rounds, alongside a disjoint
    triangle keeping its own label."""
    from recmetrics_pyspark_spark.operators.dedup import (
        min_label_components,
    )

    star = [(50, x) for x in (51, 52, 53, 54)]
    tri = [(1, 2), (2, 3), (3, 1)]
    und = star + tri
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    labels = {
        r["node"]: r["label"]
        for r in min_label_components(edges, iters=4).collect()
    }
    assert {labels[i] for i in (50, 51, 52, 53, 54)} == {50}
    assert {labels[i] for i in (1, 2, 3)} == {1}


def _canon_labels(rows):
    """Canonicalize a (node, label) labeling to frozenset components."""
    comp = {}
    for r in rows:
        comp.setdefault(r["label"], set()).add(r["node"])
    return frozenset(frozenset(s) for s in comp.values())


def test_star_components_equals_propagation_on_random_graphs(spark):
    import random

    from recmetrics_pyspark_spark.operators.dedup import (
        min_label_components,
    )
    from recmetrics_pyspark_spark.operators.graph import star_components

    rng = random.Random(17)
    edges = []
    # 3 disjoint random blobs over shuffled, non-contiguous ids
    for blk in range(3):
        ids = [blk * 1000 + rng.randrange(500) for _ in range(40)]
        for _ in range(60):
            a, b = rng.choice(ids), rng.choice(ids)
            if a != b:
                edges.append((a, b))
    df = spark.createDataFrame(edges, ["src", "dst"])
    sym = df.union(df.select("dst", "src"))
    want = _canon_labels(
        min_label_components(sym, until_converged=True).collect()
    )
    got = _canon_labels(star_components(df).collect())
    assert got == want
    # star labels are component minima
    for r in star_components(df).collect():
        assert r["label"] <= r["node"]


def test_star_components_chain_beats_propagation_bound(spark):
    """A 40-node chain: fixed-iters propagation (iters=4) must NOT
    fully merge it (the documented diameter bound), star contraction
    must — in far fewer than diameter rounds (log-depth contract)."""
    from recmetrics_pyspark_spark.operators.dedup import (
        min_label_components,
    )
    from recmetrics_pyspark_spark.operators.graph import star_components

    # shuffled ids so monotone-id shortcuts can't help
    import random

    rng = random.Random(5)
    ids = list(range(100, 140))
    rng.shuffle(ids)
    chain = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    sym = df.union(df.select("dst", "src"))
    partial = min_label_components(sym, iters=4).collect()
    assert len({r["label"] for r in partial}) > 1  # not yet merged
    full = star_components(df, max_rounds=10).collect()
    labels = {r["label"] for r in full}
    assert labels == {min(ids)}  # one component, min-id root
    assert {r["node"] for r in full} == set(ids)


def test_dsum_is_partitioning_invariant(spark):
    """The decimal-aggregation claim: the SAME rows under different
    partitionings (different partial-aggregation orders) produce the
    BIT-IDENTICAL sum — where a plain double sum is allowed to differ
    in the last ulp."""
    from recmetrics_pyspark_spark.plans.relational import dsum
    from recmetrics_pyspark_spark.sources.io import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    expr = li.l_extendedprice * (1 - li.l_discount)
    vals = []
    for parts in (1, 7, 64):
        v = (
            li.repartition(parts)
            .agg(dsum(expr).alias("s"))
            .collect()[0]["s"]
        )
        vals.append(v)
    assert vals[0] == vals[1] == vals[2]  # exact, not approx


def test_popularity_concentration_bounds_and_extremes(spark):
    from recmetrics_pyspark_spark.operators.metrics import (
        popularity_concentration,
    )

    # uniform popularity -> gini 0, ECS = catalog size
    uniform = spark.createDataFrame(
        [(u, i) for u in range(4) for i in range(5)], ["person", "product"]
    )
    r = popularity_concentration(uniform).collect()[0]
    assert r["n_items"] == 5
    assert abs(r["gini"]) < 1e-9
    assert abs(r["effective_catalog_size"] - 5.0) < 1e-6
    # one blockbuster + rare tail -> high gini, ECS far below catalog
    skewed = spark.createDataFrame(
        [(u, 0) for u in range(96)] + [(0, i) for i in range(1, 5)],
        ["person", "product"],
    )
    s = popularity_concentration(skewed).collect()[0]
    assert s["n_items"] == 5
    assert s["gini"] > 0.7
    assert s["effective_catalog_size"] < 2.0
