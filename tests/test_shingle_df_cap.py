"""Pin the df-cap semantics of the exact-Jaccard family and the
size-guarded join strategies added for 100 TB hygiene:

- capped_shingles / ngram_jaccard_pairs: shingles with document
  frequency > max_df contribute NOTHING — not to pairs, not to |A|/|B|
  — so Jaccard is self-consistent over the capped universe, and a
  document whose every shingle is hot has no near-duplicates at all.
- minhash_lsh_pairs' candidate broadcast and min_label_components'
  per-round label broadcast are size-guarded: both the broadcast and
  the shuffle-fallback branches must produce identical results.
"""

from __future__ import annotations

from recmetrics_pyspark_spark.operators.dedup import (
    min_label_components,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)


def _docs(spark):
    # "a b c" appears in all 4 docs (df=4); every other shingle has
    # df <= 2. Hand-computed Jaccards below.
    rows = [
        (1, "a b c p q r"),
        (2, "a b c p q s"),
        (3, "a b c m n o"),
        (4, "a b c u v w"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_max_df_cut_engages(spark):
    docs = _docs(spark)
    # Uncapped: every pair shares "a b c" -> 6 pairs.
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.0, max_df=None).collect()
    }
    assert len(full) == 6
    # d1={abc,bcp,cpq,pqr}, d2={abc,bcp,cpq,pqs}: 3/(4+4-3)
    assert full[(1, 2)] == round(3 / 5, 6)
    assert full[(1, 3)] == round(1 / 7, 6)

    # max_df=3 drops "a b c" (df=4). Capped universes are the 3
    # per-doc tail shingles; only (1,2) still shares any: 2/(3+3-2).
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.0, max_df=3).collect()
    }
    assert capped == {(1, 2): 0.5}


def test_all_hot_doc_drops_out(spark):
    # With max_df=1 every shared shingle is hot -> no doc retains a
    # shared shingle, so the pair table is empty (docs with zero
    # surviving shingles simply have no near-duplicates).
    docs = _docs(spark)
    assert ngram_jaccard_pairs(docs, threshold=0.0, max_df=1).count() == 0


def test_lsh_broadcast_guard_branches(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "entirely different words live in this sentence here"),
            (4, "entirely different words live in that sentence here"),
        ],
        ["doc_id", "text"],
    )

    def rows(limit):
        return sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in minhash_lsh_pairs(
                docs, threshold=0.1, broadcast_pair_limit=limit
            ).collect()
        )

    broadcast_rows = rows(5_000_000)  # default: broadcast branch
    shuffle_rows = rows(0)  # force the shuffle-join fallback
    assert broadcast_rows == shuffle_rows
    assert len(broadcast_rows) >= 1  # the near-dup pairs were found


def test_min_label_components_broadcast_guard(spark):
    edges_rows = [(1, 2), (2, 1), (2, 3), (3, 2), (10, 11), (11, 10)]
    edges = spark.createDataFrame(edges_rows, ["src", "dst"])

    def labels(limit):
        return sorted(
            (r.node, r.label)
            for r in min_label_components(
                edges, iters=4, broadcast_node_limit=limit
            ).collect()
        )

    expect = [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]
    assert labels(2_000_000) == expect  # broadcast branch
    assert labels(0) == expect  # shuffle fallback


def test_adamic_adar_broadcast_guard_branches(spark):
    from recmetrics_pyspark_spark.operators.graph import adamic_adar_links

    # path 1-2-3 plus a disjoint edge: the degree-table broadcast must
    # produce the same predictions as the shuffle-join fallback
    pairs = spark.createDataFrame(
        [(1, 2, 3.0), (2, 3, 5.0), (10, 11, 1.0)], ["ia", "ib", "sim"]
    )

    def rows(limit):
        return sorted(
            (r.item_a, r.item_b, r.aa_score, r.rnk)
            for r in adamic_adar_links(
                pairs, col_w="sim", broadcast_node_limit=limit
            ).collect()
        )

    broadcast_rows = rows(2_000_000)
    shuffle_rows = rows(0)
    assert broadcast_rows == shuffle_rows
    assert len(broadcast_rows) == 1  # the missing (1,3) link


def test_common_neighbor_broadcast_guard_branches(spark):
    from recmetrics_pyspark_spark.operators.graph import (
        common_neighbor_links,
    )

    # square 1-2-3-4-1: diagonals (1,3) and (2,4) each share 2 common
    # neighbors; identical output from both join strategies
    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (1, 4, 1.0)],
        ["ia", "ib", "sim"],
    )

    def rows(limit):
        return sorted(
            (r.item_a, r.item_b, r.n_common_nbrs, r.jaccard_nbrs, r.rnk)
            for r in common_neighbor_links(
                pairs, col_w="sim", broadcast_node_limit=limit
            ).collect()
        )

    broadcast_rows = rows(2_000_000)
    shuffle_rows = rows(0)
    assert broadcast_rows == shuffle_rows
    assert [(a, b, n) for a, b, n, _, _ in broadcast_rows] == [
        (1, 3, 2),
        (2, 4, 2),
    ]


def test_containment_catches_quoted_inclusion(spark):
    """A short doc quoted verbatim inside a longer one: containment 1.0
    while Jaccard is low — exactly the case the asymmetric measure
    exists for."""
    from recmetrics_pyspark_spark.operators.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon"
    long_doc = (
        "intro words before the quote "
        + quote
        + " trailing words after the quote continue for a while more"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "entirely unrelated text here")],
        ["doc_id", "text"],
    )
    rows = containment_pairs(docs, threshold=0.8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment == 1.0  # every shingle of doc 1 is in doc 2
    assert r.jaccard < 0.5  # symmetric measure would have missed it


from hypothesis import given, settings, strategies as st

_doc_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=30),
        st.lists(
            st.sampled_from("abcdefgh"), min_size=3, max_size=12
        ).map(" ".join),
    ),
    min_size=2,
    max_size=12,
    unique_by=lambda r: r[0],
)


@settings(max_examples=6, deadline=None)
@given(rows=_doc_rows)
def test_containment_dominates_jaccard(spark, rows):
    """For every pair: containment >= jaccard (min(|A|,|B|) <= union),
    both in (0, 1], and n_inter <= min-size by construction."""
    from recmetrics_pyspark_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for r in containment_pairs(docs, threshold=0.0).collect():
        assert 0.0 < r.jaccard <= r.containment <= 1.0
