"""Property-based invariants, batch 7: sequence packing conservation,
bigram-LM normalization, ranking-metric replays, hash-split partition
laws, and vocabulary-encoding order — the text/eval primitives every
pipeline stage upstream depends on.

Few large examples per property (each example runs Spark jobs)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings, strategies as st

_doc_token_lists = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=9),
    min_size=1,
    max_size=20,
)


@settings(max_examples=5, deadline=None)
@given(docs=_doc_token_lists, budget=st.integers(3, 20))
def test_pack_sequences_prefix_sum_replay(spark, docs, budget):
    """Every document is assigned exactly once; within a shard the
    cumulative sum replays the id-ordered prefix sum, and bin id is
    the exclusive prefix div budget — bit-exact vs Python."""
    from recmetrics_pyspark_spark.functions.text import pack_sequences

    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.shard, r.n_tokens, r.cum_tokens, r.bin_id)
        for r in pack_sequences(df, budget=budget, n_shards=3).collect()
    }
    assert len(out) == len(docs)
    shards: dict[int, list] = {}
    for i, t in enumerate(docs):
        shards.setdefault(i % 3, []).append((i, len(t)))
    expect = {}
    for s, members in shards.items():
        cum = 0
        for i, n in sorted(members):
            cum += n
            expect[i] = (s, n, cum, (cum - n) // budget)
    assert out == expect


@settings(max_examples=5, deadline=None)
@given(docs=_doc_token_lists)
def test_bigram_lm_conditionals_normalize(spark, docs):
    """With the top-n cap lifted, the conditional probabilities of
    each context sum to ~1 and the counts equal a direct Python
    bigram count."""
    from recmetrics_pyspark_spark.functions.text import bigram_lm

    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bigram_lm(df, top_n=100_000).collect()

    counts: dict[tuple, int] = {}
    for t in docs:
        for x, y in zip(t, t[1:]):
            counts[(x, y)] = counts.get((x, y), 0) + 1
    assert {(r.w1, r.w2): r.c12 for r in out} == counts
    ctx: dict[str, float] = {}
    for r in out:
        assert abs(
            r.p_cond
            - round(r.c12 / sum(c for (x, _), c in counts.items()
                                if x == r.w1), 6)
        ) < 1e-9
        ctx[r.w1] = ctx.get(r.w1, 0.0) + r.p_cond
    for w1, s in ctx.items():
        assert abs(s - 1.0) < 1e-4  # rounded terms, small slack


_rec_rows = st.lists(
    st.tuples(st.integers(1, 4), st.integers(1, 8)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=5, deadline=None)
@given(recs=_rec_rows, truth=_rec_rows, k=st.integers(1, 5))
def test_ranking_metrics_match_python_replay(spark, recs, truth, k):
    """precision@k / recall@k / NDCG@k macro-averages equal a direct
    Python computation on random rec/truth tables."""
    from recmetrics_pyspark_spark.operators.recommend import (
        ranking_metrics_at_k,
    )

    # build ranked recs: rank = arrival order per user, deduped items
    seen, rrows = set(), []
    ranks: dict[int, int] = {}
    for u, i in recs:
        if (u, i) not in seen:
            seen.add((u, i))
            ranks[u] = ranks.get(u, 0) + 1
            rrows.append((u, i, ranks[u]))
    rdf = spark.createDataFrame(rrows, ["user", "item", "rnk"])
    tdf = spark.createDataFrame(truth, ["user", "item"])
    out = ranking_metrics_at_k(rdf, tdf, k=k).collect()[0]

    tset: dict[int, set] = {}
    for u, i in truth:
        tset.setdefault(u, set()).add(i)
    precs, recalls, ndcgs = [], [], []
    for u, items in tset.items():
        user_recs = [(i, r) for (u2, i, r) in rrows if u2 == u and r <= k]
        hits = [(i, r) for i, r in user_recs if i in items]
        precs.append(len(hits) / k)
        recalls.append(len(hits) / len(items))
        dcg = sum(1 / math.log2(r + 1) for _, r in hits)
        idcg = sum(
            1 / math.log2(p + 1) for p in range(1, min(len(items), k) + 1)
        )
        ndcgs.append(dcg / idcg)
    assert out.n_users == len(tset)
    assert abs(out.precision_at_k - round(sum(precs) / len(precs), 6)) < 1e-6
    assert abs(out.recall_at_k - round(sum(recalls) / len(recalls), 6)) < 1e-6
    assert abs(out.ndcg_at_k - round(sum(ndcgs) / len(ndcgs), 6)) < 1e-6


_ids = st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True)


@settings(max_examples=5, deadline=None)
@given(ids=_ids)
def test_dataset_split_partition_laws(spark, ids):
    """Every row gets exactly one split, assignment equals the md5
    first-byte rule, and re-running (or reversing input order) never
    moves a row."""
    from recmetrics_pyspark_spark.functions.text import dataset_split

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    out = {r.doc_id: r.split for r in dataset_split(df).collect()}
    assert set(out) == set(ids)

    def expect(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)
        return "val" if b < 25 else ("test" if b < 50 else "train")

    assert out == {i: expect(i) for i in ids}
    df2 = spark.createDataFrame([(i,) for i in reversed(ids)], ["doc_id"])
    again = {r.doc_id: r.split for r in dataset_split(df2).collect()}
    assert again == out


@settings(max_examples=5, deadline=None)
@given(docs=_doc_token_lists)
def test_vocab_encode_dense_frequency_order(spark, docs):
    """Token ids are dense 1..V assigned by (freq desc, token asc) —
    the exact order a Python sort produces."""
    from recmetrics_pyspark_spark.functions.text import vocab_encode

    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(
        vocab_encode(df).select("token_id", "token", "freq").collect(),
        key=lambda r: r.token_id,
    )
    freqs: dict[str, int] = {}
    for t in docs:
        for tok in t:
            freqs[tok] = freqs.get(tok, 0) + 1
    order = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.token_id, r.token, r.freq) for r in out] == [
        (j + 1, tok, n) for j, (tok, n) in enumerate(order)
    ]
