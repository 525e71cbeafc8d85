"""Property-based invariants, batch 9: tokenizer training and
hash-sampling — a full Python BPE replay (pair argmax + greedy
leftmost merge, round by round), SimHash identity laws, and the
mixture-sampling keep rule.

Few large examples per property (each example runs Spark jobs)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

_corpora = st.lists(
    st.lists(
        st.sampled_from(["ab", "abc", "abd", "bc", "cab", "dd", "a"]),
        min_size=1,
        max_size=10,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=5, deadline=None)
@given(docs=_corpora)
def test_bpe_train_matches_greedy_replay(spark, docs):
    """Each round's learned merge equals the Python BPE step: weighted
    adjacent-pair argmax (count desc, pair asc) followed by greedy
    leftmost non-overlapping application."""
    from recmetrics_pyspark_spark.functions.bpe import bpe_train

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(
        bpe_train(df, n_merges=3).collect(), key=lambda r: r.round
    )

    counts: dict[tuple, int] = {}
    for ws in docs:
        for w in ws:
            key = tuple(w)
            counts[key] = counts.get(key, 0) + 1
    expect = []
    for _ in range(3):
        pair_counts: dict[tuple, int] = {}
        for syms, cnt in counts.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        (pa, pb), pc = best
        expect.append((pa, pb, pc))
        merged: dict[tuple, int] = {}
        for syms, cnt in counts.items():
            res, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pa
                    and syms[i + 1] == pb
                ):
                    res.append(pa + pb)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            t = tuple(res)
            merged[t] = merged.get(t, 0) + cnt
        counts = merged
    assert [(r.pair_a, r.pair_b, r.pair_count) for r in out] == expect


_texts = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        min_size=1,
        max_size=8,
    ),
    min_size=2,
    max_size=8,
)


@settings(max_examples=5, deadline=None)
@given(texts=_texts)
def test_simhash_identity_and_duplicate_pairs(spark, texts):
    """Identical token multisets share a signature (SimHash is a pure
    function of the multiset), signatures fit in the declared bit
    width, and exact duplicates surface as Hamming-0 near pairs."""
    from recmetrics_pyspark_spark.operators.dedup import (
        simhash_near_pairs,
        simhash_signatures,
    )

    # force at least one duplicate pair
    texts = texts + [texts[0]]
    rows = [(i, " ".join(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    assert all(0 <= s < 2**32 for s in sigs.values())
    by_text: dict[str, list] = {}
    for i, t in enumerate(texts):
        by_text.setdefault(" ".join(t), []).append(i)
    for ids in by_text.values():
        assert len({sigs[i] for i in ids}) == 1

    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(df, max_hamming=0).collect()
    }
    dup_pair = (0, len(texts) - 1)
    assert dup_pair in pairs
    for a, b in pairs:
        assert sigs[a] == sigs[b]  # hamming 0 == equal signatures


_mix_ids = st.lists(
    st.tuples(st.integers(0, 3000), st.integers(0, 9)),
    min_size=1,
    max_size=40,
).map(lambda rs: list({i: s for i, s in rs}.items()))


@settings(max_examples=5, deadline=None)
@given(rows=_mix_ids)
def test_mixture_sample_keep_rule_replay(spark, rows):
    """Kept exactly the ids whose md5 12-bit uniform falls below the
    source-parity rate — an RNG-free rule a Python replay reproduces
    byte for byte."""
    from recmetrics_pyspark_spark.functions.text import (
        MIXTURE_RATES,
        mixture_sample,
    )

    data = [(i, f"src{s}") for i, s in rows]
    df = spark.createDataFrame(data, ["doc_id", "source"])
    out = {r.doc_id for r in mixture_sample(df).collect()}

    def keep(i, s):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:3], 16) / 4096.0
        rate = MIXTURE_RATES["even" if s % 2 == 0 else "odd"]
        return u < rate

    assert out == {i for i, s in rows if keep(i, s)}
