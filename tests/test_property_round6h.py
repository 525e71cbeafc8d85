"""Property-based invariants, batch 8: the forecasting/chunking/bandit
primitives — Holt on constant and linear series, chunk tiling, UCB1
accounting, rolling-origin fold laws, and fingerprint determinism.

Few large examples per property (each example runs Spark jobs)."""

from __future__ import annotations

import datetime as _dt
import hashlib
import math

from hypothesis import given, settings, strategies as st

_BASE = _dt.datetime(2024, 3, 4, 12, 0, 0)


@settings(max_examples=5, deadline=None)
@given(c=st.integers(1, 500), n=st.integers(3, 15))
def test_holt_constant_series_flat_forecast(spark, c, n):
    """Holt smoothing of a constant series is a fixed point: level =
    the constant, trend = 0, every forecast = the constant."""
    from recmetrics_pyspark_spark.operators.timeseries import (
        holt_forecast,
    )

    rows = [
        ("k", _BASE + _dt.timedelta(days=d), float(c)) for d in range(n)
    ]
    df = spark.createDataFrame(rows, ["key", "ts", "value"])
    out = holt_forecast(df, "key", "ts", "value").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == n
    assert r.level == float(c)
    assert r.trend == 0.0
    assert r.forecast_3 == float(c)


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.integers(1, 40), min_size=1, max_size=8  # token counts
    ),
    chunk=st.integers(4, 12),
    overlap=st.integers(0, 3),
)
def test_chunk_documents_tile_with_overlap(spark, docs, chunk, overlap):
    """Chunks reconstruct the document: chunk i starts at
    1 + i·stride, carries min(chunk, remaining) tokens, and stitching
    chunks at stride offsets reproduces the token sequence."""
    from recmetrics_pyspark_spark.functions.text import chunk_documents

    stride = chunk - overlap
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(nt)))
        for i, nt in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(
        df, chunk_tokens=chunk, overlap=overlap
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, nt in enumerate(docs):
        toks = [f"t{i}x{j}" for j in range(nt)]
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        # expected number of chunks: starts at 1, 1+stride, ... ≤ nt
        n_chunks = len(range(1, max(nt, 1) + 1, stride))
        assert len(chunks) == n_chunks
        for r in chunks:
            start = 1 + r.chunk_idx * stride  # chunk_idx is 0-based
            expect = toks[start - 1 : start - 1 + chunk]
            assert r.chunk_text.split(" ") == expect
            assert r.n_tokens == len(expect)
        # stitched non-overlap prefixes reproduce the document
        stitched = []
        for r in chunks:
            stitched.extend(r.chunk_text.split(" ")[: stride if r != chunks[-1] else chunk])
        assert stitched[: len(toks)] == toks


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 20)),
        min_size=4,
        max_size=40,
    )
)
def test_ucb_arm_accounting(spark, rows):
    """Pulls sum to the total on every arm row, the UCB index is
    strictly above the mean (positive exploration bonus), and the
    arm assignment replays the salted-hash rule."""
    from recmetrics_pyspark_spark.operators.experiment import (
        ucb_arm_stats,
    )

    df = spark.createDataFrame(
        [(f"u{u}", float(v)) for u, v in rows], ["unit", "metric"]
    )
    out = ucb_arm_stats(df, "unit", "metric").collect()
    n_total = len(rows)
    assert sum(r.n_pulls for r in out) == n_total
    arms = set()
    for r in out:
        assert r.n_total == n_total
        assert r.ucb1 > r.mean_reward  # ln N / n > 0 whenever N ≥ 2
        arms.add(r.arm)

    def arm_of(u):
        h = hashlib.md5(f"bandit1|u{u}".encode()).hexdigest()[:8]
        return int(h, 16) % 4

    expect_pulls: dict[int, int] = {}
    for u, _ in rows:
        a = arm_of(u)
        expect_pulls[a] = expect_pulls.get(a, 0) + 1
    assert {r.arm: r.n_pulls for r in out} == expect_pulls


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 40), st.integers(1, 50)),
        min_size=4,
        max_size=40,
    ),
    n_folds=st.integers(2, 4),
)
def test_rolling_origin_fold_laws(spark, rows, n_folds):
    """Forward chaining: every fold has its test slice strictly after
    its training slices, train size grows with the fold index, and no
    (fold, split) cell double-counts a row — totals reconcile."""
    from recmetrics_pyspark_spark.functions.curation import (
        rolling_origin_folds,
    )

    data = [
        (i, _BASE + _dt.timedelta(days=d), float(v))
        for i, (d, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, ["doc_id", "ts", "value"])
    out = rolling_origin_folds(df, "ts", n_folds=n_folds).collect()
    cells = {(r.fold, r.split): r.n_rows for r in out}
    # train grows (or stays equal) with the fold index
    trains = [cells.get((f, "train"), 0) for f in range(1, n_folds + 1)]
    assert all(a <= b for a, b in zip(trains, trains[1:]))
    # fold f's train rows = everything before its test slice:
    # train(f) + test(f) ≤ train(f+1) + test(f+1) + ... monotone tiling
    for f in range(1, n_folds + 1):
        t = cells.get((f, "train"), 0)
        s = cells.get((f, "test"), 0)
        assert t + s <= len(rows)
        if f > 1:
            # the previous fold's train+test is exactly this fold's train
            prev = cells.get((f - 1, "train"), 0) + cells.get(
                (f - 1, "test"), 0
            )
            assert prev == t


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=1, max_size=8
        ),
        min_size=2,
        max_size=10,
    )
)
def test_doc_fingerprint_equality_iff_same_text(spark, texts):
    """Identical texts always share a fingerprint; distinct texts
    (at these sizes) get distinct md5-based fingerprints — and the
    operator is a pure function of the text."""
    from recmetrics_pyspark_spark.functions.text import doc_fingerprint

    rows = [(i, " ".join(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in doc_fingerprint(df).collect()}
    by_text: dict[str, list] = {}
    for i, t in enumerate(texts):
        by_text.setdefault(" ".join(t), []).append(i)
    for ids in by_text.values():
        fps = {out[i].content_hash for i in ids}
        assert len(fps) == 1
    distinct_texts = len(by_text)
    assert len({r.content_hash for r in out.values()}) == distinct_texts
