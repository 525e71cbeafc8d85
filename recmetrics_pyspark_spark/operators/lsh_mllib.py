"""MLlib-backed approximate near-dup: MinHashLSH.approxSimilarityJoin.

The portable string-min MinHash in ``operators.dedup`` is the
oracle-checkable reference implementation; this adapter is the
MLlib-native alternative (hashed feature space, OR-amplified banding
inside approxSimilarityJoin) for users who want the stock Spark
estimator. The two are mutual oracles in tests — mirroring the
reference's own v0/v1/v2 cross-check pattern
(reference recmetrics_pyspark.py:310-312).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minhash_neardup_mllib(
    df: DataFrame,
    col_id: str = "doc_id",
    col_text: str = "text",
    k_shingle: int = 3,
    num_tables: int = 8,
    threshold: float = 0.5,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Approximate Jaccard near-dup pairs via MLlib MinHashLSH.

    Returns (id_a, id_b, jaccard_est) for pairs with estimated Jaccard
    ≥ threshold. jaccard_est is computed on the HashingTF'd shingle
    sets, so rare feature collisions can nudge it up vs the exact
    string-shingle Jaccard."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    t = f"split({col_text}, ' ')"
    shingles = (
        f"transform(sequence(1, greatest(size({t}) - {k_shingle - 1}, 1)),"
        f" i -> concat_ws(' ', slice({t}, i, {k_shingle})))"
    )
    docs = df.select(
        F.col(col_id), F.array_distinct(F.expr(shingles)).alias("shingle_set")
    )
    tf = HashingTF(
        inputCol="shingle_set", outputCol="features",
        numFeatures=num_features, binary=True,
    )
    feats = tf.transform(docs).persist()
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_tables, seed=seed,
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="jaccard_dist"
    )
    return (
        joined.select(
            F.col(f"datasetA.{col_id}").alias("id_a"),
            F.col(f"datasetB.{col_id}").alias("id_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard_est"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
