"""The reference's end-to-end demo workflow, distributed: interactions
→ ALS → top-k recommendations → metric suite
(reference usage_examples.ipynb cells 23-39: StringIndexer + ALS +
recommendForAllUsers(10) + explode, then each metric).

Integer keys come straight from the testdata (no StringIndexer needed —
the reference only indexed because its mock data had arbitrary ids).
ALS output is seeded but partitioning-sensitive, so this pipeline is
exercised by tests rather than the hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_als_recommendations(
    interactions: DataFrame,
    k: int = 10,
    col_user: str = "user",
    col_item: str = "item",
    col_rating: str = "rating",
    rank: int = 8,
    max_iter: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Train ALS on (user, item, rating) and return exploded top-k recs
    (user, item, score, rnk) — the notebook's array-of-struct explode
    (cell 36) done with native explode + struct access."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        seed=seed,
        userCol=col_user,
        itemCol=col_item,
        ratingCol=col_rating,
        coldStartStrategy="drop",
        nonnegative=True,
    )
    model = als.fit(interactions)
    recs = model.recommendForAllUsers(k)
    exploded = recs.select(
        F.col(col_user),
        F.posexplode("recommendations").alias("pos", "rec"),
    )
    return exploded.select(
        col_user,
        F.col(f"rec.{col_item}").alias(col_item),
        F.col("rec.rating").alias("score"),
        (F.col("pos") + 1).alias("rnk"),
    )
