"""End-to-end reference-workflow test (ALS → metrics) and the DIMSUM
mutual-oracle check for personalization."""

from __future__ import annotations

import pytest

from recmetrics_pyspark_spark.operators.als_pipeline import (
    train_als_recommendations,
)
from recmetrics_pyspark_spark.operators.dimsum import personalization_dimsum
from recmetrics_pyspark_spark.operators.metrics import (
    coverage_value,
    novelty_value,
    personalization_value,
)
from recmetrics_pyspark_spark.operators.recommend import interactions

SF_DIR = "/root/testdata/sf0.001"


def test_als_pipeline_to_metrics(spark):
    inter = interactions(spark, SF_DIR, with_rating=True).cache()
    recs = train_als_recommendations(inter, k=10).cache()
    # every user got exactly k recs with 1..k ranks
    per_user = recs.groupBy("user").count().select("count").distinct().collect()
    assert [r["count"] for r in per_user] == [10]
    # the full metric suite runs on ALS output (the notebook flow)
    cov = coverage_value(recs, inter, col_item="item")
    assert 0.0 < cov <= 1.0
    nov = novelty_value(inter, recs, col_user="user", col_item="item")
    assert nov is not None and nov > 0.0
    pers = personalization_value(recs, "user", "item")
    assert 0.0 <= pers <= 1.0
    recs.unpersist()
    inter.unpersist()


def test_dimsum_agrees_with_exact_personalization(spark):
    # reference v0/v1/v2 mutual-check pattern (recmetrics_pyspark.py:310-312)
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2), (2, 1), (3, 3), (3, 4)],
        ["person", "product"],
    )
    exact = personalization_value(df)
    dim = personalization_dimsum(df)
    assert dim == pytest.approx(2 / 3, abs=1e-9)
    assert exact == pytest.approx(dim, abs=1e-6)


def test_dimsum_agrees_on_testdata_sample(spark):
    inter = interactions(spark, SF_DIR).limit(2000)
    exact = personalization_value(inter, "user", "item")
    dim = personalization_dimsum(inter, "user", "item")
    assert exact == pytest.approx(dim, abs=1e-4)
