"""Friendly fail-fast errors for the string-parameterized column API."""

from __future__ import annotations

import pytest

from recmetrics_pyspark_spark.operators.metrics import (
    coverage,
    long_tail_stats,
    novelty,
    personalization,
)


def test_metrics_raise_valueerror_on_missing_columns(spark):
    df = spark.createDataFrame([(1, 2)], ["u", "i"])
    with pytest.raises(ValueError, match="coverage.*id_product.*available"):
        coverage(df, df)
    with pytest.raises(ValueError, match="novelty.*person"):
        novelty(df, df)
    with pytest.raises(ValueError, match="personalization"):
        personalization(df, col_index="nope", col_columns="i")
    with pytest.raises(ValueError, match="long_tail_stats"):
        long_tail_stats(df, col_item="missing")
