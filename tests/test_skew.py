"""Salted-join equivalence: salting must change only the physical
distribution, never the result."""

from __future__ import annotations

from pyspark.sql import functions as F

from recmetrics_pyspark_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # one pathologically hot key (90% of rows) + a long tail
    big = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(1000)], ["k", "payload"]
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(0, 1000, 7)] + [(1, "dim1")], ["k", "attr"]
    ).dropDuplicates(["k"])
    plain = big.join(small, "k").select("k", "payload", "attr")
    salted = salted_join(big, small, on="k").select("k", "payload", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    small = spark.createDataFrame([(1, "x")], ["k", "attr"])
    out = sorted(
        map(tuple, salted_join(big, small, on="k", how="left").collect())
    )
    assert out == [(1, "a", "x"), (2, "b", None)]


def test_salt_spreads_hot_key(spark):
    big = spark.createDataFrame([(1, i) for i in range(64)], ["k", "payload"])
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(8))
    )
    n_salts = salted.select("_salt").distinct().count()
    assert n_salts > 1  # the single hot key really fans out
