"""Bucketed-table co-located join (no shuffle) and ORC round-trip."""

from __future__ import annotations

from recmetrics_pyspark_spark.sources.io import load_table
from recmetrics_pyspark_spark.sources.sinks import write_bucketed_table, write_orc

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    write_bucketed_table(li, "li_bucketed", "l_orderkey")
    write_bucketed_table(orders, "orders_bucketed", "o_orderkey")
    a = spark.table("li_bucketed")
    b = spark.table("orders_bucketed")
    joined = a.hint("merge").join(b, a.l_orderkey == b.o_orderkey)
    assert joined.count() == 6000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # both sides pre-bucketed on the join key: no Exchange anywhere
    assert "Exchange" not in plan, plan[:500]
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE orders_bucketed")


def test_orc_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_DIR, "supplier")
    write_orc(df, str(tmp_path / "sup_orc"))
    back = spark.read.orc(str(tmp_path / "sup_orc"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
