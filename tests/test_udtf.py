"""Python UDTF demo: result-equivalent to the JVM explode path."""

from __future__ import annotations

from pyspark.sql import functions as F

from recmetrics_pyspark_spark.functions.udtf_demo import register
from recmetrics_pyspark_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_udtf_matches_explode(spark):
    register(spark, "tokenize_t")
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    docs.createOrReplaceTempView("docs_udtf")
    via_udtf = spark.sql(
        "SELECT d.doc_id, t.token, t.pos "
        "FROM docs_udtf d, LATERAL tokenize_t(d.text) t"
    )
    via_explode = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    ).select("doc_id", "token", "pos")
    got = sorted(map(tuple, via_udtf.collect()))
    want = sorted(map(tuple, via_explode.collect()))
    assert got == want and len(got) > 0
