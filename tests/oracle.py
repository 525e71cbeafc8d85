"""Mini duckdb-oracle harness mirroring the driver's t2 check:
run a Spark query and its oracle SQL on the same parquet tables, then
compare row-count + column names + order-insensitive canonical values.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from recmetrics_pyspark_spark.sources.io import TABLES

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR_T2 = "/root/testdata/sf0.01"


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _canon_val(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:  # NaN (pandas nulls surface as NaN)
            return "NULL"
        r = round(v, 6)
        if r == int(r):
            return str(int(r))
        return repr(r)
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_val(row[c]) for c in cols)
        for _, row in df.iterrows()
    ]
    return sorted(rows)


def harness_detects_mismatch(spark_df, wrong_sql: str, sf_dir: str) -> bool:
    """Self-check used by tests: the comparison must FAIL on wrong SQL
    (guards against a harness that silently passes everything)."""
    try:
        assert_matches_oracle(spark_df, wrong_sql, sf_dir)
    except AssertionError:
        return True
    return False


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    got = spark_df.toPandas()
    want = run_oracle(oracle_sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    g, w = canonical_rows(got), canonical_rows(want)
    mism = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:5]
    assert g == w, "value mismatch at sorted rows " + "; ".join(
        f"{i}: spark={g[i]} oracle={w[i]}" for i in mism
    )
