"""Driver-t2-style check: every declared query vs its DuckDB oracle.

Runs at sf0.001 for speed in the inner loop; set ORACLE_SF_DIR to
/root/testdata/sf0.01 to reproduce the driver's exact gate.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle import SF_DIR_SMALL, assert_matches_oracle

SF_DIR = os.environ.get("ORACLE_SF_DIR", SF_DIR_SMALL)

# The full parity sweep (~280 queries × Spark + DuckDB) is the single
# largest slice of the default suite; it runs in the driver's own t2
# gate (ORACLE_SF_DIR set) and on explicit invocation, but is excluded
# from the budgeted default `pytest tests/` run (round-12 verdict
# item 2). conftest.pytest_collection_modifyitems honors the marker;
# an ORACLE_SF_DIR run self-unlocks.
pytestmark = [] if os.environ.get("ORACLE_SF_DIR") else [pytest.mark.slow]

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may be omitted, but must be explicit:
    allowed_missing = set(getattr(entrymod, "NO_ORACLE", ()))
    assert missing <= allowed_missing, f"queries without oracle: {missing}"
    dangling = set(ORACLES) - set(QUERIES)
    assert not dangling, f"oracles without query: {dangling}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ORACLES[name], SF_DIR)


def test_harness_detects_wrong_oracle(spark):
    # guard the guard: a deliberately wrong oracle must FAIL the compare
    from tests.oracle import harness_detects_mismatch

    df = QUERIES["q6_forecast_revenue"](spark, SF_DIR)
    wrong = "SELECT 0.0 AS revenue"
    assert harness_detects_mismatch(df, wrong, SF_DIR)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
