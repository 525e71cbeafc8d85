#!/usr/bin/env python3
"""Dump .explain('formatted') for named declared queries to
plans/r13/<query>_<tag>.txt — the judge-facing plan evidence for
optimization rounds. Usage:
    python scripts/dump_plan.py <tag> <query> [<query> ...]
Plans are built at sf0.1 (the bench scale) but nothing executes except
operators whose construction collects a scalar (size guards)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r13")


def main() -> int:
    tag, names = sys.argv[1], sys.argv[2:]
    from recmetrics_pyspark_spark import get_spark
    import __spark_entry__ as e

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
