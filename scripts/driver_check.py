#!/usr/bin/env python3
"""Simulate the driver's CORRECTNESS harness locally: build a VANILLA
SparkSession (none of our session-factory confs), run the first N
declared queries at sf0.01 side-by-side with their DuckDB oracles, and
print a per-query pass/fail summary.

Usage: python scripts/driver_check.py [N] [--all] [--sf DIR] [names...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from oracle import assert_matches_oracle  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
        args.remove(sf_dir)
    qs = e.queries()
    oracles = e.oracle_sql()
    names = [a for a in args if a in qs]
    n = 50
    if args and args[0].isdigit():
        n = int(args[0])
    if "--all" in sys.argv:
        n = len(qs)
    if not names:
        names = list(qs)[:n]

    # deliberately vanilla: mirrors the driver's harness session
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("driver-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    passed, failed, noora = [], [], []
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name not in oracles:
                cnt = df.count()
                noora.append(name)
                print(f"  NO_ORACLE {name}: {cnt} rows  ({time.time()-t0:.1f}s)")
                continue
            assert_matches_oracle(df, oracles[name], sf_dir)
            passed.append(name)
            print(f"  PASS {name}  ({time.time()-t0:.1f}s)")
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"  FAIL {name}: {type(ex).__name__}: {str(ex)[:300]}")
            if "--trace" in sys.argv:
                traceback.print_exc()
    print(
        f"\n{len(passed)} passed, {len(failed)} failed, "
        f"{len(noora)} no-oracle of {len(names)}"
    )
    if failed:
        print("failed:", failed)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
