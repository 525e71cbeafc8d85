#!/usr/bin/env python3
"""Round-10 drift probe (SCALE.md bench-protocol prescription): the
graph family (kcore_items, common_neighbor_links, degree_distribution)
moved 1.27-1.31x between the r8 and r9 DRIVER runs on UNCHANGED code.
This runs exactly those queries (plus item_item_topk, the family's
shared-cache owner and the calibrated ±8% drift reference) in N fresh
solo JVMs back to back and prints per-query medians — the same
re-exec-per-run shape as bench.py's multi-run protocol, subset-scoped
so the box is occupied for minutes, not hours.

Usage: python scripts/graph_drift_probe.py [runs]   (default 3)
Child mode (internal): --child prints one JSON line of timings.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from statistics import median

QUERIES = [
    "item_item_topk",
    "kcore_items",
    "common_neighbor_links",
    "degree_distribution",
]


def child() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entrymod
    from recmetrics_pyspark_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("graph-drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # the bench.py warm-up, so the first timed query is steady-state
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    out = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.perf_counter() - t0, 3)
    print("PROBE_JSON:" + json.dumps(out), flush=True)


def main() -> None:
    if "--child" in sys.argv:
        child()
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = []
    for i in range(n):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True,
            text=True,
        )
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("PROBE_JSON:")
            ),
            None,
        )
        if line is None:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"run {i} produced no probe line")
        runs.append(json.loads(line[len("PROBE_JSON:"):]))
        print(f"run {i + 1}/{n}: {runs[-1]}", flush=True)
    med = {q: round(median(r[q] for r in runs), 3) for q in QUERIES}
    print(json.dumps({"medians": med, "runs": runs}))


if __name__ == "__main__":
    main()
