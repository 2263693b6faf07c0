#!/usr/bin/env python3
"""Spark-only robustness sweep: run EVERY queries() entry at a given
SF (default sf0.1 — 10x the driver's correctness gate) on the tuned
session and report rows + seconds. No DuckDB — several oracles are
correctness harnesses that stop scaling before the Spark plans do;
this sweep checks the Spark side alone at scale.

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/spark_sweep.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from fdblog2clickhouse_spark import operators
    from fdblog2clickhouse_spark.session import get_spark

    spark = get_spark("spark-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = operators.all_queries()

    failures = 0
    total0 = time.perf_counter()
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            n = queries[name](spark, SF).count()
            print(f"  {name}: rows={n} ({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception:
            failures += 1
            print(f"  {name}: FAIL ({time.perf_counter() - t0:.1f}s)", flush=True)
            traceback.print_exc(limit=3)
    print(
        f"sweep: {len(queries)} queries, {failures} failures, "
        f"{time.perf_counter() - total0:.0f}s total @ {SF}"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
