#!/usr/bin/env python3
"""Targeted driver-sim: oracle-check a named subset of registry ops
at sf0.01 (the driver's correctness SF) — the fast pre-flight for a
round's CHANGED-code window when the full tools/driver_sim.py sweep
(all 166 ops) doesn't fit the clock. Same compare as driver_sim.

Usage: python tools/window_check.py [name ...]   (default: the
registry's front window's changed-code slice)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("DRIVER_SIM_SF", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod
    from tests.oracle import compare

    names = sys.argv[1:]
    qs = mod.queries()
    oracles = mod.oracle_sql()
    if not names:
        from fdblog2clickhouse_spark.operators import CHANGED_OPS

        names = list(CHANGED_OPS)
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("window-check")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, SF)
            if name in oracles:
                compare(df, oracles[name], SF)
                status = "MATCH"
            else:
                status = f"rows-only n={df.count()}"
            print(f"  {name}: {status} ({time.perf_counter()-t0:.1f}s)",
                  flush=True)
        except Exception:
            traceback.print_exc()
            print(f"  {name}: FAIL ({time.perf_counter()-t0:.1f}s)",
                  flush=True)
            failures += 1
    spark.stop()
    print(f"window-check: {'GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
