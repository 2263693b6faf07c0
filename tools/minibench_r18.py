#!/usr/bin/env python3
"""Bench-methodology timing (warm run + min-of-3 on .count()) for a
named subset of queries — the r18 A/B harness for kernel variants.

Usage: python tools/minibench_r18.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from fdblog2clickhouse_spark.session import get_spark
    from fdblog2clickhouse_spark import operators

    spark = get_spark("minibench-r18")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/lineitem.parquet").count()
    qs = operators.all_queries()
    out = {}
    for name in names:
        fn = qs[name]
        fn(spark, SF).count()
        samples = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF).count()
            samples.append(time.perf_counter() - t0)
        out[name] = [round(s, 3) for s in sorted(samples)]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
