#!/usr/bin/env python3
"""Dump .explain('formatted') for named headline queries into
plans/r19/<query>_<tag>.txt. For lifecycle ops (which materialize to
scratch and return a result-parquet scan) the returned frame's plan is
captured as the required artifact, and the op's execution populates the
scratch stores; callers wanting internal plans capture them separately.

Usage: python tools/dump_plans_r19.py <tag> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r19")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]

    from fdblog2clickhouse_spark.session import get_spark
    from fdblog2clickhouse_spark import operators

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-plans-r19")
    spark.sparkContext.setLogLevel("ERROR")
    qs = operators.all_queries()
    for name in names:
        df = qs[name](spark, SF)
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(p)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
