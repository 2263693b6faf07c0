#!/usr/bin/env python3
"""Physical-plan audit for the headline queries (SURVEY §7 step 7).

For each headline query at sf0.1, prints a compact scorecard:
  - parquet scans: PushedFilters present? ReadSchema column count
    (column pruning check).
  - join strategies used (BroadcastHashJoin vs SortMergeJoin) and
    exchange (shuffle) count.
  - WholeStageCodegen span count (JVM codegen coverage).
Run with AUDIT_FULL=1 to also dump the formatted plans.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NAMES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "events_per_minute",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_bruteforce",
    "token_count",
]


def main() -> None:
    from fdblog2clickhouse_spark import operators
    from fdblog2clickhouse_spark.session import get_spark

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = operators.all_queries()

    for name in NAMES:
        df = queries[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        scans = re.findall(r"Scan parquet[\s\S]*?(?=\n\(\d+\)|\Z)", plan)
        pushed = len(re.findall(r"PushedFilters: \[[^\]]+\]", plan))
        empty_pushed = len(re.findall(r"PushedFilters: \[\]", plan))
        read_cols = [
            len(m.split(","))
            for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        ]
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        exch = plan.count("Exchange")
        wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
        print(
            f"{name:22s} scans={len(scans)} pushed={pushed} nopush={empty_pushed} "
            f"readcols={read_cols} BHJ={bhj} SMJ={smj} exch={exch} codegen={wsc}"
        )
        if os.environ.get("AUDIT_FULL"):
            print(plan)
    spark.stop()


if __name__ == "__main__":
    main()
