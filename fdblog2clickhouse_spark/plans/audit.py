"""Plan-shape scoring: the properties that matter at 100 TB.

A correct answer with the wrong plan shape dies at scale. These
helpers extract, from the formatted physical plan, the signals the
repo's scale contract is written in: filters pushed into scans,
pruned read schemas, broadcast vs shuffle joins, exchange counts,
whole-stage-codegen coverage, and the red flags (cartesian products,
row-at-a-time Python eval).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def plan_scorecard(plan: str) -> dict:
    read_cols = [
        len(m.split(",")) for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ]
    return {
        "scans": len(re.findall(r"\(\d+\) Scan parquet", plan)),
        "pushed_filters": len(
            [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()]
        ),
        "unpushed_scans": len(re.findall(r"PushedFilters: \[\]", plan)),
        "read_cols": read_cols,
        "broadcast_joins": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "cartesian": "CartesianProduct" in plan,
        "python_eval": "BatchEvalPython" in plan,
    }
