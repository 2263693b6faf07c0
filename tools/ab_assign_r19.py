#!/usr/bin/env python3
"""Same-session interleaved A/B of the r18 rank-1 `_assign` kernels
(max_by aggregation) vs the pre-r18 window spelling, on the IVF row
family the r18 verdict left unadjudicated (VERDICT r18 item 4):
ann_ivf_topk uses its own in-plan window (similarity.py) so the rows
that cross `_assign` are the store/lifecycle ones.

Protocol: bench methodology (warm + min-of-3 on .count()), variants
interleaved A,B,A,B per query so box drift hits both sides equally.

Usage: python tools/ab_assign_r19.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "ann_ivf_topk",
    "ann_ivf_store_search",
    "ann_ivf_filtered_search",
    "streaming_ivf_insert",
]


def window_assign(sub, cent, rank_cap):
    """The pre-r18 spelling: rank-1 via row_number window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import fdblog2clickhouse_spark.operators.ann_store as A

    scored = sub.select(
        F.col("vec_id").alias("v_id"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
    ).crossJoin(
        A.broadcast(
            cent.select(
                F.col("c_id"), F.col("q").alias("qb"), F.col("nq").alias("nb")
            )
        )
    ).select("v_id", "c_id", A._cosine_cols())
    wa = Window.partitionBy("v_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("crank", F.row_number().over(wa))
        .where(F.col("crank") <= rank_cap)
    )


def main() -> None:
    names = sys.argv[1:] or DEFAULT

    import fdblog2clickhouse_spark.operators.ann_store as A
    from fdblog2clickhouse_spark import operators
    from fdblog2clickhouse_spark.session import get_spark

    minby_assign = A._assign

    spark = get_spark("ab-assign-r19")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/lineitem.parquet").count()
    qs = operators.all_queries()

    def run(name: str, variant) -> list[float]:
        A._assign = variant
        try:
            qs[name](spark, SF).count()  # warm
            samples = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qs[name](spark, SF).count()
                samples.append(time.perf_counter() - t0)
            return sorted(round(s, 3) for s in samples)
        finally:
            A._assign = minby_assign

    out = {}
    for name in names:
        a1 = run(name, minby_assign)
        b1 = run(name, window_assign)
        a2 = run(name, minby_assign)
        b2 = run(name, window_assign)
        out[name] = {
            "min_by": round(min(a1 + a2), 3),
            "window": round(min(b1 + b2), 3),
            "min_by_samples": a1 + a2,
            "window_samples": b1 + b2,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
