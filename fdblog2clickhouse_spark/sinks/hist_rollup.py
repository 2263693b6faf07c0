"""Mergeable quantile-histogram sink — the third AggregatingMergeTree
family member (SURVEY §2.8).

ClickHouse materialized views maintain `quantileState(...)` the same
way they maintain `uniqState` — partial sketch states merged at read
time. This sink is the Spark-native fixed-bin-histogram version for
the per-type value quantiles (the batch analog is
`value_quantile_hist`, operators/sketches.py): state is one row per
(event_type, bin) with a count, the merge operator is per-bin SUM —
commutative and associative, so ANY batch slicing of the stream
yields the identical state (NOT idempotent, like the Summing rollup
and unlike HLL's MAX: exactly-once delivery is the transport's job
here).

Scale shape: each micro-batch reduces map-side to O(types × bins)
rows before anything is read or merged; the stored state is bounded
by the value domain, independent of stream volume. The family is now
complete: counts (sinks/rollup.py, SUM), distincts
(sinks/hll_rollup.py, idempotent MAX), quantiles (here, SUM of bin
counts).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sketches import _QH_QS, _QH_WIDTH

_KEYS = ["event_type", "b"]


def batch_bins(df: DataFrame) -> DataFrame:
    """One micro-batch's partial histogram state. Bin math imported
    from operators/sketches.py so the streamed state can never drift
    from the batch sketch. Input needs (event_type, value)."""
    return (
        df.select(
            "event_type",
            F.floor(F.col("value") / _QH_WIDTH).cast("long").alias("b"),
        )
        .groupBy(*_KEYS)
        .agg(F.count(F.lit(1)).alias("c"))
    )


def merge_hist(spark: SparkSession, path: str, batch: DataFrame) -> None:
    """Merge a batch's bins into the stored state (per-bin SUM — the
    quantileMerge background step, done eagerly; write-then-swap
    commit like the sibling sinks)."""
    agg = batch_bins(batch)
    if os.path.exists(path):
        state = spark.read.parquet(path)
        agg = state.unionByName(agg).groupBy(*_KEYS).agg(F.sum("c").alias("c"))
    agg.write.mode("overwrite").parquet(path + ".new")
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(path + ".new", path)


def foreach_batch_hist(path: str):
    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        merge_hist(batch_df.sparkSession, path, batch_df)

    return _fn


def read_quantiles(spark: SparkSession, path: str) -> DataFrame:
    """quantileMerge + finalize: p50/p90/p99 per type from the
    stored bins. The interpolation expression mirrors
    operators/sketches.py::value_quantile_hist's finalize verbatim
    (constants shared by import), so the streamed estimate is
    bit-identical to the batch sketch — and to the DuckDB oracle."""
    bins = spark.read.parquet(path)
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    cum = bins.select(
        "event_type",
        "b",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_tot).alias("tot"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in _QH_QS])).alias("q")
    hit = cum.select("*", qs).where(
        F.col("cum") >= F.col("q") * F.col("tot").cast("double")
    )
    w_first = Window.partitionBy("event_type", "q").orderBy("b")
    est = F.expr(
        f"round(b * {_QH_WIDTH} + {_QH_WIDTH} * "
        "((q * CAST(tot AS DOUBLE)) - CAST(cum - c AS DOUBLE)) / CAST(c AS DOUBLE), 4)"
    )
    return (
        hit.withColumn("rn", F.row_number().over(w_first))
        .where(F.col("rn") == 1)
        .select("event_type", "q", est.alias("est_quantile"))
    )
