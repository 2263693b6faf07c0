"""Incremental rollup sink — SummingMergeTree semantics (SURVEY §2.8).

ClickHouse users put a SummingMergeTree materialized view behind the
trace table so per-bucket aggregates stay cheap (the reference's
README promises exactly this rollup-style consumption of the ingested
events — reference README.md:139-141). Spark-native equivalent: a
parquet rollup table maintained per micro-batch by MERGING the new
batch's partial aggregate with the stored aggregate and rewriting
only affected partitions' state.

Scale shape: each batch aggregates map-side to one row per touched
group before anything is read or shuffled; the stored rollup is
O(groups), not O(events), so the merge join is a groups-sized
aggregate regardless of stream volume. All measures are exact BIGINT
sums/counts (order- and batch-boundary-independent by commutativity),
so ANY batch slicing of the input yields the identical rollup — the
unit tests assert 1-batch ≡ 2-batch ≡ N-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# rollup grain: (yyyymm, severity, type) — the reference's partition
# law crossed with the severity/type analysis axes.
_KEYS = ["yyyymm", "severity", "type"]
_MEASURES = {"n_events": "long", "value_c": "long"}


def batch_rollup(df: DataFrame) -> DataFrame:
    """Partial aggregate of one micro-batch at the rollup grain.
    Input: normalized trace rows (time, severity, type, value_c)."""
    return (
        df.withColumn(
            "yyyymm", (F.year("time") * 100 + F.month("time")).cast("int")
        )
        .groupBy(*_KEYS)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_c").alias("value_c"),
        )
    )


def merge_rollup(spark: SparkSession, path: str, batch: DataFrame) -> None:
    """Merge one batch's partial aggregate into the stored rollup:
    read state, union, re-aggregate (sum-of-sums — the SummingMergeTree
    background merge, done eagerly), atomically replace via
    write-then-rename. Exact integer measures make the merge
    associative: state never depends on batch boundaries."""
    agg = batch_rollup(batch)
    if os.path.exists(path):
        state = spark.read.parquet(path)
        agg = (
            state.unionByName(agg)
            .groupBy(*_KEYS)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("value_c").alias("value_c"),
            )
        )
    # write-then-swap: the merged state is written next to the live
    # dir (reading `path` while writing `path.new` is safe), then
    # renamed over — the portable local/HDFS-style commit.
    import shutil

    agg.write.mode("overwrite").parquet(path + ".new")
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(path + ".new", path)


def foreach_batch_rollup(path: str):
    """foreachBatch hook: attach the rollup maintenance to any
    streaming ingest (`.writeStream.foreachBatch(...)`)."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        merge_rollup(batch_df.sparkSession, path, batch_df)

    return _fn


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
