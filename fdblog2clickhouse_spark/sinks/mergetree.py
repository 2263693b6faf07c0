"""MergeTree-style parquet sink (SURVEY §2.8).

The Spark-native equivalent of the reference's target table layout
(trace-converter.py:46-54): PARTITION BY toYYYYMM(time) becomes
parquet partition directories; ORDER BY (time) becomes
sortWithinPartitions, giving min/max-stat row-group pruning on time
predicates — the same scan-skipping MergeTree's primary key buys.

At cluster scale: repartitioning on the partition column before the
write keeps one writer per month partition (no small-file explosion
across 1000 executors); sortWithinPartitions costs no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_mergetree(
    df: DataFrame,
    path: str,
    *,
    time_col: str = "time",
    mode: str = "append",
) -> None:
    out = df.withColumn(
        "yyyymm", (F.year(time_col) * 100 + F.month(time_col)).cast("int")
    )
    (
        out.repartition("yyyymm")
        .sortWithinPartitions(time_col)
        .write.mode(mode)
        .partitionBy("yyyymm")
        .parquet(path)
    )


def read_mergetree(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
