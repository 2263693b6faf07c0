"""Bucketed fact tables: the shuffle-free co-located join path.

At 100 TB the dominant cost of orders⋈lineitem is the shuffle of both
facts on the join key. Writing both tables bucketed BY that key into
the warehouse pre-partitions them once at ingest time; every later
join on the key then reads co-located buckets and the exchange
disappears from the plan entirely (verified by
tests/test_plans.py::test_bucketed_join_no_exchange).

This is the Spark-native analog of ClickHouse's ORDER BY primary key
locality: pay the organization cost at write time, win on every read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    *,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Save as a bucketed (and bucket-sorted) managed table. Sorting
    within buckets additionally removes the join-side Sort at read
    time (SortMergeJoin reads pre-sorted buckets)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on)
