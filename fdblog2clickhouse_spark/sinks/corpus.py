"""Partitioned corpus (documents) sink — the write-back half of the
text-pipeline rewrite ops (VERDICT r11 #5: `dup_span_apply` emits the
excised corpus as a query result; a production pass wants it STORED
as a partitioned documents table).

Same layout discipline as the MergeTree events sink
(sinks/mergetree.py): hive-partition by a low-cardinality column
(lang — the column curation passes filter on, so partition pruning
serves the downstream reads), repartition ON the partition column
before the write (without it every shuffle partition writes a file
into every hive dir — files = shuffle_partitions × partitions
instead of one per partition), and sort within partitions by doc_id
so row-group min/max stats prune point lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_corpus(
    df: DataFrame,
    path: str,
    *,
    partition_col: str = "lang",
    mode: str = "overwrite",
) -> None:
    (
        df.repartition(partition_col)
        .sortWithinPartitions("doc_id")
        .write.mode(mode)
        .partitionBy(partition_col)
        .parquet(path)
    )
