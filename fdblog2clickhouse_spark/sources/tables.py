"""Parquet table loader for the test star schema (TESTDATA.md).

At cluster scale these would be catalog tables (possibly bucketed on
their join keys); locally they are single parquet files per table.
Loading stays fully declarative so Catalyst can push filters and
prune columns into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables — always broadcast-join these against facts.
DIMENSIONS = {"region", "nation", "customer", "supplier", "part"}


# DataFrame handles are lazy plans; memoizing them per (session, path)
# skips repeated file listing + footer/schema reads when many queries
# touch the same tables (the driver runs 40+ queries per session).
_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _CACHE.get(key)
    if df is None:
        if name == "events":
            df = _events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _CACHE[key] = df
    return df


def parquet_num_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count from the parquet FOOTER — a driver-side
    metadata read (the same footer Spark reads for schema), no job.
    Used to size block grids; returns None when the source isn't a
    single local parquet file (caller falls back to .count())."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(f"{sf_dir}/{name}.parquet").metadata.num_rows
    except Exception:
        return None


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
    rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as long and
    convert exactly to a µs timestamp (the data is µs-aligned; at
    worst this truncates sub-µs, matching DuckDB's fetch precision).
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries run
    against the same names the DuckDB oracle uses."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
