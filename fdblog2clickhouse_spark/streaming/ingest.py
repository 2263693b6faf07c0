"""Structured-Streaming trace ingestion (SURVEY §2.7).

The reference's ingestion loop is `inotifywait -e close_write` on a
log dir, one batch per rotated JSON file, POSTed to the sink, with
optional delete-on-success (entrypoint.sh:17-29,
trace-converter.py:109-130). Spark-native, that whole loop is a file
stream source:

  inotify watch            → readStream.json(log_dir)
  one rotated file = batch → maxFilesPerTrigger / AvailableNow
  --delete-logs            → option("cleanSource", "delete")
  POST JSONEachRow         → foreachBatch(ClickHouseHttpSink)
                             or a partitioned parquet sink

Schema is declared up front (the reference's `columns` table,
trace-converter.py:85-93); normalization trims to it and coerces
Time, exactly like the reference's pandas slice + astype.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# The reference's trace column set (trace-converter.py:85-93).
TRACE_SCHEMA = StructType(
    [
        StructField("Severity", IntegerType()),
        StructField("Machine", StringType()),
        StructField("LogGroup", StringType()),
        StructField("Time", DoubleType()),  # epoch seconds, fractional
        StructField("Type", StringType()),
        StructField("ID", StringType()),
    ]
)


def read_trace_stream(
    spark: SparkSession,
    log_dir: str,
    *,
    delete_logs: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over rotated JSON trace logs."""
    reader = spark.readStream.schema(TRACE_SCHEMA)
    if delete_logs:
        reader = reader.option("cleanSource", "delete")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(log_dir)


def normalize_trace(df: DataFrame) -> DataFrame:
    """Trim + coerce to the declared column set
    (trace-converter.py:114-119): fractional epoch seconds → exact
    µs timestamp, severity/int coercion, stable column order."""
    return df.select(
        F.col("Severity").cast("int").alias("severity"),
        F.col("Machine").alias("machine"),
        F.col("LogGroup").alias("log_group"),
        F.timestamp_micros(
            F.round(F.col("Time") * 1_000_000, 0).cast("long")
        ).alias("time"),
        F.col("Type").alias("type"),
        F.col("ID").alias("id"),
    )


def ingest_availablenow(
    spark: SparkSession,
    log_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    delete_logs: bool = False,
) -> None:
    """Batch-drain the log dir into a MergeTree-style parquet sink
    (partitioned by toYYYYMM(time), the reference's PARTITION BY)."""
    stream = normalize_trace(read_trace_stream(spark, log_dir, delete_logs=delete_logs))
    q = (
        stream.withColumn(
            "yyyymm", (F.year("time") * 100 + F.month("time")).cast("int")
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("yyyymm")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
