#!/usr/bin/env python3
"""Single-node throughput: the reference's pandas pipeline vs Spark.

BASELINE.json carries no timings, so this harness MEASURES the
reference's own processing shape (trace-converter.py:109-127 — per
rotated file: pd.read_json(lines=True) → trim to the declared
column set → epoch-time coercion → JSONEachRow encode; the HTTP
POST is excluded on both sides) against this repo's Spark path
(sources/trace_json.read_trace_batch → streaming/ingest
.normalize_trace → sinks/clickhouse.jsoneachrow) on the SAME
exported rotation files.

Prints one JSON line: {"pandas_sec": ..., "spark_sec": ...,
"speedup": ..., "rows": ..., "files": ...}. Spark is timed on a warm
session (the reference runs as a long-lived watch loop, so steady
state is the fair comparison; cold JVM start is reported separately).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pandas_reference_pipeline(files: list[str]) -> int:
    """The reference's per-file work, faithfully re-shaped from
    trace-converter.py:109-127 (public repo): read JSON-lines, trim
    to the declared columns, coerce Time to epoch, encode the batch
    as JSONEachRow text. Returns total rows."""
    import pandas as pd

    columns = ["Severity", "Machine", "LogGroup", "Time", "Type", "ID"]
    total = 0
    for f in files:
        df = pd.read_json(f, lines=True)
        present = [c for c in columns if c in df.columns]
        df = df[present]
        df["Time"] = pd.to_datetime(df["Time"], unit="s").astype("int64") // 1000
        payload = df.to_json(orient="records", lines=True)
        assert payload
        total += len(df)
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from fdblog2clickhouse_spark.session import get_spark
    from fdblog2clickhouse_spark.sinks.clickhouse import jsoneachrow
    from fdblog2clickhouse_spark.sources.trace_json import read_trace_batch
    from fdblog2clickhouse_spark.streaming.ingest import normalize_trace
    from fdblog2clickhouse_spark.streaming.queries import _export_trace_logs

    t_cold0 = time.perf_counter()
    spark = get_spark("baseline-compare")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/events.parquet").count()  # warm reader
    cold_sec = time.perf_counter() - t_cold0

    staged = tempfile.mkdtemp(prefix="baseline_cmp_stage_")
    _export_trace_logs(spark, SF, staged)
    # split into N_ROTATIONS files — a day of rotated logs, the shape
    # the reference's watch loop actually sees (one batch per file;
    # pandas processes them serially, Spark reads the dir in one
    # parallel scan)
    n_rot = int(os.environ.get("BASELINE_CMP_ROTATIONS", "16"))
    log_dir = tempfile.mkdtemp(prefix="baseline_cmp_")
    spark.read.text(staged).repartition(n_rot).write.mode("overwrite").text(
        log_dir + "/txt"
    )
    for i, f in enumerate(sorted(glob.glob(f"{log_dir}/txt/part-*"))):
        os.rename(f, os.path.join(log_dir, f"trace.{i:03d}.json"))
    files = sorted(glob.glob(f"{log_dir}/*.json"))

    # pandas (reference shape): best of 3
    p_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows = pandas_reference_pipeline(files)
        p_times.append(time.perf_counter() - t0)

    # Spark (this repo's shape): best of 3, same files, encode + count
    s_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = jsoneachrow(normalize_trace(read_trace_batch(spark, log_dir)))
        n = df.count()
        s_times.append(time.perf_counter() - t0)
    assert n == rows, (n, rows)

    out = {
        "rows": rows,
        "files": len(files),
        "pandas_sec": round(min(p_times), 3),
        "spark_sec": round(min(s_times), 3),
        "speedup": round(min(p_times) / min(s_times), 2),
        "spark_cold_start_sec": round(cold_sec, 1),
        "sf_dir": SF,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
