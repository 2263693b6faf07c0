"""Interleaved A/B: the round-15 key-bucketed flat-store/members
layout vs the legacy flat layout, on the UNCHANGED rep-admission
lifecycle ops (the SCALE.md noise protocol: one session, ABBA
order, median of 5 per arm).

The layout lands the same round the bench runs, so any lifecycle-op
delta in BENCH_r15 cannot be presumed noise — this isolates the
LAYOUT's cost exactly (measured r15: +11% on
embedding_store_rep_admission, +25% on dedup_store_retraction at
sf0.1 proof scale — SCALE.md): arm B monkeypatches
`dedup_store.write_table` to the legacy flat write (no marker), so
every pruned read falls back to the legacy full scan and every
append stays flat, while ALL other round-15 code (cached g_batch,
kernel shape) is identical in both arms.

Usage: python tools/ab_bucketed_layout.py [SF_DIR] [op ...]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from fdblog2clickhouse_spark.session import get_spark  # noqa: E402
from fdblog2clickhouse_spark import operators  # noqa: E402
from fdblog2clickhouse_spark.operators import dedup_store as ds  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OPS = sys.argv[2:] or [
    "embedding_store_rep_admission",
    "dedup_store_retraction",
]

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
queries = operators.all_queries()

_orig_write = ds.write_table


def _legacy_write(df, path, mode, *, key=None, buckets=None):
    df.write.mode(mode).parquet(path)


def run(op: str, arm: str) -> float:
    ds.write_table = _orig_write if arm == "bucketed" else _legacy_write
    try:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[op](spark, SF).count()
        return time.perf_counter() - t0
    finally:
        ds.write_table = _orig_write


for op in OPS:
    run(op, "bucketed")  # warm both scan paths once
    times = {"bucketed": [], "legacy": []}
    order = ["bucketed", "legacy"]
    for i in range(5):
        for arm in order:
            dt = run(op, arm)
            times[arm].append(dt)
            print(f"run {i} {op} {arm}: {dt:.3f}s", flush=True)
        order.reverse()
    for arm in ("bucketed", "legacy"):
        ts = sorted(times[arm])
        print(
            f"{op} {arm}: median={statistics.median(ts):.3f}s "
            f"spread={ts[0]:.3f}-{ts[-1]:.3f}s",
            flush=True,
        )
