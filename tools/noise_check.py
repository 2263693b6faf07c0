"""Interleaved median-of-5 re-measurement of named registry queries
(the SCALE.md noise protocol, generalized from ab_containment.py).

Use when a bench round-over-round drift needs adjudicating on
UNCHANGED code (VERDICT r10 item #8: token_count +52%, tpch_q3 +27%
in BENCH_r10 — both files byte-identical since r6, so any real
difference can only be environmental). One session, queries
alternate A,B,B,A,... so slow environmental drift cancels; the
median of 5 timed runs per query is the number to compare against
the bench history.

Usage: python tools/noise_check.py [SF_DIR] name [name ...]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from fdblog2clickhouse_spark.session import get_spark  # noqa: E402
from fdblog2clickhouse_spark import operators  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAMES = sys.argv[2:] or ["token_count", "tpch_q3"]

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
queries = operators.all_queries()

for name in NAMES:
    assert name in queries, f"unknown query {name!r}"
    queries[name](spark, SF).count()  # warm
    print(f"warm {name}", flush=True)

times: dict[str, list[float]] = {n: [] for n in NAMES}
order = list(NAMES)
for i in range(5):
    for name in order:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, SF).count()
        dt = time.perf_counter() - t0
        times[name].append(dt)
        print(f"run {i} {name}: {dt:.3f}s", flush=True)
    order.reverse()

print()
for name in NAMES:
    print(
        f"{name}: median={statistics.median(times[name]):.3f}s "
        f"all={[round(t, 3) for t in times[name]]}",
        flush=True,
    )
