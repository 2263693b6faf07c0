"""Interleaved A/B: dedup_containment, current HEAD vs the round-7
implementation (VERDICT r8 #4 — settle the +43% bench move).

Protocol (SCALE.md noise rules): both variants live in ONE Spark
session; runs alternate A,B,B,A,A,B,... so slow drift cancels; the
MEDIAN of 5 runs per variant decides. The r7 module must be
extracted first:

    git show aecb705:fdblog2clickhouse_spark/operators/dedup.py \
      > fdblog2clickhouse_spark/operators/dedup_r7.py

(relative imports keep working inside the package; the file is
throwaway and never committed).
"""

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from fdblog2clickhouse_spark.session import get_spark  # noqa: E402
from fdblog2clickhouse_spark.operators import dedup  # noqa: E402
from fdblog2clickhouse_spark.operators import dedup_r7  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark()

variants = {
    "head": lambda: dedup.dedup_containment(spark, sf).count(),
    "r7": lambda: dedup_r7.dedup_containment(spark, sf).count(),
}

# warm both plans (codegen + scan cache) untimed
for name, fn in variants.items():
    n = fn()
    print(f"warm {name}: rows={n}", flush=True)

times: dict[str, list[float]] = {k: [] for k in variants}
order = ["head", "r7"]
for i in range(5):
    for name in order:
        t0 = time.perf_counter()
        variants[name]()
        dt = time.perf_counter() - t0
        times[name].append(dt)
        print(f"run {i} {name}: {dt:.2f}s", flush=True)
    order.reverse()  # ABBA ordering cancels linear drift

for name, ts in times.items():
    print(
        f"{name}: median={statistics.median(ts):.2f}s "
        f"all={[round(t, 2) for t in ts]}",
        flush=True,
    )
