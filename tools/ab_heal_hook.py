"""Is the r16 read-path heal hook free? Every `read_table` /
`pruned_table` / `pruned_store_rows` call now stats the fold
journal (`heal_table_fold`) so a crashed partition-granular fold
can never serve a read with a missing bucket. The hook is one
os.path.exists on the no-journal fast path — this A/B pins that
claim on the audited admission kernel at sf0.1 (the r15
ab_bucketed_layout protocol: interleaved ABBA median-of-5, one
session, arm B monkeypatches heal_table_fold to a no-op while ALL
other code is identical).

Usage: python tools/ab_heal_hook.py [SF_DIR]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from fdblog2clickhouse_spark.session import get_spark  # noqa: E402
from fdblog2clickhouse_spark.operators import dedup_store as ds  # noqa: E402
from fdblog2clickhouse_spark import operators  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OP = "dedup_store_rep_admission"

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
q = operators.all_queries()[OP]

real_heal = ds.heal_table_fold


def run() -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    q(spark, SF).count()
    return time.perf_counter() - t0


run()  # warm
times: dict[str, list[float]] = {"hook": [], "noop": []}
order = ["hook", "noop"]
for i in range(5):
    for arm in order:
        ds.heal_table_fold = real_heal if arm == "hook" else (lambda p: None)
        dt = run()
        times[arm].append(dt)
        print(f"run {i} {arm}: {dt:.2f}s", flush=True)
    order.reverse()
ds.heal_table_fold = real_heal

for arm in ("hook", "noop"):
    print(
        f"{arm}: median={statistics.median(times[arm]):.2f}s "
        f"all={[round(t, 2) for t in times[arm]]}",
        flush=True,
    )
