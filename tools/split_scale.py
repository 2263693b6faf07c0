"""Does the automated split actually flatten the search slope at
scale? (round 17 — the end-to-end proof for `maybe_split_ivf_lists`:
the r16 soak measured search growing 2.4× over 256× data at FIXED
geometry, and the split is the named knob against that slope; this
tool runs the knob at the soak's own scale and measures what it
buys.)

Builds the ×K plain-IVF lists (16 corpus-point centroids, the soak's
geometry — rows/list = 125·K), times the 10-query search, runs
`maybe_split_ivf_lists` with the production thresholds (trigger
8192 / target 2048 rows/list), and times the same search again at
the SAME nprobe. Candidates per probe drop from rows/list ≈ 32 k to
≤ 2 k, so the search should fall back toward the flat-basin floor —
the number that justifies wiring the decision into refresh-ivf.

Usage: python tools/split_scale.py [SF_DIR] [K]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from fdblog2clickhouse_spark.session import get_spark  # noqa: E402
from fdblog2clickhouse_spark.operators import ann_store as ast  # noqa: E402
from fdblog2clickhouse_spark.operators.dedup import _quantized  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 256
OFFSET = 10_000_000
N_CENT = 16

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

qn = _quantized(spark, SF).cache()
qn_k = qn
for i in range(1, K):
    qn_k = qn_k.unionByName(
        qn.withColumn("vec_id", F.col("vec_id") + F.lit(OFFSET * i))
    )
qn_k = qn_k.localCheckpoint()
n = qn_k.count()
print(f"corpus: x{K} = {n} vectors", flush=True)

root = os.path.join(tempfile.gettempdir(), f"split_scale_{os.getpid()}")
shutil.rmtree(root, ignore_errors=True)
cb = f"{root}/codebook"
li = f"{root}/lists"
qn.orderBy("vec_id").limit(N_CENT).select(
    F.col("vec_id").alias("c_id"), "q", "nq"
).coalesce(1).write.parquet(cb)
ast._assign(qn_k, spark.read.parquet(cb), 1).select(
    F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
).repartition(max(1, K // 8)).write.parquet(li)
queries = qn.orderBy("vec_id").limit(10).cache()
queries.count()
corpus_search = queries.unionByName(
    qn_k.join(queries.select("vec_id"), "vec_id", "left_anti")
)


def t_search() -> float:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        ast.ivf_store_search_plan(spark, corpus_search, cb, li).count()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


before = t_search()
sizes = spark.read.parquet(li).groupBy("list_id").count()
mx0 = sizes.agg(F.max("count")).first()[0]
c0 = spark.read.parquet(cb).count()
print(f"before: C={c0} max_list={mx0} search_median={before:.2f}s",
      flush=True)

t0 = time.perf_counter()
ms = ast.maybe_split_ivf_lists(spark, qn_k, cb, li)
t_split = time.perf_counter() - t0
print(
    f"maybe_split: triggered={ms['triggered']} rounds={ms['rounds']} "
    f"split={ms['split']} max_list {ms['max_list_before']}→"
    f"{ms['max_list_after']} in {t_split:.1f}s",
    flush=True,
)

after = t_search()
c1 = spark.read.parquet(cb).count()
print(
    f"after:  C={c1} max_list={ms['max_list_after']} "
    f"search_median={after:.2f}s ({after / before:.2f}× of before)",
    flush=True,
)
shutil.rmtree(root, ignore_errors=True)
