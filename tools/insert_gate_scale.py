"""Gate the insert anti-join's growth (VERDICT r17 #3): the insert
kernel's idempotence scans (the 2-column raw-lists semi/anti and the
1-column codes vec_id scan per batch) measured 1.51/1.88/2.63 s at
×1/×64/×256 in r17 — ~1.07× per data doubling. SCALE.md names the
escape knob (vec_id-bucket the lists and prune the anti-join to the
batch's buckets, the dedup store's answer) but nothing gated WHEN to
pull it. This tool extends the curve to ×1024: if the slope holds
~1.07×/doubling, the knob stays un-pulled and the SCALE.md row
records it; if it steepens, the knob is due this round.

Same kernel, geometry, and batch shape as tools/ann_store_scale.py
(16 coarse centroids, trained PQ codebook + codes sibling, fixed
200-vector insert batch, fresh 10B+ vec_ids) so the medians are
directly comparable to the r17 curve. The replica build uses a
range cross-join instead of ann_store_scale's k-way union — at
×1024 a 1024-child union plan spends its time in analysis, and the
replica CONTENT is identical either way (content-identical vectors,
offset ids).

Usage: python tools/insert_gate_scale.py [SF_DIR] [K1,K2,...]
        (default /root/testdata/sf0.1 and 1,256,1024)
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
KS = (
    [int(x) for x in sys.argv[2].split(",")]
    if len(sys.argv) > 2
    else [1, 256, 1024]
)
OFFSET = 10_000_000
INSERT_BASE = 100_000_000_000  # clears every replica range at ×1024
N_CENTROIDS = 16
BATCH_N = 200

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

qn = _quantized(spark, SF).select("vec_id", "q", "nq").cache()
n_base = qn.count()
print(f"base corpus: {n_base} vectors", flush=True)

root = os.path.join(tempfile.gettempdir(), f"insert_gate_{os.getpid()}")
shutil.rmtree(root, ignore_errors=True)

base_dir = f"{root}/base"
cb0 = f"{base_dir}/codebook"
li0 = f"{base_dir}/lists"
cent = qn.orderBy("vec_id").limit(N_CENTROIDS).select(
    F.col("vec_id").alias("c_id"), "q", "nq"
)
cent.coalesce(1).write.mode("overwrite").parquet(cb0)
ast._assign(qn, spark.read.parquet(cb0), 1).select(
    F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
).write.mode("overwrite").parquet(li0)
ast.train_pq_codebook(spark, qn, cb0, li0)
ast.reencode_ivf_codes(spark, qn, cb0, li0)
co0 = ast.ivf_codes_path(li0)

stores: dict[int, tuple[str, str]] = {}
for k in KS:
    d = f"{root}/x{k}"
    cb, li = f"{d}/codebook", f"{d}/lists"
    co = ast.ivf_codes_path(li)
    shutil.copytree(cb0, cb)
    shutil.copytree(ast.pq_codebook_path(cb0), ast.pq_codebook_path(cb))
    reps = spark.range(k).select(
        (F.col("id") * F.lit(OFFSET)).alias("off")
    )
    (
        spark.read.parquet(li0)
        .crossJoin(F.broadcast(reps))
        .select((F.col("n_id") + F.col("off")).alias("n_id"), "list_id")
        .repartition(max(1, k // 8))
        .write.parquet(li)
    )
    (
        spark.read.parquet(co0)
        .crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("off")).alias("vec_id"), "sub", "code"
        )
        .repartition(max(1, k // 4))
        .write.parquet(co)
    )
    stores[k] = (cb, li)
    print(f"store x{k}: {spark.read.parquet(li).count()} listed", flush=True)

batch_src = qn.orderBy(F.desc("vec_id")).limit(BATCH_N).cache()
batch_src.count()


def t_insert(k: int, rep: int) -> float:
    cb, li = stores[k]
    b = batch_src.withColumn(
        "vec_id", F.col("vec_id") + F.lit(INSERT_BASE + rep * 1_000_000)
    )
    t0 = time.perf_counter()
    r = ast.ivf_insert_batch(spark, b, cb, li)
    dt = time.perf_counter() - t0
    assert r["vectors"] == BATCH_N and r["codes_appended"], r
    return dt


# warm each store's scan path once
for k in KS:
    t_insert(k, 99)

times: dict[int, list[float]] = {k: [] for k in KS}
order = list(KS)
for rep in range(3):
    for k in order:
        dt = t_insert(k, rep)
        times[k].append(dt)
        print(f"rep {rep} x{k}: insert={dt:.2f}s", flush=True)
    order.reverse()

print()
import math  # noqa: E402

meds = {k: statistics.median(times[k]) for k in KS}
for k in KS:
    print(f"x{k}: insert_median={meds[k]:.2f}s", flush=True)
ks = sorted(meds)
for a, b in zip(ks, ks[1:]):
    doublings = math.log2(b / a)
    per_doubling = (meds[b] / meds[a]) ** (1 / doublings)
    print(
        f"x{a}->x{b}: {meds[b]/meds[a]:.2f}x over {doublings:.0f} "
        f"doublings = {per_doubling:.3f}x/doubling",
        flush=True,
    )

shutil.rmtree(root, ignore_errors=True)
