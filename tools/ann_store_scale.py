"""Scale evidence for the IVF-PQ STORE lifecycle (VERDICT r15 #5):
grow the persisted four-artifact index K× and measure, at each size,

  insert  — `ivf_insert_batch` of a FIXED 200-vector batch (lists
            append + residual PQ codes append): assignment is
            O(batch × centroids) and the codes encode joins the
            batch to the two codebooks only, so the curve must be
            ~flat in K — any store-sized term here is a hot-path
            defect (the instrument that caught the r14 dedup
            store's 5×-scan);
  search  — `ivfpq_store_search_plan` over the fixed 10-query set:
            candidates are the probed lists' rows ADC-joined to
            their codes, so at FIXED nprobe and centroid count the
            candidate set grows linearly in K by construction —
            the production knob against that slope is MORE lists
            (`split_ivf_lists` keeps rows/list bounded), not a
            bigger scan; the measurement documents the slope so the
            split cadence has a number;
  refresh — `refresh_ivf_centroids` (coarse Lloyd + lists reassign
            + PQ retrain + codes re-encode in one pass):
            deliberately O(store) amortized maintenance — the fold
            analogue; measured once per K to document the constant.

Store construction mirrors tools/retraction_scale.py: the sf0.1
embeddings (2000 vectors) quantized once, the index built on the
base replica (16 corpus-point coarse centroids, trained PQ
codebook, full codes coverage), then lists/codes replicated with
10M·k vec_id offsets — replica vectors are content-identical, so
the replicated assignments/codes ARE what a direct build would
produce, at build cost O(base). Inserts use fresh 900M+ ids so
appends never collide. Interleaved ABBA, median of 3 for
insert/search; refresh one-shot per K (it folds the inserts in, so
it runs LAST and its qn covers base + replicas + inserts — the
coverage precondition a codes-bearing refresh enforces).

Usage: python tools/ann_store_scale.py [SF_DIR] [K1,K2,...]
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
    else [1, 64, 256]
)
OFFSET = 10_000_000
# insert ids must clear EVERY replica's offset range (256 × 10M);
# 900M sat inside replica 90's range and collided at ×256
INSERT_BASE = 10_000_000_000
N_CENTROIDS = 16
BATCH_N = 200
N_QUERIES = 10

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

qn = _quantized(spark, SF).select("vec_id", "q", "nq").cache()
n_base = qn.count()
print(f"base corpus: {n_base} vectors", flush=True)

root = os.path.join(tempfile.gettempdir(), f"ann_store_scale_{os.getpid()}")
shutil.rmtree(root, ignore_errors=True)

# ---- base index build (once): coarse codebook, lists, PQ, codes
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

stores: dict[int, tuple[str, str, str]] = {}
for k in KS:
    d = f"{root}/x{k}"
    cb, li = f"{d}/codebook", f"{d}/lists"
    co = ast.ivf_codes_path(li)
    shutil.copytree(cb0, cb)
    shutil.copytree(ast.pq_codebook_path(cb0), ast.pq_codebook_path(cb))
    lists_k = spark.read.parquet(li0)
    codes_k = spark.read.parquet(co0)
    out_l, out_c = lists_k, codes_k
    for i in range(1, k):
        out_l = out_l.unionByName(
            lists_k.withColumn("n_id", F.col("n_id") + F.lit(OFFSET * i))
        )
        out_c = out_c.unionByName(
            codes_k.withColumn(
                "vec_id", F.col("vec_id") + F.lit(OFFSET * i)
            )
        )
    out_l.repartition(max(1, k // 8)).write.parquet(li)
    out_c.repartition(max(1, k // 4)).write.parquet(co)
    stores[k] = (cb, li, co)
    print(
        f"store x{k}: {spark.read.parquet(li).count()} listed / "
        f"{spark.read.parquet(co).select('vec_id').distinct().count()} coded",
        flush=True,
    )

queries = qn.orderBy("vec_id").limit(N_QUERIES).cache()
queries.count()
batch_src = (
    qn.orderBy(F.desc("vec_id")).limit(BATCH_N).cache()
)
batch_src.count()
inserted: dict[int, list] = {k: [] for k in KS}


def t_insert(k: int, rep: int) -> float:
    cb, li, _ = stores[k]
    b = batch_src.withColumn(
        "vec_id", F.col("vec_id") + F.lit(INSERT_BASE + rep * 1_000_000)
    )
    inserted[k].append(b)
    t0 = time.perf_counter()
    ast.ivf_insert_batch(spark, b, cb, li)
    return time.perf_counter() - t0


def t_search(k: int) -> float:
    cb, li, co = stores[k]
    t0 = time.perf_counter()
    ast.ivfpq_store_search_plan(spark, queries, cb, li, co).count()
    return time.perf_counter() - t0


def t_refresh(k: int) -> float:
    cb, li, _ = stores[k]
    qn_k = qn
    for i in range(1, k):
        qn_k = qn_k.unionByName(
            qn.withColumn("vec_id", F.col("vec_id") + F.lit(OFFSET * i))
        )
    for b in inserted[k]:
        qn_k = qn_k.unionByName(b)
    t0 = time.perf_counter()
    ast.refresh_ivf_centroids(spark, qn_k, cb, li)
    return time.perf_counter() - t0


# warm the scan paths once per store
for k in KS:
    t_search(k)

i_times: dict[int, list[float]] = {k: [] for k in KS}
s_times: dict[int, list[float]] = {k: [] for k in KS}
order = list(KS)
for rep in range(3):
    for k in order:
        di = t_insert(k, rep)
        i_times[k].append(di)
        dsr = t_search(k)
        s_times[k].append(dsr)
        print(
            f"rep {rep} x{k}: insert={di:.2f}s search={dsr:.2f}s",
            flush=True,
        )
    order.reverse()

print()
for k in KS:
    print(
        f"x{k}: insert_median={statistics.median(i_times[k]):.2f}s "
        f"search_median={statistics.median(s_times[k]):.2f}s",
        flush=True,
    )
for k in KS:
    print(
        f"x{k}: refresh={t_refresh(k):.2f}s (one-shot, O(store) by design)",
        flush=True,
    )

shutil.rmtree(root, ignore_errors=True)
