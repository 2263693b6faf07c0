"""Recall through the ORGANIC C-growth path (VERDICT r16 #4): the
r16 sweep (tools/ivfpq_recall_k.py) showed recall@3 0.133 → 0.333 as
C grows 8 → 64 on FRESH-built fixed-C indexes, and the production
claim became "size C via splits and take the recall for free". But
production reaches higher C through `split_ivf_lists` — 2-means
children inherited from skewed parents, a different centroid
geometry than a fresh Lloyd fit. This tool grows ONE persisted
IVF-PQ index from C=8 upward purely via split (+ the refresh pass
the auto-split now rides in refresh-ivf), measuring recall@3 through
the REAL on-disk search plan (`ivfpq_store_search_plan`) at every
stage, against a fresh-built index REFRESHED to the same state at
the same C.

Stage recipe (the production maintenance pass): split every list
above half the current max (halving the hot lists ≈ doubling C among
them), then refresh_ivf_centroids (one Lloyd step + reassign + PQ
retrain + codes re-encode — exactly what refresh-ivf runs around the
auto-split). Fresh-built comparator at each reached C: C lowest
vec_ids as seeds, assign, PQ train/encode, ONE refresh (the r16
sweep's '1-Lloyd' state).

Usage: python tools/split_recall.py [SF_DIR] [C_TARGET]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import broadcast  # noqa: E402

from fdblog2clickhouse_spark.session import get_spark  # noqa: E402
from fdblog2clickhouse_spark.operators import ann_store  # noqa: E402
from fdblog2clickhouse_spark.operators.dedup import _quantized  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
C_TARGET = int(sys.argv[2]) if len(sys.argv) > 2 else 32
C0 = 8
N_QUERIES = 10
K = 3

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
qn = _quantized(spark, SF).cache()
print(f"corpus: {qn.count()} vectors", flush=True)

# exact top-K truth (same spelling as ivfpq_recall_k.py)
qs = qn.where(F.col("vec_id") < N_QUERIES).select(
    F.col("vec_id").alias("q_id"), F.col("q").alias("qa"),
    F.col("nq").alias("na"),
)
pairs = qn.select(
    F.col("vec_id").alias("n_id"), F.col("q").alias("qb"),
    F.col("nq").alias("nb"),
).join(broadcast(qs), F.col("n_id") != F.col("q_id"))
dexpr = (
    F.col("na")
    - 2 * F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"), lambda a, x: a + x,
    )
    + F.col("nb")
)
w = Window.partitionBy("q_id").orderBy(dexpr.asc(), F.col("n_id").asc())
truth = (
    pairs.withColumn("rn", F.row_number().over(w))
    .where(F.col("rn") <= K).select("q_id", "n_id").cache()
)
n_truth = truth.count()

root = os.path.join(tempfile.gettempdir(), f"split_recall_{os.getpid()}")
shutil.rmtree(root, ignore_errors=True)


def build_fresh(tag: str, c: int) -> tuple[str, str]:
    """Persisted IVF-PQ at C=c: c lowest vec_ids as seeds, one
    refresh (the '1-Lloyd' state the r16 sweep measured)."""
    cb = f"{root}/{tag}/codebook"
    li = f"{root}/{tag}/lists"
    qn.orderBy("vec_id").limit(c).select(
        F.col("vec_id").alias("c_id"), "q", "nq"
    ).coalesce(1).write.mode("overwrite").parquet(cb)
    ann_store._assign(qn, spark.read.parquet(cb), 1).select(
        F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
    ).write.mode("overwrite").parquet(li)
    ann_store.train_pq_codebook(spark, qn, cb, li)
    ann_store.reencode_ivf_codes(spark, qn, cb, li)
    ann_store.refresh_ivf_centroids(spark, qn, cb, li)
    return cb, li


def measure(cb: str, li: str) -> dict:
    c = spark.read.parquet(cb).count()
    sizes = spark.read.parquet(li).groupBy("list_id").count()
    mx = sizes.agg(F.max("count")).first()[0]
    out = {"C": c, "max_list": mx}
    for label, nprobe in (("quarter", max(2, c // 4)), ("full", c)):
        got = ann_store.ivfpq_store_search_plan(
            spark, qn, cb, li, ann_store.ivf_codes_path(li), nprobe=nprobe
        ).where(F.col("rank") <= K).select("q_id", "n_id")
        out[label] = truth.join(
            got, ["q_id", "n_id"], "left_semi"
        ).count() / n_truth
    return out


cb_o, li_o = build_fresh("organic", C0)
m = measure(cb_o, li_o)
print(
    f"organic C={m['C']} max_list={m['max_list']} "
    f"recall@{K} quarter={m['quarter']:.3f} full={m['full']:.3f} (seed)",
    flush=True,
)
stages = [("organic-seed", m)]
while m["C"] < C_TARGET:
    max_list = max(1, m["max_list"] // 2)
    sp = ann_store.split_ivf_lists(spark, qn, cb_o, li_o, max_list)
    if sp["split"] == 0:
        print("no splittable lists left — stopping", flush=True)
        break
    ann_store.refresh_ivf_centroids(spark, qn, cb_o, li_o)
    m = measure(cb_o, li_o)
    stages.append((f"organic-split(max_list={max_list})", m))
    print(
        f"organic C={m['C']} max_list={m['max_list']} "
        f"recall@{K} quarter={m['quarter']:.3f} full={m['full']:.3f} "
        f"(split={sp['split']} reseeded={sp['reseeded']})",
        flush=True,
    )

print("\nfresh-built comparators at each reached C:", flush=True)
for tag, m in stages:
    cb_f, li_f = build_fresh(f"fresh{m['C']}", m["C"])
    f = measure(cb_f, li_f)
    print(
        f"C={m['C']:>3}: organic quarter={m['quarter']:.3f} "
        f"full={m['full']:.3f} | fresh quarter={f['quarter']:.3f} "
        f"full={f['full']:.3f}",
        flush=True,
    )

shutil.rmtree(root, ignore_errors=True)
