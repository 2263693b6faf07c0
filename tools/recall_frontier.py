"""The IVF-PQ quality envelope at production geometry (VERDICT r17
#6): the r16/r17 sweeps pinned recall@3 ≈ 0.300-0.333 at C=32-64 on
the 2 k-vector corpus — a relative no-regression story. This tool
states the ABSOLUTE envelope at the realistic operating point: a
×256 corpus (sf0.1 embeddings replicated with deterministic jitter,
so replicas are near-duplicate but DISTINCT vectors — a corpus of
identical replicas has degenerate ground truth), indexed at the soak
geometry (C=16 seeds) and then grown to production shape by the REAL
maintenance pass (refresh + `maybe_split_ivf_lists` at the shipped
8192/2048 thresholds, repeated until the trigger stops firing, the
cron cadence). On that index it measures recall@3 and recall@10
versus nprobe — the knob a query pays for quality — against exact
brute-force top-k over the full ×256 corpus.

Jitter: each replica r of vector v perturbs every component by
xxhash64(vec_id, pos) mod 201 - 100 quant units — ~10% of the avg
|component| (≈1000 per ann_store._REFRESH_DRIFT's calibration),
deterministic and re-runnable. Replicas of one base vector form a
loose natural cluster (correlated direction, distinct positions), so
exact top-k has meaningful distance gaps ADC can resolve and true
neighbors SPREAD across lists — the regime where nprobe actually
buys recall. (A ±2-unit jitter was tried first: every true neighbor
is then an ADC near-tie and recall@10 measures tie-breaking noise,
not the index.)

Usage: python tools/recall_frontier.py [SF_DIR] [K_REPL]
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
K_REPL = int(sys.argv[2]) if len(sys.argv) > 2 else 256
OFFSET = 10_000_000
N_QUERIES = 10
N_CENTROIDS = 16
KS = (3, 10)
NPROBES = (1, 2, 4, 8, 16, 32)

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

base = _quantized(spark, SF).select("vec_id", "q", "nq")
reps = spark.range(K_REPL).select(
    (F.col("id") * F.lit(OFFSET)).alias("off")
)
jq = F.transform(
    F.col("q"),
    lambda x, i: (
        x
        + F.pmod(
            F.xxhash64(F.col("vec_id") + F.col("off"), i), F.lit(201)
        )
        - F.lit(100)
    ).cast("long"),
)
qn = (
    base.crossJoin(broadcast(reps))
    .select((F.col("vec_id") + F.col("off")).alias("vec_id"), jq.alias("q"))
    .withColumn(
        "nq",
        F.aggregate(
            F.transform(F.col("q"), lambda x: x * x),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
)
root = os.path.join(tempfile.gettempdir(), f"recall_frontier_{os.getpid()}")
shutil.rmtree(root, ignore_errors=True)
corpus_p = f"{root}/corpus"
qn.repartition(32).write.parquet(corpus_p)
qn = spark.read.parquet(corpus_p)
n_corpus = qn.count()
print(f"corpus: {n_corpus} vectors (x{K_REPL}, jittered)", flush=True)

# ---- index: soak geometry, grown by the real maintenance pass
cb = f"{root}/codebook"
li = f"{root}/lists"
qn.where(F.col("vec_id") < N_CENTROIDS).select(
    F.col("vec_id").alias("c_id"), "q", "nq"
).coalesce(1).write.mode("overwrite").parquet(cb)
ann_store._assign(qn, spark.read.parquet(cb), 1).select(
    F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
).repartition(8).write.mode("overwrite").parquet(li)
ann_store.train_pq_codebook(spark, qn, cb, li)
ann_store.reencode_ivf_codes(spark, qn, cb, li)

passes = 0
while True:
    ann_store.refresh_ivf_centroids(spark, qn, cb, li)
    ms = ann_store.maybe_split_ivf_lists(spark, qn, cb, li)
    passes += 1
    c_now = spark.read.parquet(cb).count()
    mx = (
        spark.read.parquet(li)
        .groupBy("list_id")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    print(
        f"maintenance pass {passes}: C={c_now} max_list={mx} "
        f"triggered={ms['triggered']} split={ms.get('split', 0)}",
        flush=True,
    )
    if not ms["triggered"] or ms.get("split", 0) == 0 or passes >= 12:
        break

C = spark.read.parquet(cb).count()
sizes = spark.read.parquet(li).groupBy("list_id").count()
print(
    f"final geometry: C={C} max_list={sizes.agg(F.max('count')).first()[0]} "
    f"median_list={sizes.agg(F.median('count')).first()[0]}",
    flush=True,
)

# ---- exact ground truth (L2 on the quantized domain, the sweeps'
# spelling) for the 10 base queries over the full x256 corpus
qs = qn.where(F.col("vec_id") < N_QUERIES).select(
    F.col("vec_id").alias("q_id"), F.col("q").alias("qa"),
    F.col("nq").alias("na"),
).cache()
assert qs.count() == N_QUERIES
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
    .where(F.col("rn") <= max(KS))
    .select("q_id", "n_id", "rn")
    .cache()
)
truth.count()

queries = qs.select(F.col("q_id").alias("vec_id"), F.col("qa").alias("q"),
                    F.col("na").alias("nq"))
co = ann_store.ivf_codes_path(li)
cent_d = spark.read.parquet(cb)
truth_lists = truth.join(
    spark.read.parquet(li).select(
        F.col("n_id"), F.col("list_id").alias("t_list")
    ),
    "n_id",
).cache()
truth_lists.count()

# Three measurements per (nprobe, k), separating the loss terms so
# the envelope names its binder: recall@k (the plain ADC ranking),
# rr@k (exact re-rank of the ADC top-5k pool — the refinement
# `ivfpq_rerank_store_plan` ships; its gap to cov@k is what escaped
# the POOL, not the probes), and cov@k (the fraction of exact top-k
# living in probed lists — the ceiling for ANY scorer at that
# nprobe; the recall@k→cov@k gap is PQ resolution loss).
POOL_MULT = 5
print(f"\nrecall vs nprobe at C={C} (x{K_REPL} corpus):", flush=True)
print(
    "nprobe  "
    + "  ".join(f"recall@{k}" for k in KS)
    + "  "
    + "  ".join(f"rr@{k}" for k in KS)
    + "  "
    + "  ".join(f"cov@{k}" for k in KS)
    + "  probed_frac",
    flush=True,
)
for nprobe in NPROBES:
    if nprobe > C:
        break
    got = (
        ann_store.ivfpq_store_search_plan(
            spark, queries, cb, li, co,
            nprobe=nprobe, k=POOL_MULT * max(KS),
        )
        .select("q_id", "n_id", "rank")
        .cache()
    )
    got.count()
    probes = ann_store._assign(queries, cent_d, nprobe).select(
        F.col("v_id").alias("q_id"), F.col("c_id").alias("t_list")
    )
    row = [f"{nprobe:>6}"]
    rr_cells = []
    cov_cells = []
    for k in KS:
        hits = (
            truth.where(F.col("rn") <= k)
            .join(
                got.where(F.col("rank") <= k), ["q_id", "n_id"], "left_semi"
            )
            .count()
        )
        row.append(f"{hits / (N_QUERIES * k):>8.3f}")
        rr = ann_store._exact_rerank(
            got.where(F.col("rank") <= POOL_MULT * k), queries, qn, k
        )
        rr_hits = (
            truth.where(F.col("rn") <= k)
            .join(rr, ["q_id", "n_id"], "left_semi")
            .count()
        )
        rr_cells.append(f"{rr_hits / (N_QUERIES * k):>5.3f}")
        cov = (
            truth_lists.where(F.col("rn") <= k)
            .join(probes, ["q_id", "t_list"], "left_semi")
            .count()
        )
        cov_cells.append(f"{cov / (N_QUERIES * k):>6.3f}")
    row.extend(rr_cells)
    row.extend(cov_cells)
    row.append(f"{nprobe / C:>11.3f}")
    print("  ".join(row), flush=True)
    got.unpersist()

shutil.rmtree(root, ignore_errors=True)
