"""Recall@k of the PQ family vs exact integer-L2 top-k — the measured
justification for VERDICT r12 #5 (trained codebooks + residual
IVF-PQ replacing the md5-literal codebooks). Four variants, one
session:

  pq_literal     flat PQ, md5-literal codebook (the old ann_pq_topk)
  pq_trained     flat PQ, one-Lloyd trained codebook (ann_pq_topk now)
  ivfpq_literal  IVF + raw-vector PQ, literal codebook (old plan)
  ivfpq_resid    IVF + residual PQ, trained codebook (plan now)

Ground truth: exact BIGINT squared-L2 top-k over the quantized
vectors (the metric PQ approximates), self excluded. IVF variants
are additionally bounded by probe coverage — that is part of what
they trade for the pruned scan.

Usage: python tools/pq_recall.py [SF_DIR]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import broadcast  # noqa: E402

from fdblog2clickhouse_spark.session import get_spark  # noqa: E402
from fdblog2clickhouse_spark.operators.dedup import _quantized  # noqa: E402
from fdblog2clickhouse_spark.operators import ann_store  # noqa: E402
from fdblog2clickhouse_spark.operators.similarity import (  # noqa: E402
    _PQ_SUBDIM,
    _PQ_TOPK,
    _pq_codebook,
    _pq_train_cb,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = 10
K = _PQ_TOPK

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
qn = _quantized(spark, SF).cache()
qn.count()


def exact_topk():
    qs = qn.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("qa"), F.col("nq").alias("na")
    )
    pairs = qn.select(
        F.col("vec_id").alias("n_id"), F.col("q").alias("qb"), F.col("nq").alias("nb")
    ).join(broadcast(qs), F.col("n_id") != F.col("q_id"))
    d = (
        F.col("na")
        - 2
        * F.aggregate(
            F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        + F.col("nb")
    )
    w = Window.partitionBy("q_id").orderBy(d.asc(), F.col("n_id").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= K)
        .select("q_id", "n_id")
    )


def flat_pq(cb):
    def sub_d2(vec_col):
        return F.aggregate(
            F.zip_with(
                F.expr(f"slice({vec_col}, sub * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM})"),
                F.col("carr"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    scored = qn.crossJoin(broadcast(cb)).select(
        "vec_id", "sub", "code", sub_d2("q").alias("d2")
    )
    w_arg = Window.partitionBy("vec_id", "sub").orderBy("d2", "code")
    codes = (
        scored.withColumn("rn", F.row_number().over(w_arg))
        .where(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )
    lut = (
        qn.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), "q")
        .crossJoin(broadcast(cb))
        .select("q_id", "sub", "code", sub_d2("q").alias("d2"))
    )
    adc = (
        codes.join(broadcast(lut), ["sub", "code"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", F.col("vec_id").alias("n_id"))
        .agg(F.sum("d2").alias("ad"))
    )
    w_top = Window.partitionBy("q_id").orderBy("ad", "n_id")
    return (
        adc.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") <= K)
        .select("q_id", "n_id")
    )


def recall(approx, truth):
    hit = truth.join(approx, ["q_id", "n_id"], "left_semi").count()
    return hit / truth.count()


truth = exact_topk().cache()
truth.count()

lit_cb = spark.createDataFrame(_pq_codebook(), "sub int, code int, carr array<bigint>")
tr_cb = _pq_train_cb(qn)

print(f"sf_dir={SF} k={K} queries={N_QUERIES}", flush=True)
print(f"pq_literal    recall@{K} = {recall(flat_pq(lit_cb), truth):.3f}", flush=True)
print(f"pq_trained    recall@{K} = {recall(flat_pq(tr_cb), truth):.3f}", flush=True)

# IVF-PQ current plan (residual + trained)
cur = ann_store._ivfpq_plan(spark, qn).select("q_id", "n_id")
print(f"ivfpq_resid   recall@{K} = {recall(cur, truth):.3f}", flush=True)

# IVF-PQ old shape (raw vectors, literal codebook): IVF candidates ×
# flat-literal ADC, reconstructed inline for the baseline number
cent = qn.where(F.col("vec_id").isin(ann_store._CENTROID_IDS)).select(
    F.col("vec_id").alias("c_id"), "q", "nq"
)
lists = ann_store._assign(qn, cent, 1).select(
    F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
)
probes = ann_store._assign(
    qn.where(F.col("vec_id") < N_QUERIES), cent, ann_store._N_PROBE
).select(F.col("v_id").alias("q_id"), F.col("c_id").alias("probe_list"))
cand = (
    lists.join(broadcast(probes), F.col("list_id") == F.col("probe_list"))
    .where(F.col("n_id") != F.col("q_id"))
    .select("q_id", "n_id")
)
def ivfpq_literal():
    def sub_d2(vec_col):
        return F.aggregate(
            F.zip_with(
                F.expr(f"slice({vec_col}, sub * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM})"),
                F.col("carr"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    scored = qn.crossJoin(broadcast(lit_cb)).select(
        "vec_id", "sub", "code", sub_d2("q").alias("d2")
    )
    w_arg = Window.partitionBy("vec_id", "sub").orderBy("d2", "code")
    codes = (
        scored.withColumn("rn", F.row_number().over(w_arg))
        .where(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )
    lut = (
        qn.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), "q")
        .crossJoin(broadcast(lit_cb))
        .select(F.col("q_id").alias("lq"), "sub", "code", sub_d2("q").alias("d2"))
    )
    adc = (
        cand.join(codes, F.col("n_id") == F.col("vec_id"))
        .join(broadcast(lut), (F.col("q_id") == F.col("lq")) & (lut["sub"] == codes["sub"]) & (lut["code"] == codes["code"]))
        .groupBy("q_id", "n_id")
        .agg(F.sum("d2").alias("ad"))
    )
    w_top = Window.partitionBy("q_id").orderBy("ad", "n_id")
    return (
        adc.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") <= K)
        .select("q_id", "n_id")
    )


print(f"ivfpq_literal recall@{K} = {recall(ivfpq_literal(), truth):.3f}", flush=True)

# the IVF probe-coverage ceiling: no IVF-PQ variant can beat the
# fraction of exact top-k that lives in a probed list at all
print(
    f"ivf_coverage  recall@{K} = {recall(cand.select('q_id', 'n_id'), truth):.3f}"
    " (ceiling for any ivfpq_*)",
    flush=True,
)

# ------------------------------------------------- nprobe sweep
# VERDICT r13 #3: probe coverage dominates IVF-PQ recall — sweep
# nprobe and report, per point, the coverage ceiling, the residual
# IVF-PQ recall under it, and the scan cost (candidates per query —
# the fraction of the corpus a query's ADC pass touches).
n_corpus = qn.count()
print(f"\nnprobe sweep (lists={len(ann_store._CENTROID_IDS)}, corpus={n_corpus}):", flush=True)
print("nprobe  coverage  ivfpq_resid  cand/query  corpus_frac", flush=True)
for p in (1, 2, 4, 6, 8, 12, 16):
    if p > len(ann_store._CENTROID_IDS):
        break
    probes_p = ann_store._assign(
        qn.where(F.col("vec_id") < N_QUERIES), cent, p
    ).select(F.col("v_id").alias("q_id"), F.col("c_id").alias("probe_list"))
    cand_p = (
        lists.join(broadcast(probes_p), F.col("list_id") == F.col("probe_list"))
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id")
    )
    cov = recall(cand_p, truth)
    rp = recall(
        ann_store._ivfpq_plan(spark, qn, nprobe=p).select("q_id", "n_id"), truth
    )
    n_cand = cand_p.count() / N_QUERIES
    print(
        f"{p:6d}  {cov:8.3f}  {rp:11.3f}  {n_cand:10.1f}  {n_cand / n_corpus:11.3f}",
        flush=True,
    )

# ------------------------------------- refreshed coarse codebook
# The other coverage lever: one Lloyd iteration on the COARSE
# codebook (the refresh_ivf_centroids M/E step) re-centers the lists
# on the data; measure how much the coverage ceiling moves at each
# nprobe without touching the proof op's constants.
elems = lists.join(
    qn.select(F.col("vec_id").alias("n_id"), "q"), "n_id"
).select("list_id", F.posexplode("q").alias("pos", "val"))
cs = elems.groupBy("list_id", "pos").agg(
    F.floor(F.sum("val").cast("double") / F.count(F.lit(1))).cast("long").alias("cv")
)
newc = (
    cs.groupBy("list_id")
    .agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
        ).alias("q")
    )
    .withColumn(
        "nq",
        F.aggregate(
            F.transform(F.col("q"), lambda x: x * x),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    .select(F.col("list_id").alias("c_id"), "q", "nq")
)
cent1 = newc.unionByName(
    cent.join(newc.select("c_id"), "c_id", "left_anti")
).cache()
lists1 = ann_store._assign(qn, cent1, 1).select(
    F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
).cache()
lists1.count()
print("\ncoverage ceiling after ONE coarse Lloyd iteration:", flush=True)
for p in (1, 2, 4, 6, 8):
    probes_p = ann_store._assign(
        qn.where(F.col("vec_id") < N_QUERIES), cent1, p
    ).select(F.col("v_id").alias("q_id"), F.col("c_id").alias("probe_list"))
    cand_p = (
        lists1.join(broadcast(probes_p), F.col("list_id") == F.col("probe_list"))
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id")
    )
    print(f"  nprobe={p}: coverage={recall(cand_p, truth):.3f}", flush=True)
