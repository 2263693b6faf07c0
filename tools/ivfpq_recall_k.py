"""IVF-PQ recall at PRODUCTION centroid counts (VERDICT r15 #7):
the driver-pinned 0.200 recall and 0.267 probe-coverage ceiling are
K=8-centroid artifacts of the proof corpus (8 lists × nprobe 2 =
a quarter of the corpus probed; recall can't beat coverage). This
sweep re-runs the pq_recall_lloyd.py machinery — trained residual
PQ codebook, 1-Lloyd coarse centroids (the refresh-ivf state) — at
C ∈ {8, 32, 64} coarse centroids with nprobe scaled to the SAME
probe-coverage fractions (1/4, 1/2, 1), so the number a production
reader quotes is coverage-comparable across C.

Usage: python tools/ivfpq_recall_k.py [SF_DIR] [C1,C2,...]
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
    _pq_train_cb,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CS = (
    [int(x) for x in sys.argv[2].split(",")]
    if len(sys.argv) > 2
    else [8, 32, 64]
)
N_QUERIES = 10
K = _PQ_TOPK

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
qn = _quantized(spark, SF).cache()
n_corpus = qn.count()

qs = qn.where(F.col("vec_id") < N_QUERIES).select(
    F.col("vec_id").alias("q_id"), F.col("q").alias("qa"), F.col("nq").alias("na")
)
pairs = qn.select(
    F.col("vec_id").alias("n_id"), F.col("q").alias("qb"), F.col("nq").alias("nb")
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
truth.count()


def recall(approx):
    return truth.join(approx, ["q_id", "n_id"], "left_semi").count() / truth.count()


def lloyd_once(cent):
    lists = ann_store._assign(qn, cent, 1).select(
        F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
    )
    elems = lists.join(
        qn.select(F.col("vec_id").alias("n_id"), "q"), "n_id"
    ).select("list_id", F.posexplode("q").alias("pos", "val"))
    cs = elems.groupBy("list_id", "pos").agg(
        F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
        .cast("long").alias("cv")
    )
    newc = (
        cs.groupBy("list_id")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
        ).alias("q"))
        .withColumn("nq", F.aggregate(
            F.transform(F.col("q"), lambda x: x * x),
            F.lit(0).cast("long"), lambda a, x: a + x,
        ))
        .select(F.col("list_id").alias("c_id"), "q", "nq")
    )
    return newc.unionByName(cent.join(newc.select("c_id"), "c_id", "left_anti"))


def ivfpq_resid_recall(cent, nprobe):
    """pq_recall_lloyd.py's residual-PQ spelling, verbatim."""
    cent = cent.cache()
    lists = ann_store._assign(qn, cent, 1).select(
        F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
    )
    probes = ann_store._assign(
        qn.where(F.col("vec_id") < N_QUERIES), cent, nprobe
    ).select(F.col("v_id").alias("q_id"), F.col("c_id").alias("probe_list"))
    centv = cent.select("c_id", F.col("q").alias("cq"))
    resid = (
        qn.join(lists.withColumnRenamed("n_id", "vec_id"), "vec_id")
        .join(broadcast(centv), F.col("list_id") == F.col("c_id"))
        .select("vec_id", "list_id",
                F.zip_with(F.col("q"), F.col("cq"), lambda x, y: x - y).alias("q"))
    )
    cb = _pq_train_cb(resid.select("vec_id", "q"))

    def sub_d2(vec_col):
        return F.aggregate(
            F.zip_with(
                F.expr(f"slice({vec_col}, sub * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM})"),
                F.col("carr"), lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0).cast("long"), lambda a, x: a + x,
        )

    scored = resid.crossJoin(F.broadcast(cb)).select(
        "vec_id", "sub", "code", sub_d2("q").alias("d2")
    )
    w_arg = Window.partitionBy("vec_id", "sub").orderBy("d2", "code")
    codes = (
        scored.withColumn("rn", F.row_number().over(w_arg))
        .where(F.col("rn") == 1).select("vec_id", "sub", "code")
    )
    qres = (
        qn.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), "q")
        .join(broadcast(probes), "q_id")
        .join(broadcast(centv), F.col("probe_list") == F.col("c_id"))
        .select("q_id", "probe_list",
                F.zip_with(F.col("q"), F.col("cq"), lambda x, y: x - y).alias("q"))
    )
    lut = qres.crossJoin(F.broadcast(cb)).select(
        F.col("q_id").alias("lq_id"), F.col("probe_list").alias("l_list"),
        F.col("sub").alias("lsub"), F.col("code").alias("lcode"),
        sub_d2("q").alias("d2"),
    )
    cand = (
        lists.join(broadcast(probes), F.col("list_id") == F.col("probe_list"))
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", "list_id")
    )
    adc = (
        cand.join(codes, F.col("n_id") == F.col("vec_id"))
        .join(broadcast(lut),
              (F.col("list_id") == F.col("l_list"))
              & (F.col("q_id") == F.col("lq_id"))
              & (F.col("sub") == F.col("lsub"))
              & (F.col("code") == F.col("lcode")))
        .groupBy("q_id", "n_id").agg(F.sum("d2").alias("ad"))
    )
    w_top = Window.partitionBy("q_id").orderBy("ad", "n_id")
    out = (
        adc.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") <= K).select("q_id", "n_id")
    )
    r = recall(out)
    cent.unpersist()
    return r


print(f"sf_dir={SF} corpus={n_corpus} k={K} queries={N_QUERIES}", flush=True)
for c in CS:
    cent0 = qn.orderBy("vec_id").limit(c).select(
        F.col("vec_id").alias("c_id"), "q", "nq"
    )
    cent1 = lloyd_once(cent0)
    for frac, nprobe in (("1/4", max(1, c // 4)), ("1/2", max(1, c // 2)),
                         ("1", c)):
        r = ivfpq_resid_recall(cent1, nprobe)
        print(f"C={c:3d} 1-Lloyd nprobe={nprobe:3d} (coverage~{frac}): "
              f"recall@{K}={r:.3f}", flush=True)
