"""Does MORE PQ CODE BYTES buy the recall that probes can't?
Companion to tools/ivfpq_recall_k.py, which showed recall flat in
nprobe at every centroid count (residual quantization binds, not
coverage) and rising with C. This sweep holds the coarse geometry
fixed (C=32 1-Lloyd centroids, nprobe=8) and varies the PQ SUBSPACE
COUNT — 4/8/16 subspaces over the 64-dim vectors (4/8/16 code bytes
per vector at 16 codes each) — by patching
similarity._PQ_SUBS/_PQ_SUBDIM before training, the knob a
production deployment sizes against its memory budget.

Usage: python tools/ivfpq_code_budget.py [SF_DIR] [SUBS1,...] [CODES1,...]
(the optional third arg crosses each subspace count with each
codes-per-subspace codebook size; default 16 = the operator constant)
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
import fdblog2clickhouse_spark.operators.similarity as sim  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SUBS = (
    [int(x) for x in sys.argv[2].split(",")]
    if len(sys.argv) > 2
    else [4, 8, 16]
)
# optional codes-per-subspace sweep (argv[3]): each subspace count is
# crossed with each codebook size — 16 (the operator constant) by
# default, so the no-arg run reproduces the original sweep
CODES_SWEEP = (
    [int(x) for x in sys.argv[3].split(",")]
    if len(sys.argv) > 3
    else [16]
)
N_QUERIES = 10
C = 32
NPROBE = 8
K = sim._PQ_TOPK

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

# fixed coarse geometry: C corpus-point seeds, one Lloyd step
cent0 = qn.orderBy("vec_id").limit(C).select(
    F.col("vec_id").alias("c_id"), "q", "nq"
)
lists0 = ann_store._assign(qn, cent0, 1).select(
    F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
)
elems = lists0.join(
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
cent = newc.unionByName(
    cent0.join(newc.select("c_id"), "c_id", "left_anti")
).cache()
cent.count()

lists = ann_store._assign(qn, cent, 1).select(
    F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
).cache()
lists.count()
probes = ann_store._assign(
    qn.where(F.col("vec_id") < N_QUERIES), cent, NPROBE
).select(F.col("v_id").alias("q_id"), F.col("c_id").alias("probe_list")).cache()
probes.count()
centv = cent.select("c_id", F.col("q").alias("cq"))
resid = (
    qn.join(lists.withColumnRenamed("n_id", "vec_id"), "vec_id")
    .join(broadcast(centv), F.col("list_id") == F.col("c_id"))
    .select("vec_id", "list_id",
            F.zip_with(F.col("q"), F.col("cq"), lambda x, y: x - y).alias("q"))
).cache()
resid.count()

print(f"sf_dir={SF} corpus={n_corpus} C={C} nprobe={NPROBE} "
      f"recall@{K} over {N_QUERIES} queries", flush=True)

for subs in SUBS:
  for n_codes in CODES_SWEEP:
    sim._PQ_SUBS, sim._PQ_SUBDIM = subs, sim._DIM // subs
    sim._PQ_CODES = n_codes
    cb = sim._pq_train_cb(resid.select("vec_id", "q"))

    def sub_d2(vec_col):
        return F.aggregate(
            F.zip_with(
                F.expr(
                    f"slice({vec_col}, sub * {sim._PQ_SUBDIM} + 1, "
                    f"{sim._PQ_SUBDIM})"
                ),
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
    r = truth.join(out, ["q_id", "n_id"], "left_semi").count() / truth.count()
    print(f"subspaces={subs:2d} codes={n_codes:3d}: "
          f"recall@{K}={r:.3f}", flush=True)
