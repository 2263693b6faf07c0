"""Does a SECOND Lloyd step on the PQ codebook buy recall?
tools/ivfpq_code_budget.py showed the code budget saturating at 8
bytes/vector with codebook quality as the remaining binder —
`_pq_train_cb` is one exact Lloyd iteration by design (seed with
corpus subvectors, one E+M). This tool iterates the SAME exact
E/M spelling K times at the tool level (no operator change) over
the C=32 1-Lloyd coarse geometry, measuring recall@3 per iteration
count — the decision basis for whether refresh-ivf should iterate
PQ training (a possible r17 change: measure first).

Usage: python tools/ivfpq_lloyd2_pq.py [SF_DIR] [ITERS1,ITERS2,...]
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
ITERS = (
    [int(x) for x in sys.argv[2].split(",")]
    if len(sys.argv) > 2
    else [1, 2, 4]
)
N_QUERIES = 10
C = 32
NPROBE = 8
K = sim._PQ_TOPK
SUBS, SUBDIM = sim._PQ_SUBS, sim._PQ_SUBDIM
CODES = sim._PQ_CODES

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
qn = _quantized(spark, SF).cache()
qn.count()

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

# C=32 1-Lloyd coarse geometry (ivfpq_recall_k's mid point)
cent0 = qn.orderBy("vec_id").limit(C).select(
    F.col("vec_id").alias("c_id"), "q", "nq"
)
l0 = ann_store._assign(qn, cent0, 1).select(
    F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
)
elems = l0.join(qn.select(F.col("vec_id").alias("n_id"), "q"), "n_id").select(
    "list_id", F.posexplode("q").alias("pos", "val")
)
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
    .select("vec_id", F.zip_with(
        F.col("q"), F.col("cq"), lambda x, y: x - y
    ).alias("q"))
).cache()
resid.count()

sv = resid.select(
    "vec_id",
    F.explode(F.sequence(F.lit(0), F.lit(SUBS - 1))).alias("sub"),
    "q",
).select(
    "vec_id",
    "sub",
    F.expr(f"slice(q, sub * {SUBDIM} + 1, {SUBDIM})").alias("sv"),
).cache()
sv.count()


def d2(a, b):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )


def e_step(cb):
    """Nearest code per (vec, sub) — exact BIGINT, code-asc tiebreak
    (the `_pq_train_cb` spelling)."""
    scored = sv.join(broadcast(cb), "sub").select(
        "vec_id", "sub", "code", d2("sv", "carr").alias("d")
    )
    wn = Window.partitionBy("vec_id", "sub").orderBy("d", "code")
    return (
        scored.withColumn("rn", F.row_number().over(wn))
        .where(F.col("rn") == 1).select("vec_id", "sub", "code")
    )


def m_step(assign, cb):
    """FLOOR(sum/count) per (sub, code, pos); empty codes keep their
    previous carr (the vanished-list rule)."""
    el = assign.join(sv, ["vec_id", "sub"]).select(
        "sub", "code", F.posexplode("sv").alias("pos", "val")
    )
    means = el.groupBy("sub", "code", "pos").agg(
        F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
        .cast("long").alias("cv")
    )
    new = (
        means.groupBy("sub", "code")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
        ).alias("carr"))
    )
    return new.unionByName(
        cb.join(new.select("sub", "code"), ["sub", "code"], "left_anti")
    )


def recall(cb):
    codes = e_step(cb)
    qres = (
        qn.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), "q")
        .join(broadcast(probes), "q_id")
        .join(broadcast(centv), F.col("probe_list") == F.col("c_id"))
        .select("q_id", "probe_list", F.zip_with(
            F.col("q"), F.col("cq"), lambda x, y: x - y
        ).alias("q"))
    )
    lut = (
        qres.select(
            "q_id", "probe_list",
            F.explode(F.sequence(F.lit(0), F.lit(SUBS - 1))).alias("sub"),
            "q",
        )
        .select(
            F.col("q_id").alias("lq_id"),
            F.col("probe_list").alias("l_list"),
            "sub",
            F.expr(f"slice(q, sub * {SUBDIM} + 1, {SUBDIM})").alias("qsv"),
        )
        .join(broadcast(cb), "sub")
        .select(
            "lq_id", "l_list", F.col("sub").alias("lsub"),
            F.col("code").alias("lcode"), d2("qsv", "carr").alias("d"),
        )
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
        .groupBy("q_id", "n_id").agg(F.sum("d").alias("ad"))
    )
    wt = Window.partitionBy("q_id").orderBy("ad", "n_id")
    out = (
        adc.withColumn("rn", F.row_number().over(wt))
        .where(F.col("rn") <= K).select("q_id", "n_id")
    )
    return truth.join(out, ["q_id", "n_id"], "left_semi").count() / truth.count()


seeds = sv.where(F.col("vec_id") < CODES).select(
    "sub", F.col("vec_id").cast("int").alias("code"), F.col("sv").alias("carr")
)
def mse(cb):
    """Mean squared quantization error over all (vec, sub) cells —
    the objective Lloyd minimizes; printed beside recall to show
    whether extra iterations improve the objective while degrading
    the ranking, or degrade both (pure floor-rounding drift)."""
    scored = sv.join(broadcast(cb), "sub").select(
        "vec_id", "sub", "code", d2("sv", "carr").alias("d")
    )
    wn = Window.partitionBy("vec_id", "sub").orderBy("d", "code")
    best = scored.withColumn("rn", F.row_number().over(wn)).where(
        F.col("rn") == 1
    )
    return best.agg(F.avg("d")).first()[0]


cb = seeds
max_it = max(ITERS)
print(f"sf_dir={SF} C={C} nprobe={NPROBE} subs={SUBS} recall@{K}", flush=True)
for it in range(1, max_it + 1):
    # localCheckpoint, not cache: each iteration's plan otherwise
    # nests the previous one's window-over-join lineage and the
    # driver OOMs compiling it by iteration 3-4
    cb = m_step(e_step(cb), cb).localCheckpoint()
    if it in ITERS:
        print(
            f"pq_lloyd_iters={it}: recall@{K}={recall(cb):.3f} "
            f"mse={mse(cb):.1f}",
            flush=True,
        )
