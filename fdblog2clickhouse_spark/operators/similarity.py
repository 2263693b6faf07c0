"""Similarity search over `embeddings` (SURVEY §2.4).

- ann_topk_bruteforce: exact top-k cosine for a query set. The query
  side is tiny and broadcast; the candidate scan is embarrassingly
  parallel — the right baseline even at 100 TB when the query set is
  small.
- ann_lsh_topk: random-hyperplane LSH. Buckets are computed
  distributively (posexplode + broadcast plane join + partial aggs);
  the pair join shuffles on bucket id only — the scale path when the
  query set is large.
- embedding_norm_stats: per-label vector stats, fully JVM-side.

Hyperplanes are md5-derived integer constants (functions/hashing.py
h32), embedded as literals in both engines — no RNG, reproducible
anywhere. Vectors are integer-quantized (see operators/dedup.py) so
every dot product is exact.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .dedup import _QUANT_CTE, _dot, _quantized

_N_PLANES = 8
_DIM = 64
_N_QUERIES = 10
_TOPK = 5
_LSH_TOPK = 3


def _h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _planes() -> list[tuple[int, int, int]]:
    """(plane, dim_index, weight) — weights in [-10000, 10000],
    md5-derived, identical constants on both engines."""
    return [
        (p, i, (_h32_py(f"plane|{p}|{i}") % 20001) - 10000)
        for p in range(_N_PLANES)
        for i in range(_DIM)
    ]


def _cosine_cols():
    return (
        _dot("qa", "qb").cast("double")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
    ).alias("cosine")


_COS_SQL = (
    "CAST(list_sum(list_transform(list_zip({a}.q, {b}.q), p -> p[1] * p[2])) AS DOUBLE)"
    " / (sqrt(CAST({a}.nq AS DOUBLE)) * sqrt(CAST({b}.nq AS DOUBLE)))"
)


# --------------------------------------------- ann_topk_bruteforce

def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    qn = _quantized(spark, sf_dir)
    queries = qn.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("qa"), F.col("nq").alias("na")
    )
    cands = qn.select(
        F.col("vec_id").alias("n_id"), F.col("q").alias("qb"), F.col("nq").alias("nb")
    )
    pairs = cands.join(broadcast(queries), F.col("n_id") != F.col("q_id")).select(
        "q_id", "n_id", _cosine_cols()
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= _TOPK)
    )


_ANN_BRUTE_SQL = f"""
WITH {_QUANT_CTE},
queries AS (SELECT * FROM qn WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         {_COS_SQL.format(a='q', b='c')} AS cosine
  FROM queries q JOIN qn c ON c.vec_id <> q.vec_id
), ranked AS (
  SELECT q_id, n_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS INT) AS rank
  FROM pairs
)
SELECT q_id, n_id, cosine, rank FROM ranked WHERE rank <= {_TOPK}
"""


# -------------------------------------------------- ann_lsh_topk

def _buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane sign buckets, computed distributively:
    element explode → broadcast join with the (tiny) plane table →
    per-(vec, plane) partial sums → per-vec bit pack. Exact integer
    arithmetic end to end."""
    qn = _quantized(spark, sf_dir)
    pl = spark.createDataFrame(_planes(), "p int, i int, w long")
    el = qn.select("vec_id", F.posexplode("q").alias("i", "v"))
    dots = (
        el.join(broadcast(pl), "i")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("v") * F.col("w")).alias("dot"))
    )
    return dots.groupBy("vec_id").agg(
        F.expr(
            "CAST(sum(CASE WHEN dot >= 0 THEN shiftleft(1, p) ELSE 0 END) AS INT)"
        ).alias("bucket")
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qn = _quantized(spark, sf_dir)
    withb = qn.join(_buckets(spark, sf_dir), "vec_id")
    queries = withb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
        F.col("bucket").alias("qb_bucket"),
    )
    cands = withb.select(
        F.col("vec_id").alias("n_id"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
        F.col("bucket").alias("nb_bucket"),
    )
    pairs = cands.join(
        broadcast(queries),
        (F.col("nb_bucket") == F.col("qb_bucket")) & (F.col("n_id") != F.col("q_id")),
    ).select("q_id", "n_id", F.col("qb_bucket").alias("bucket"), _cosine_cols())
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= _LSH_TOPK)
    )


def _planes_values_sql() -> str:
    return ", ".join(f"({p},{i},{w})" for p, i, w in _planes())


_ANN_LSH_SQL = f"""
WITH {_QUANT_CTE},
planes(p, i, w) AS (VALUES {{PLANES}}),
el AS (
  SELECT vec_id, unnest(q) AS v,
         unnest(generate_series(0, len(q)-1)) AS i
  FROM qn
),
dots AS (
  SELECT vec_id, p, SUM(v * w) AS dot
  FROM el JOIN planes USING (i) GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dot >= 0 THEN (1 << p) ELSE 0 END) AS INT) AS bucket
  FROM dots GROUP BY 1
),
withb AS (SELECT qn.*, b.bucket FROM qn JOIN buckets b USING (vec_id)),
queries AS (SELECT * FROM withb WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id, q.bucket AS bucket,
         {_COS_SQL.format(a='q', b='c')} AS cosine
  FROM queries q
  JOIN withb c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT q_id, n_id, bucket, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS INT) AS rank
  FROM pairs
)
SELECT q_id, n_id, bucket, cosine, rank FROM ranked WHERE rank <= {_LSH_TOPK}
""".replace("{PLANES}", _planes_values_sql())


# --------------------------------------------- embedding_norm_stats

def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label squared-norm stats over quantized vectors. Exact
    integer aggregation (order-free) → fixed double post-ops."""
    qn = _quantized(spark, sf_dir)
    scale = float(10_000**2)
    agg = qn.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nq").alias("sum_nq"),
        F.min("nq").alias("min_nq"),
        F.max("nq").alias("max_nq"),
    )
    return agg.select(
        "label",
        "n",
        (F.col("sum_nq") / F.col("n") / F.lit(scale)).alias("avg_norm_sq"),
        (F.col("min_nq") / F.lit(scale)).alias("min_norm_sq"),
        (F.col("max_nq") / F.lit(scale)).alias("max_norm_sq"),
    ).orderBy("label")


_NORM_STATS_SQL = f"""
WITH {_QUANT_CTE},
agg AS (
  SELECT label, COUNT(*) AS n, SUM(nq) AS sum_nq,
         MIN(nq) AS min_nq, MAX(nq) AS max_nq
  FROM qn GROUP BY 1
)
SELECT label, n,
       sum_nq / n / 100000000.0 AS avg_norm_sq,
       min_nq / 100000000.0 AS min_norm_sq,
       max_nq / 100000000.0 AS max_norm_sq
FROM agg ORDER BY label
"""


QUERIES = {
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_lsh_topk": ann_lsh_topk,
    "embedding_norm_stats": embedding_norm_stats,
}

ORACLE = {
    "ann_topk_bruteforce": _ANN_BRUTE_SQL,
    "ann_lsh_topk": _ANN_LSH_SQL,
    "embedding_norm_stats": _NORM_STATS_SQL,
}
