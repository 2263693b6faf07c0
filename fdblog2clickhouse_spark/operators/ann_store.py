"""Persisted ANN index lifecycle: IVF build → incremental insert →
search, all through disk (SURVEY §2.4).

`ann_ivf_topk` (similarity.py:198) proves the IVF *plan*; production
ANN is build-once-query-many: the codebook and inverted lists live
in storage, new vectors are INSERTED by assigning them against the
persisted codebook, and searches read only the index + probed
vectors. This operator runs that loop end to end on parquet:

  1. write the codebook (coarse centroid vectors) and the BASE
     corpus's inverted-list assignments (vec_id → list_id) to disk;
  2. a NEW vector batch (vec_id ≡ 0 mod 10) is assigned by READING
     the codebook from disk and its assignments are APPENDED to the
     lists table — the incremental insert;
  3. the query set probes nprobe lists through the ON-DISK index
     (lists + codebook read back from parquet) and ranks only
     vectors in probed lists.

Why the oracle can be the plain full-corpus IVF spelling (the exact
`ann_ivf_topk` SQL): centroid assignment depends only on (vector,
codebook) — never on other vectors — so incremental insert is
EXACTLY equivalent to a full rebuild, and the hash match proves both
that equivalence and the index roundtrip (any assignment row lost,
duplicated or mutated by the write/append/read cycle changes some
query's candidate set or ranking).

Scale shape: the codebook is broadcast-sized by construction; the
lists table is one row per vector (the partition key at 100 TB —
queries touch nprobe/k of it); insert cost is O(batch × centroids)
with no shuffle beyond the batch's own assignment window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .dedup import _quantized
from .sinkcheck import scratch_dir
from .similarity import (
    _ANN_IVF_SQL,
    _CENTROID_IDS,
    _IVF_TOPK,
    _N_PROBE,
    _N_QUERIES,
    _cosine_cols,
)

_INSERT_MOD = 10  # vec_id % 10 == 0 → the incremental-insert batch


def _assign(sub: DataFrame, cent: DataFrame, rank_cap: int) -> DataFrame:
    """Rank each vector's nearest centroids against a (possibly
    disk-read) codebook: broadcast cross-join + per-vector window —
    one row per vector in, rank_cap rows out, no data-keyed
    shuffle."""
    scored = sub.select(
        F.col("vec_id").alias("v_id"), F.col("q").alias("qa"), F.col("nq").alias("na")
    ).crossJoin(
        broadcast(
            cent.select(
                F.col("c_id"), F.col("q").alias("qb"), F.col("nq").alias("nb")
            )
        )
    )
    wa = Window.partitionBy("v_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.select("v_id", "c_id", _cosine_cols())
        .withColumn("crank", F.row_number().over(wa))
        .where(F.col("crank") <= rank_cap)
    )


def ann_ivf_store_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build → insert → search through the persisted index (module
    docstring). Output: identical schema/content to `ann_ivf_topk`
    (q_id, n_id, list_id, cosine, rank ≤ topk)."""
    root = scratch_dir("ivf_store")
    codebook_path = root + "/codebook"
    lists_path = root + "/lists"

    qn = _quantized(spark, sf_dir).cache()

    # 1. index BUILD: codebook + base assignments to disk
    qn.where(F.col("vec_id").isin(_CENTROID_IDS)).select(
        F.col("vec_id").alias("c_id"), "q", "nq"
    ).write.mode("overwrite").parquet(codebook_path)
    cent_disk = spark.read.parquet(codebook_path)
    base = qn.where(F.pmod(F.col("vec_id"), F.lit(_INSERT_MOD)) != 0)
    _assign(base, cent_disk, 1).select(
        F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
    ).write.mode("overwrite").parquet(lists_path)

    # 2. incremental INSERT: assign the new batch against the
    # persisted codebook, append to the lists table
    batch = qn.where(F.pmod(F.col("vec_id"), F.lit(_INSERT_MOD)) == 0)
    _assign(batch, spark.read.parquet(codebook_path), 1).select(
        F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
    ).write.mode("append").parquet(lists_path)

    # 3. SEARCH through the on-disk index: probe lists come from the
    # disk codebook too (a real query node holds no build state)
    lists = spark.read.parquet(lists_path)
    probes = _assign(
        qn.where(F.col("vec_id") < _N_QUERIES),
        spark.read.parquet(codebook_path),
        _N_PROBE,
    ).select(F.col("v_id").alias("q_id"), F.col("c_id").alias("probe_list"))

    qv = qn.select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("qa"), F.col("nq").alias("na")
    )
    nv = qn.select(
        F.col("vec_id").alias("n_id"), F.col("q").alias("qb"), F.col("nq").alias("nb")
    )
    cands = (
        nv.join(lists, "n_id")
        .join(broadcast(probes), F.col("list_id") == F.col("probe_list"))
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", "list_id", "qb", "nb")
        .join(broadcast(qv), "q_id")
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        cands.select("q_id", "n_id", "list_id", _cosine_cols())
        .withColumn("rank", F.row_number().over(wq).cast("int"))
        .where(F.col("rank") <= _IVF_TOPK)
    )


QUERIES = {
    "ann_ivf_store_search": ann_ivf_store_search,
}

ORACLE = {
    # the full-corpus IVF spelling, verbatim — incremental insert is
    # provably equivalent (assignment is per-vector independent), so
    # one oracle pins both the equivalence and the index roundtrip.
    "ann_ivf_store_search": _ANN_IVF_SQL,
}
