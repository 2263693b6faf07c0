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
    out = ivf_store_search_plan(spark, qn, codebook_path, lists_path)
    # materialize the (tiny, topk-per-query) result so the corpus
    # cache can be released before the next operator in a bench/sweep
    # session (ADVICE r9) — the returned frame is then a parquet scan.
    out.write.mode("overwrite").parquet(root + "/result")
    qn.unpersist()
    return spark.read.parquet(root + "/result")


def ivf_store_search_plan(
    spark: SparkSession, qn: DataFrame, codebook_path: str, lists_path: str
) -> DataFrame:
    """The LAZY query-node search plan over an on-disk IVF index —
    reusable (`compact_ivf_lists`'s invariance pin,
    tests/test_ann_store.py, re-runs it against the compacted lists
    table) and plan-testable (the operator above materializes its
    result, hiding the join tree behind a scan)."""
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


def compact_ivf_lists(
    spark: SparkSession, lists_path: str, *, n_files: int = 1
) -> int:
    """OPTIMIZE FINAL for the inverted-lists table: every
    `ann_ivf_store_search`-style insert batch appends one file group,
    so a long-running insert loop accumulates one tiny parquet file
    per batch — the same unmerged-parts failure mode the signature
    store has (VERDICT r9/r10 item: IVF store maintenance). Rewrites
    the lists into `n_files` files sorted by list_id, which is ALSO
    the search-time access pattern: probes read whole lists, so
    list_id locality tightens row-group min/max pruning for the
    lists join. Same crash-safe rename-aside swap as the signature
    store (this IS `compact_signature_store` with the lists sort
    key); search-result invariance before/after is CI-pinned by
    re-running `ivf_store_search_plan` against the compacted table
    (tests/test_ann_store.py). Returns the pre-compaction file
    count. Centroid refresh is intentionally NOT done here: the
    insert ≡ rebuild equivalence (module docstring) holds only for a
    frozen codebook, and refreshing centroids is a reindex, not a
    maintenance pass."""
    from .dedup_store import compact_signature_store

    return compact_signature_store(
        spark, lists_path, sort_col="list_id", n_files=n_files
    )


# ------------------------------------------------- ann_ivfpq_topk

def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production billion-vector combo (the FAISS
    IVF,PQ index family, public method): IVF restricts each query's
    candidates to its nprobe nearest inverted lists, and PQ scores
    those candidates through the asymmetric-distance LUT over 8-byte
    codes instead of raw vectors. Composes the two existing index
    shapes (`ann_ivf_topk` lists/probes + `ann_pq_topk` codes/LUT):
    at 100 TB the query-side cost is (corpus/k_lists)·nprobe LUT
    lookups per query — compressed candidates from a pruned
    partition of the corpus, never a full scan and never raw-vector
    I/O. All distances are exact BIGINTs; the codebooks are
    md5-derived constants shared with the oracle, so the composed
    plan stays hash-exact."""
    qn = _quantized(spark, sf_dir).cache()
    out = _ivfpq_plan(spark, qn)
    # cache-release discipline (ADVICE r9): park the tiny ranked
    # result on scratch, drop the corpus cache, return the scan.
    result = scratch_dir("ivfpq_result") + "/result"
    out.write.mode("overwrite").parquet(result)
    qn.unpersist()
    return spark.read.parquet(result)


def _ivfpq_plan(spark: SparkSession, qn: DataFrame) -> DataFrame:
    """The lazy IVF-PQ plan over a (cached) quantized-vector frame —
    split from the operator so plan tests can assert on the join
    tree before the result materialization hides it behind a scan."""
    from .similarity import (
        _PQ_SUBDIM,
        _pq_codebook,
    )

    # --- IVF side: inverted lists + query probes (broadcast codebook)
    cent = qn.where(F.col("vec_id").isin(_CENTROID_IDS)).select(
        F.col("vec_id").alias("c_id"), "q", "nq"
    )
    lists = _assign(qn, cent, 1).select(
        F.col("v_id").alias("n_id"), F.col("c_id").alias("list_id")
    )
    probes = _assign(qn.where(F.col("vec_id") < _N_QUERIES), cent, _N_PROBE).select(
        F.col("v_id").alias("q_id"), F.col("c_id").alias("probe_list")
    )

    # --- PQ side: per-vector codes + per-query asymmetric LUT
    cb = spark.createDataFrame(
        _pq_codebook(), "sub int, code int, carr array<bigint>"
    )

    def sub_d2(vec_col: str):
        return F.aggregate(
            F.zip_with(
                F.expr(f"slice({vec_col}, sub * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM})"),
                F.col("carr"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = qn.crossJoin(F.broadcast(cb)).select(
        "vec_id", "sub", "code", sub_d2("q").alias("d2")
    )
    w_arg = Window.partitionBy("vec_id", "sub").orderBy("d2", "code")
    codes = (
        scored.withColumn("rn", F.row_number().over(w_arg))
        .where(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )
    lut = (
        qn.where(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), "q")
        .crossJoin(F.broadcast(cb))
        .select("q_id", "sub", "code", sub_d2("q").alias("d2"))
    )

    # --- compose: ADC-score ONLY vectors in probed lists
    cand = (
        lists.join(broadcast(probes), F.col("list_id") == F.col("probe_list"))
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", "list_id")
    )
    adc = (
        cand.join(codes, F.col("n_id") == F.col("vec_id"))
        .join(broadcast(lut), ["q_id", "sub", "code"])
        .groupBy("q_id", "n_id", "list_id")
        .agg(F.sum("d2").alias("approx_dist"))
    )
    w_top = Window.partitionBy("q_id").orderBy("approx_dist", "n_id")
    return (
        adc.withColumn("rank", F.row_number().over(w_top).cast("int"))
        .where(F.col("rank") <= _IVF_TOPK)
        .select("q_id", "n_id", "list_id", "approx_dist", "rank")
    )


def _ivfpq_sql() -> str:
    from .dedup import _QUANT_CTE
    from .similarity import (
        _COS_SQL,
        _PQ_D2_SQL,
        _pq_codebook_values_sql,
    )

    return f"""
WITH {_QUANT_CTE},
cent AS (
  SELECT vec_id AS c_id, q, nq FROM qn
  WHERE vec_id IN ({', '.join(map(str, _CENTROID_IDS))})
),
assign AS (
  SELECT v.vec_id AS v_id, c.c_id,
         ROW_NUMBER() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_COS_SQL.format(a='v', b='c')} DESC, c.c_id ASC
         ) AS crank
  FROM qn v JOIN cent c ON TRUE
),
lists AS (SELECT v_id AS n_id, c_id AS list_id FROM assign WHERE crank = 1),
probes AS (
  SELECT v_id AS q_id, c_id AS probe_list FROM assign
  WHERE v_id < {_N_QUERIES} AND crank <= {_N_PROBE}
),
cb(sub, code, carr) AS (VALUES {_pq_codebook_values_sql()}),
scored AS (
  SELECT vec_id, sub, code, {_PQ_D2_SQL} AS d2 FROM qn, cb
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
    FROM scored
  ) t WHERE rn = 1
),
lut AS (
  SELECT qn.vec_id AS q_id, sub, code, {_PQ_D2_SQL} AS d2
  FROM qn, cb WHERE qn.vec_id < {_N_QUERIES}
),
cand AS (
  SELECT p.q_id, l.n_id, l.list_id
  FROM lists l JOIN probes p ON l.list_id = p.probe_list AND l.n_id <> p.q_id
),
adc AS (
  SELECT c.q_id, c.n_id, c.list_id, CAST(SUM(t.d2) AS BIGINT) AS approx_dist
  FROM cand c
  JOIN codes k ON k.vec_id = c.n_id
  JOIN lut t ON t.q_id = c.q_id AND t.sub = k.sub AND t.code = k.code
  GROUP BY 1, 2, 3
)
SELECT q_id, n_id, list_id, approx_dist, CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY approx_dist, n_id) AS rank
  FROM adc
) r WHERE rank <= {_IVF_TOPK}
"""


QUERIES = {
    "ann_ivf_store_search": ann_ivf_store_search,
    "ann_ivfpq_topk": ann_ivfpq_topk,
}

ORACLE = {
    # the full-corpus IVF spelling, verbatim — incremental insert is
    # provably equivalent (assignment is per-vector independent), so
    # one oracle pins both the equivalence and the index roundtrip.
    "ann_ivf_store_search": _ANN_IVF_SQL,
    "ann_ivfpq_topk": _ivfpq_sql(),
}
