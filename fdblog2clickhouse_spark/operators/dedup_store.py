"""Persisted MinHash signature-store lifecycle (SURVEY §2.3).

`doc_minhash_signatures` (dedup.py) defines the STORE SCHEMA a
100 TB pipeline persists; the incremental ops (dedup.py:478,
streaming/queries.py) prove batch-vs-base scoring — but until round
9 nothing exercised the actual production admission LOOP:

    read store from disk → score batch → append admitted docs'
    signatures → next batch sees them.

This module is that loop, driver-oracle-checked. The operator runs
TWO sequential admission batches against a parquet store on disk
(base corpus signatures written first, each batch's signatures
appended after scoring), while the DuckDB oracle computes the
ONE-SHOT spelling — every near-dup pair over the full corpus except
base×base pairs. The hash match IS the lifecycle proof: two-batch
sequential admission, reading the store from disk both times,
produces exactly the pairs one batch over the union would.

Why the equivalence is exact (and the design choices it forces):

* Admission scores each batch against the store AND batch-internally
  (pairs with at least one NEW side, canonical da < db). Sequential
  steps then partition the non-base×base pair space: step 1 emits
  batch1×base ∪ batch1×batch1; step 2 — whose store now contains
  batch1 — emits batch2×(base∪batch1) ∪ batch2×batch2. No overlap,
  no gap, any batch slicing gives the same union.
* The candidate rule is the same first-shared-band gate as every
  MinHash op (in-row test on the carried key arrays — pair-distinct
  with zero extra shuffle), which depends only on the two docs'
  signatures, never on which batch they arrived in.
* No bucket cap here, deliberately: `_LSH_BUCKET_CAP` is a
  bulk-backfill guard whose population (store∪batch at score time)
  would differ between sequential and one-shot runs, breaking the
  batch-boundary-independence this operator exists to prove. A
  production admission loop bounds degenerate buckets upstream (the
  backfill that built the base store routed mega-buckets to exact
  dedup) — documented here, asserted nowhere else needed.

Scale shape: each step touches the base corpus ONLY through the
persisted store (O(store) band rows read from parquet, no text
recompute) plus the shingle arrays of docs that appear in candidate
pairs; the band join is batch×(store∪batch) via hash-partitioned
band keys. Cost per batch is O(batch + candidates) — the store
read is a columnar scan of 21 small columns.

Reference parity: the reference's whole contract is
ingest-then-query (README.md:139-141 — what you POSTed is what the
table serves); this is that contract applied to the dedup store:
what one batch appended, the next batch's scoring reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    _FIRST_BAND_GATE_SQL,
    _JACCARD_THRESHOLD,
    _N_BANDS,
    _band_keys_col,
    _doc_shingles,
    _first_band_gate,
    _minhash_bands_cte,
    _minhash_sig,
    h32_spark_sql,
    h32_sql,
    jaccard_on_candidates,
    shingles_cte_sql,
)
from .sinkcheck import scratch_dir

# Two sequential admission batches over the sf corpus: base is
# everything else. pmod so the slices stay a true 3-way partition
# even for negative ids (same latent-sign fix as sinkcheck).
_STORE_MOD = 10
_BATCH1_REM = 0
_BATCH2_REM = 5


def _slice(col, rem: int):
    return F.pmod(col, F.lit(_STORE_MOD)) == rem


def _base_pred(col):
    return (~_slice(col, _BATCH1_REM)) & (~_slice(col, _BATCH2_REM))


def signature_frame(sh: DataFrame) -> DataFrame:
    """(doc_id, sh) → the persistable store row: 16 signature values
    + 4 band keys — the exact `doc_minhash_signatures` schema, built
    here from any doc subset so base and batches share one code
    path."""
    hv = sh.select("doc_id", F.explode("sh").alias("s")).select(
        "doc_id", F.expr(h32_spark_sql("s")).alias("h")
    )
    sig = _minhash_sig(hv)
    ks = _band_keys_col()
    return sig.select(
        "doc_id",
        *[f"s{i}" for i in range(16)],
        *[ks.getItem(b).alias(f"bk{b}") for b in range(_N_BANDS)],
    )


def store_band_rows(store: DataFrame) -> DataFrame:
    """Persisted store rows → joinable band rows (doc_id, ks, band,
    band_key). This is the ONLY reconstruction the store needs at
    read time: one posexplode over the 4 stored keys; the carried ks
    array serves the first-shared-band gate in-row. Works identically
    on a just-computed batch signature frame — both sides of every
    admission join go through this one function."""
    ks = F.array(*[F.col(f"bk{b}") for b in range(_N_BANDS)])
    return store.select("doc_id", ks.alias("ks")).select(
        "doc_id", "ks", F.posexplode("ks").alias("band", "band_key")
    )


def admission_candidates(
    store_sigs: DataFrame, batch_sigs: DataFrame
) -> DataFrame:
    """Band candidates with at least one NEW side, canonical
    (da < db), pair-distinct via the first-shared-band gate. The
    band join is the only shuffle: hash-partition by (band,
    band_key); store×store pairs are excluded at the join, so the
    pair work is O(batch-involved candidates) however large the
    store grows."""
    rows = store_band_rows(store_sigs.select(
        "doc_id", *[f"bk{b}" for b in range(_N_BANDS)]
    )).withColumn("is_new", F.lit(False)).unionByName(
        store_band_rows(batch_sigs.select(
            "doc_id", *[f"bk{b}" for b in range(_N_BANDS)]
        )).withColumn("is_new", F.lit(True))
    )
    a, b_ = rows.alias("a"), rows.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.is_new") | F.col("b.is_new")),
        )
        .where(_first_band_gate())
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
    )


def dedup_store_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production admission loop, end to end, on disk:

    1. write the BASE corpus's signature store (parquet);
    2. batch 1 (doc_id ≡ 0 mod 10): READ the store from disk, band-
       join batch signatures against it (plus batch-internal pairs),
       verify candidates with exact Jaccard on the docs' shingle
       sets, materialize the evidence, APPEND batch 1's signatures
       to the store;
    3. batch 2 (doc_id ≡ 5 mod 10): read the GROWN store from disk —
       batch 1's appended signatures are now base — and repeat.

    Returns the union of both steps' admission evidence
    (da, db, jaccard ≥ 0.5), da < db canonical. The oracle computes
    the one-shot union spelling, so the hash match proves
    sequential-reads-the-appends ≡ one-batch-over-union (see module
    docstring for why that equivalence is exact).

    Each step's evidence is written to scratch BEFORE its append so
    the store read each plan sees is unambiguous (reads list their
    parquet files eagerly, but the materialize-then-append order
    makes the lifecycle explicit rather than resting on listing
    timing)."""
    root = scratch_dir("minhash_store")
    store_path = root + "/signatures"
    evidence = root + "/evidence"

    # shingle sets once for the whole corpus: batch signature builds
    # and exact verification both draw from it. Cached because three
    # batch builds + two verify joins re-walk it.
    sh = _doc_shingles(spark, sf_dir).cache()
    feats = sh.select("doc_id", F.col("sh").alias("fs"))

    # 1. base store on disk
    signature_frame(sh.where(_base_pred(F.col("doc_id")))).write.mode(
        "overwrite"
    ).parquet(store_path)

    for step, rem in ((1, _BATCH1_REM), (2, _BATCH2_REM)):
        batch_sigs = signature_frame(sh.where(_slice(F.col("doc_id"), rem)))
        store_sigs = spark.read.parquet(store_path)
        cand = admission_candidates(store_sigs, batch_sigs)
        verified = jaccard_on_candidates(cand, feats, _JACCARD_THRESHOLD)
        verified.write.mode("append").parquet(evidence)
        # admit the whole batch: the store tracks every doc seen
        # (keep/drop is a downstream policy over the evidence), so
        # batch 2 must be scored against batch 1's signatures too.
        batch_sigs.write.mode("append").parquet(store_path)

    return spark.read.parquet(evidence).select("da", "db", "jaccard")


_STORE_ADMISSION_SQL = f"""
WITH {shingles_cte_sql('documents', 'text', 3)},
hv AS (
  SELECT doc_id, {h32_sql('s')} AS h FROM sh
),
{_minhash_bands_cte()},
cand AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
  WHERE {_FIRST_BAND_GATE_SQL}
    AND NOT (a.doc_id % {_STORE_MOD} NOT IN ({_BATCH1_REM}, {_BATCH2_REM})
         AND b.doc_id % {_STORE_MOD} NOT IN ({_BATCH1_REM}, {_BATCH2_REM}))
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT da, db, COUNT(*) AS i
  FROM cand
  JOIN sh sa ON sa.doc_id = da
  JOIN sh sb ON sb.doc_id = db AND sa.s = sb.s
  GROUP BY 1, 2
)
SELECT da, db, i / (ca.n + cb.n - i) AS jaccard
FROM inter JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
WHERE i / (ca.n + cb.n - i) >= {_JACCARD_THRESHOLD}
"""


QUERIES = {
    "dedup_store_admission": dedup_store_admission,
}

ORACLE = {
    "dedup_store_admission": _STORE_ADMISSION_SQL,
}
