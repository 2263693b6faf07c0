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
    _COSINE_THRESHOLD,
    _dot,
    _FIRST_BAND_GATE_SQL,
    _HYPERPLANE_GATE_SQL,
    _JACCARD_THRESHOLD,
    _N_BANDS,
    _NEARDUP_COS_SQL_BODY,
    _NEARDUP_LSH_BAND_BITS,
    _NEARDUP_LSH_BANDS,
    _QUANT_CTE,
    _band_keys_col,
    _doc_shingles,
    _hyperplane_bands_cte,
    _minhash_bands_cte,
    _minhash_sig,
    _neardup_planes,
    _neardup_planes_values_sql,
    _quantized,
    h32_spark_sql,
    h32_sql,
    jaccard_on_candidates,
    shingles_cte_sql,
)

# NOTE: sinkcheck's scratch_dir is imported INSIDE the operators, not
# here — sinkcheck's module-level oracle build imports
# streaming.queries, which imports this module's union-spelling SQL;
# a top-level import here would close that cycle before
# _STORE_ADMISSION_SQL exists.

# Two sequential admission batches over the sf corpus: base is
# everything else. pmod so the slices stay a true 3-way partition
# even for negative ids (same latent-sign fix as sinkcheck). The
# oracles below use the sign-safe ((x % m) + m) % m spelling so
# DuckDB's C-style % classifies negative ids identically (ADVICE r9).
_STORE_MOD = 10
_BATCH1_REM = 0
_BATCH2_REM = 5


def _pmod_sql(expr: str) -> str:
    """Sign-safe modulo for the oracle SQL — matches Spark's pmod."""
    return f"((({expr} % {_STORE_MOD}) + {_STORE_MOD}) % {_STORE_MOD})"


def _slice(col, rem: int):
    return F.pmod(col, F.lit(_STORE_MOD)) == rem


def _base_pred(col):
    return (~_slice(col, _BATCH1_REM)) & (~_slice(col, _BATCH2_REM))


def shingle_frame(d: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, sh distinct-shingle array) — the
    `_doc_shingles` transform over ANY document frame (a table read,
    a stream micro-batch), so batch and streaming admission share
    one feature path. Docs with < 3 tokens have no shingles and are
    excluded (same rule as every MinHash op and its oracle)."""
    from ..functions.text import shingles_expr, tokens

    t = d.select("doc_id", tokens(F.col("text")).alias("t")).where(
        F.size("t") >= 3
    )
    return t.select(
        "doc_id", F.array_distinct(F.expr(shingles_expr("t", 3))).alias("sh")
    )


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


def store_band_rows(
    store: DataFrame, key_cols: list[str] | None = None, id_col: str = "doc_id"
) -> DataFrame:
    """Persisted store rows → joinable band rows (id, ks, band,
    band_key). This is the ONLY reconstruction the store needs at
    read time: one posexplode over the stored keys; the carried ks
    array serves the first-shared-band gate in-row. Works identically
    on a just-computed batch signature frame — both sides of every
    admission join go through this one function. key_cols defaults to
    the MinHash store's bk0..bk3; the vector store passes its
    bv0..bv5 sign-band ints (the gate is type-agnostic)."""
    key_cols = key_cols or [f"bk{b}" for b in range(_N_BANDS)]
    ks = F.array(*[F.col(c) for c in key_cols])
    return store.select(F.col(id_col).alias("id"), ks.alias("ks")).select(
        "id", "ks", F.posexplode("ks").alias("band", "band_key")
    )


def _first_band_gate_n(n_bands: int):
    """In-row first-shared-band predicate over the generic band rows
    (same rule as dedup._first_band_gate, parameterized by band
    count for the two store families)."""
    return F.expr(
        " AND ".join(
            f"(a.band <= {j} OR a.ks[{j}] != b.ks[{j}])"
            for j in range(n_bands - 1)
        )
    )


def candidates_from_rows(
    store_rows: DataFrame, batch_rows: DataFrame, n_bands: int
) -> DataFrame:
    """The admission band join over PREBUILT band rows (id, ks, band,
    band_key) — split from `admission_candidates` so the store side
    can come from the band-partitioned index's PRUNED read
    (`pruned_store_rows`) instead of exploding a full store scan.
    Band candidates with at least one NEW side, canonical (da < db),
    pair-distinct via the first-shared-band gate; store×store pairs
    are excluded at the join, so the pair work is O(batch-involved
    candidates) however large the store grows."""
    rows = store_rows.withColumn("is_new", F.lit(False)).unionByName(
        batch_rows.withColumn("is_new", F.lit(True))
    )
    a, b_ = rows.alias("a"), rows.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.is_new") | F.col("b.is_new")),
        )
        .where(_first_band_gate_n(n_bands))
        .select(F.col("a.id").alias("da"), F.col("b.id").alias("db"))
    )


def admission_candidates(
    store_sigs: DataFrame,
    batch_sigs: DataFrame,
    key_cols: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """`candidates_from_rows` with both sides exploded from flat
    signature frames — the spelling the store-lifecycle proof ops
    and the streaming admission path use. The band join is the only
    shuffle: hash-partition by (band, band_key)."""
    key_cols = key_cols or [f"bk{b}" for b in range(_N_BANDS)]
    return candidates_from_rows(
        store_band_rows(store_sigs, key_cols, id_col),
        store_band_rows(batch_sigs, key_cols, id_col),
        len(key_cols),
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
    from .sinkcheck import scratch_dir

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

    # the returned frame is a parquet scan — the corpus-sized shingle
    # cache has served its last read, so release executor storage
    # before the next operator in a bench/sweep session (ADVICE r9).
    sh.unpersist()
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
    AND NOT ({_pmod_sql('a.doc_id')} NOT IN ({_BATCH1_REM}, {_BATCH2_REM})
         AND {_pmod_sql('b.doc_id')} NOT IN ({_BATCH1_REM}, {_BATCH2_REM}))
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


def compact_signature_store(
    spark: SparkSession, path: str, *, sort_col: str = "bk0", n_files: int = 1
) -> int:
    """OPTIMIZE FINAL for the (flat-layout) signature store: every
    admission batch appends one file group, so a long-running
    admission loop accumulates one tiny parquet file per batch —
    scan-open overhead and listing pressure on every subsequent
    store read, the same unmerged-parts failure mode
    `optimize_mergetree` handles for the time-partitioned table.
    Rewrites the store into `n_files` files sorted by a band key
    (band-key locality tightens row-group min/max stats for the
    admission band join's store scan), through a staging dir so a
    crash leaves old or new, never a mix: the old store is renamed
    ASIDE first, the staging dir renamed into place, and only then
    is the old copy deleted — at every instant either `path` exists
    with complete content or `path + '.old'` does (ADVICE r9: the
    previous rmtree-then-rename order had a window with neither).
    Returns the file count before compaction. Content-invariance
    (admission results identical before/after) is CI-pinned."""
    import glob
    import os
    import shutil

    # finish a previous crash-interrupted swap: the .old dir is the
    # complete pre-compaction store — restore it if path vanished.
    # Then a crashed granular fold's per-partition swaps: compaction
    # reads the live dirs, so a missing bucket would lose its rows.
    old = path + ".old"
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)
    _claim_rmtree(old)
    heal_table_fold(path)

    lay = table_layout(path)
    staging = path + ".compact"
    if lay is not None:
        # bucketed layout: compact WITHIN each pb partition (the
        # banded-index compactor's shape — `n_files` is the
        # per-partition trigger), keep the hive dirs and the marker
        # so pruned reads survive the rewrite unchanged.
        part_dirs = glob.glob(os.path.join(path, f"{_TBL_PB}=*"))
        counts = [
            len(glob.glob(os.path.join(d, "*.parquet"))) for d in part_dirs
        ]
        n_before = sum(counts)
        if not counts or max(counts) <= n_files:
            return n_before
        (
            spark.read.parquet(path)
            .repartition(_TBL_PB)
            .sortWithinPartitions(sort_col)
            .write.partitionBy(_TBL_PB)
            .mode("overwrite")
            .parquet(staging)
        )
        shutil.copy2(
            os.path.join(path, _TBL_META), os.path.join(staging, _TBL_META)
        )
        _swap_aside(path, staging)
        return n_before

    files = glob.glob(os.path.join(path, "*.parquet"))
    if len(files) <= n_files:
        return len(files)
    (
        spark.read.parquet(path)
        .repartition(n_files)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(staging)
    )
    _swap_aside(path, staging)
    return len(files)


# ------------------- representative (exact-dedup pre-pass) store
#
# VERDICT r9/r10 item #1: the admission kernel is deliberately
# uncapped, so a boilerplate-heavy rotation (B byte-identical docs)
# makes the band join quadratic in B and grows the store with
# signatures it already knows. The production fix is UPSTREAM of the
# kernel: collapse token-identical docs to ONE representative
# signature row plus a membership side table. Docs with identical
# token streams have identical shingle sets, identical MinHash
# signatures and band keys, and identical exact-Jaccard relations to
# every other doc — so one rep row carries the whole group through
# candidate generation AND verification, and a degenerate bucket of
# B copies reaches `admission_candidates` as ONE row. The store then
# grows O(distinct contents), not O(docs).
#
# Equivalence (proved by `dedup_store_rep_admission`'s oracle, which
# is the UNCHANGED one-shot union SQL of the uncapped op): run the
# lifecycle at group level — scoring each batch's new groups PLUS a
# rescore of store groups the batch touched (gained a member) — then
# expand group-level evidence back through membership:
#   * within-group member pairs are exact dups (jaccard 1), emitted
#     for every pair with ≥1 non-base side;
#   * cross-group member pairs inherit the rep pair's jaccard.
# The touched-group rescore is what makes the expansion complete: a
# pure-base group pair is needed downstream only once one of the two
# groups gains a batch member, and that is exactly the step that
# rescored it. Every group appears on exactly one side of the band
# join (touched groups move to the batch side), so no pair is
# emitted twice within a step; cross-step repeats collapse under
# DISTINCT because the scoring is deterministic.


def rep_group_frame(d: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, gh, t): gh = md5 of the exact token
    stream (tokens contain no whitespace, so the single-space join is
    injective). Docs with < 3 tokens have no shingles/signature and
    are excluded — same eligibility rule as `shingle_frame`."""
    from ..functions.text import tokens

    t = d.select("doc_id", tokens(F.col("text")).alias("t")).where(
        F.size("t") >= 3
    )
    return t.select("doc_id", F.md5(F.concat_ws(" ", "t")).alias("gh"), "t")


def rep_reps(g: DataFrame) -> DataFrame:
    """Group frame → one row per content group: (gh, group_id, t).
    Same gh ⟹ identical token array, so `first(t)` is exact (not a
    sample) and the whole rep choice is ONE aggregate — no join back
    against the group frame."""
    return g.groupBy("gh").agg(
        F.min("doc_id").alias("group_id"), F.first("t").alias("t")
    )


def rep_signature_frame(reps: DataFrame) -> DataFrame:
    """Rep rows → one persistable signature row PER GROUP:
    (group_id, gh, s0..s15, bk0..bk3). Built with the IN-ROW MinHash
    form (`_minhash_sig_inrow`'s rationale: the shingle arrays are
    NOT otherwise materialized here — the store persists signatures
    only), so the whole build is one narrow select chain with ZERO
    shuffles after the rep aggregate: shingles → h32 → 16 in-row
    permutation minima → band keys, gh carried through instead of
    joined back (the joined-back spelling cost two extra corpus
    shuffles per admission step, measured in the round-11 rep-op
    cost audit)."""
    from ..functions.text import shingles_expr
    from .dedup import _MINHASH_A, _MINHASH_B, _MINHASH_P

    hashed = reps.select(
        "group_id",
        "gh",
        F.expr(
            f"transform(array_distinct({shingles_expr('t', 3)}), "
            f"s -> {h32_spark_sql('s')})"
        ).alias("fs"),
    )
    sig = hashed.select(
        "group_id",
        "gh",
        *[
            F.array_min(
                F.expr(
                    f"transform(fs, h -> ({_MINHASH_A[i]}L * h + "
                    f"{_MINHASH_B[i]}L) % {_MINHASH_P}L)"
                )
            ).alias(f"s{i}")
            for i in range(16)
        ],
    )
    ks = _band_keys_col()
    return sig.select(
        "group_id",
        "gh",
        *[f"s{i}" for i in range(16)],
        *[ks.getItem(b).alias(f"bk{b}") for b in range(_N_BANDS)],
    )


def members_path(store: str) -> str:
    """The membership side table that rides along with a rep store:
    (doc_id, gh, group_id), one row per admitted doc. Kept OUTSIDE
    the store dir so parquet listing of the signatures never sees
    it."""
    return store.rstrip("/") + "_members"


# ---------------------- band-partitioned store index (scan pruning)
#
# VERDICT r9 #3 / r10 #4: every admit used to read the ENTIRE
# signature store for the band join's store side — compaction sorted
# by bk0 but the join matches on all four band keys, so row-group
# stats never pruned bands 1-3. The fix is a band-row INDEX of the
# store, hive-partitioned by (band, kb = pmod(band_key, buckets)):
# a store row can only match a batch row on an exact (band,
# band_key), which pins its kb — so reading the partitions named by
# the batch's own (band, kb) set is a provable superset of every
# possible match, and everything else is never opened. The batch's
# (band, kb) set is ≤ 4 × _BANDED_BUCKETS entries (collected to the
# driver as a partition-filter literal — bounded by the layout, not
# the data). The flat signature store remains the source of truth
# (gh classification, touched-group sig retrieval — 2-of-22-column
# projections); the index carries the ks array in-row so the
# first-shared-band gate needs no join back.

_BANDED_BUCKETS = 16  # fallback when a build's row count is unknown
# (fresh builds auto-size from the flat signature count — see
# _auto_buckets below; growth re-buckets UP via compact-store)
_BANDED_META = "_index_meta.json"  # leading '_': parquet listing skips it


def banded_path(store: str) -> str:
    return store.rstrip("/") + "_bands"


def banded_layout(path: str) -> dict | None:
    """The layout a persisted index was BUILT with: bucket count AND
    band-key columns. The kb partition values are a function of both,
    so readers and appenders must bucket batch keys with the index's
    own layout — using in-process defaults against an index built at
    a different setting would silently select partitions where the
    matching rows don't live (review finding, round 11). Markers
    written before the vector store existed lack key_cols and default
    to the MinHash bk0..bk3. None = no marker (index not yet
    written)."""
    import json
    import os

    meta = os.path.join(path, _BANDED_META)
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        lay = json.load(f)
    return {
        "buckets": int(lay["buckets"]),
        "key_cols": list(
            lay.get("key_cols", [f"bk{b}" for b in range(_N_BANDS)])
        ),
    }


def banded_buckets(path: str) -> int | None:
    lay = banded_layout(path)
    return lay["buckets"] if lay else None


def _kb_expr(key_type, buckets: int):
    """Bucket expression for a band-key value. MinHash keys are md5
    hex strings — bucket on the first 8 hex chars (uniform, and
    deterministic across engines); hyperplane keys are sign-band
    ints — pmod directly."""
    from pyspark.sql.types import StringType

    if isinstance(key_type, StringType):
        return F.expr(
            "CAST(pmod(CAST(conv(substring(band_key, 1, 8), 16, 10) "
            f"AS BIGINT), {buckets}) AS INT)"
        )
    return F.expr(f"CAST(pmod(CAST(band_key AS BIGINT), {buckets}) AS INT)")


def banded_rows_frame(
    sigs: DataFrame,
    buckets: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Flat rep-store signature rows → the index rows (group_id, ks,
    band, band_key, kb). One posexplode, no shuffle; the partitioned
    write's hive layout does the bucketing. Works over either store
    family: MinHash bk0..bk3 (string keys, the default) or the
    hyperplane store's bv0..bv5 (int sign bands)."""
    b = buckets or _BANDED_BUCKETS
    rows = store_band_rows(sigs, key_cols, id_col="group_id").select(
        F.col("id").alias("group_id"), "ks", "band", "band_key"
    )
    kb = _kb_expr(rows.schema["band_key"].dataType, b)
    return rows.select("group_id", "ks", "band", "band_key", kb.alias("kb"))


def write_banded_index(
    sigs: DataFrame,
    path: str,
    mode: str,
    key_cols: list[str] | None = None,
    buckets: int | None = None,
    sized_from: str | None = None,
) -> None:
    """One file per (band, kb) partition per write: without the
    repartition, EVERY shuffle partition of the source writes into
    every hive partition (up to 32 files × 4 × _BANDED_BUCKETS dirs
    per append) and the reader's listing/open cost swamps the
    pruning it came for — measured 4-5 s of fixed overhead at sf0.1
    before this clustering. The bucket count is PERSISTED in a
    marker file at build time and every append honors the persisted
    layout, so raising _BANDED_BUCKETS for new stores never
    corrupts an existing index. The index dir always exists after
    this call (a hive write of an empty frame creates nothing on
    its own) — readers rely on that to tell 'legitimately empty'
    from 'index lost'."""
    import json
    import os

    if mode == "append" and os.path.exists(path):
        lay = banded_layout(path)
        if lay is None:
            # an index dir without a marker is a crashed overwrite
            # build — appending with a GUESSED layout would mix kb
            # conventions; force the rebuild instead
            raise RuntimeError(
                f"banded index at {path} has no layout marker "
                "(interrupted build?): rebuild it with mode='overwrite'"
            )
        buckets, key_cols = lay["buckets"], lay["key_cols"]
        persisted = None
    else:
        key_cols = list(key_cols or [f"bk{b}" for b in range(_N_BANDS)])
        persisted = None
        if buckets is None:
            # data-derived initial bucket count (r18, see
            # _auto_buckets): rows/partition-dir is groups/buckets
            # (n_bands × groups rows over n_bands × buckets dirs), so
            # the sizing input is the flat signature count. One
            # persist + count; build sites feed this a just-written
            # store's read_table, so the count is a single columnar
            # scan. Growth keeps the rebucket story: compact-store
            # aligns the index UP with the flat store's decision.
            # `sized_from` (a flat-store path whose marker caches its
            # exact row count) skips even that job — the bootstrap
            # call sites build the index from the store they just
            # wrote, whose count the write recorded for free.
            rows = _marker_rows(sized_from) if sized_from else None
            if rows is not None:
                buckets = _auto_buckets(rows)
            elif sigs.storageLevel.useMemory or sigs.storageLevel.useDisk:
                buckets = _auto_buckets(sigs.count())
            else:
                persisted = sigs.persist()
                buckets = _auto_buckets(persisted.count())
    banded_rows_frame(sigs, buckets, key_cols).repartition(
        "band", "kb"
    ).write.partitionBy("band", "kb").mode(mode).parquet(path)
    if persisted is not None:
        persisted.unpersist()
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _BANDED_META), "w") as f:
        json.dump({"buckets": buckets, "key_cols": key_cols}, f)


def pruned_store_rows(
    spark: SparkSession, path: str, batch_sigs: DataFrame
) -> DataFrame:
    """Read ONLY the index partitions the batch's band keys can
    match: collect the batch's distinct (band, kb) pairs (≤ n_bands ×
    buckets literals by construction) and push them down as ONE
    partition filter — a single isin over the synthesized
    band*buckets+kb partition key, so the expression stays O(1) tree
    depth at any bucket count (the OR-chain spelling it replaced
    would build a ~16k-term boolean tree at 4096 buckets, VERDICT
    r11). dropDuplicates makes a crash-retried banded append harmless
    (duplicate index rows would duplicate candidate pairs; full-row
    dedup over the PRUNED subset is bounded by the batch's bucket
    footprint, never the store)."""
    import os

    from pyspark.errors import AnalysisException

    # complete a crashed compaction swap first (same recovery rule as
    # the flat-store compactor: the .old dir is the complete index),
    # then a crashed granular fold's per-partition swaps
    old = path + ".old"
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)
    heal_table_fold(path)
    if not os.path.exists(path):
        # a write_banded_index'd index dir ALWAYS exists, even empty
        # (marker file). Missing dir = the index was lost — scoring
        # against an implicitly-empty store side would silently drop
        # every store×batch pair (review finding, round 11).
        raise FileNotFoundError(
            f"banded index missing at {path}: rebuild it from the flat "
            f"store with write_banded_index (or restore {old}) before "
            "admitting"
        )

    # bucket batch keys with the INDEX's persisted layout, never the
    # in-process defaults (see banded_layout). A present dir with
    # no marker is a crashed build — defaulting would silently prune
    # with the wrong layout, so fail loudly like the missing-dir
    # case (review finding, round 11).
    lay = banded_layout(path)
    if lay is None:
        raise RuntimeError(
            f"banded index at {path} has no layout marker (interrupted "
            "build?): rebuild it from the flat store with "
            "write_banded_index(mode='overwrite') before admitting"
        )
    buckets = lay["buckets"]
    batch_rows = banded_rows_frame(batch_sigs, buckets, lay["key_cols"])

    def _empty() -> DataFrame:
        return batch_rows.select(
            F.col("group_id").alias("id"), "ks", "band", "band_key"
        ).limit(0)

    # bounded by the LAYOUT (≤ n_bands × buckets rows), never by the
    # data — the one collect this path needs
    pairs = [
        (r["band"], r["kb"])
        for r in batch_rows.select("band", "kb").distinct().collect()
    ]
    if not pairs:
        return _empty()
    # List ONLY the selected partition dirs, never the whole table:
    # full-table partition discovery is O(n_bands × buckets) listing
    # calls even when the filter then prunes to a handful — measured
    # as the dominant cost at high bucket counts (the r12 sweep's
    # 8.8 s at 1024 buckets was discovery, not data). The explicit
    # dir list is O(batch footprint); basePath recovers the partition
    # columns; dirs the batch names but the store never wrote are
    # skipped by the same existence check that builds the list.
    dirs = [
        d
        for b, k in pairs
        if os.path.isdir(d := os.path.join(path, f"band={b}", f"kb={k}"))
    ]
    if not dirs:
        return _empty()
    try:
        src = spark.read.option("basePath", path).parquet(*dirs)
    except AnalysisException:
        # dirs exist but hold no parquet (hive write of an EMPTY
        # frame leaves only the marker) — a legitimately empty store
        return _empty()
    # belt over suspenders: the isin partition filter is a no-op on
    # the explicit dir list but keeps the plan self-describing (and
    # plan-asserted) about WHICH partitions this read may touch
    filt = (
        F.col("band").cast("long") * F.lit(buckets) + F.col("kb")
    ).isin([b * buckets + k for b, k in pairs])
    return (
        src.where(filt)
        .select(F.col("group_id").alias("id"), "ks", "band", "band_key")
        .dropDuplicates()
    )


def compact_banded_index(
    spark: SparkSession, path: str, *, n_files: int = 1
) -> int:
    """OPTIMIZE FINAL for the banded index: every admit appends up to
    one file per touched (band, kb) partition, so a long admission
    loop accumulates files inside each partition dir — the same
    unmerged-parts failure mode the flat store and the IVF lists
    have, at partition granularity. Rewrites each partition to ONE
    file (`n_files` is the trigger threshold: compact only when
    some partition exceeds it), DEDUPLICATING rows while at it
    (crash-leaked duplicate index rows are tolerated by the
    reader's dropDuplicates; compaction retires them permanently).
    Same
    crash-safe rename-aside swap as `compact_signature_store`:
    at every instant either `path` or `path + '.old'` holds a
    complete index. Returns the file count before compaction;
    no-ops (and returns it) when every partition is already within
    budget. Search invariance (pruned reads identical before/after)
    is CI-pinned."""
    import glob
    import os
    import shutil

    old = path + ".old"
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)
    _claim_rmtree(old)
    heal_table_fold(path)

    part_dirs = glob.glob(os.path.join(path, "band=*", "kb=*"))
    counts = [
        len(glob.glob(os.path.join(d, "*.parquet"))) for d in part_dirs
    ]
    n_before = sum(counts)
    if not counts or max(counts) <= n_files:
        return n_before
    # the layout marker rides inside the dir — readers refuse to run
    # without it, so a marker-less index here means a crashed build:
    # surface it rather than launder it through a compaction. Checked
    # BEFORE the staging write so the failure costs a stat call, not
    # a full Spark rewrite job that leaves a .compact dir behind
    # (ADVICE r11).
    meta = os.path.join(path, _BANDED_META)
    if not os.path.exists(meta):
        raise RuntimeError(
            f"banded index at {path} has no layout marker (interrupted "
            "build?): rebuild it before compacting"
        )
    staging = path + ".compact"
    (
        spark.read.parquet(path)
        .dropDuplicates()
        .repartition("band", "kb")
        .write.partitionBy("band", "kb")
        .mode("overwrite")
        .parquet(staging)
    )
    shutil.copy2(meta, os.path.join(staging, _BANDED_META))
    _swap_aside(path, staging)
    return n_before


def rebucket_banded_index(
    spark: SparkSession, store_path: str, path: str, buckets: int
) -> dict:
    """Migrate a banded index to a NEW bucket count (VERDICT r11 #3:
    the kb partition layout is persisted at build time and honored by
    every append forever, so a store built small — 16 buckets — could
    never gain pruning granularity; once a batch's footprint covers
    all n_bands × buckets partitions, the pruned read degenerates to
    a full scan). Rebuilds `<store>_bands` FROM THE FLAT STORE (the
    source of truth — crash-leaked duplicate index rows are retired
    for free) at the new count, carrying the persisted key_cols
    through, and swaps it in with the same rename-aside discipline as
    the compactors: at every instant either `path` or `path + '.old'`
    holds a complete, marker-consistent index — the marker is written
    into the STAGING dir by write_banded_index before the swap, so no
    observable state ever pairs old-layout data with the new-layout
    marker (the atomicity VERDICT r11 asked for). Admission evidence
    is invariant across a re-bucket (CI-pinned at 16 → 256): kb is a
    pure pruning key — candidate generation matches on (band,
    band_key), which any bucketing preserves. Returns
    {buckets_before, buckets_after}."""
    import os
    import shutil

    old = path + ".old"
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)
    _claim_rmtree(old)
    heal_table_fold(path)
    lay = banded_layout(path)
    if lay is None:
        raise RuntimeError(
            f"banded index at {path} has no layout marker (interrupted "
            "build?): rebuild it from the flat store with "
            "write_banded_index(mode='overwrite') instead of re-bucketing"
        )
    if lay["buckets"] == buckets:
        return {"buckets_before": lay["buckets"], "buckets_after": buckets}
    staging = path + ".rebucket"
    shutil.rmtree(staging, ignore_errors=True)
    write_banded_index(
        read_table(spark, store_path),
        staging,
        "overwrite",
        key_cols=lay["key_cols"],
        buckets=buckets,
    )
    _swap_aside(path, staging)
    return {"buckets_before": lay["buckets"], "buckets_after": buckets}


# --------------- key-bucketed table layout (flat store + members)
#
# VERDICT r14 "What's wrong" #1: after the banded index bounded the
# band join's store side, the admission step's LAST O(store) terms
# were the flat-store scan (gh classification + touched-group row
# retrieval) and the members doc_id projection — both full columnar
# reads per step, linear in store size inside a loop that is
# otherwise bounded by batch footprint (measured 3.1× over a 256×
# store in the r14 soak). Same cure as the banded index: both tables
# are hive-partitioned on a bucket of their JOIN KEY (gh for the
# signature store, doc_id for members), and every per-batch read
# prunes to the partitions the batch's own keys hash into — a batch
# key can only match a store row inside its own bucket, so the
# pruned read is a provable superset of every possible semi-/anti-
# join match. The layout (bucket count + key column) is persisted in
# a marker at build time; appends, compaction, and retraction folds
# honor it forever (the banded index's own discipline,
# `banded_layout`). A dir WITHOUT a marker is the legacy flat
# layout: every reader falls back to the full scan and every append
# stays flat, so pre-existing stores work unchanged until
# `bucket_table` migrates them. Bucket count sizing is the
# rebucket_banded_index story again: the prune reads
# ≤ min(batch_keys, buckets) of `buckets` partitions, so production
# stores (small streaming batches against a huge store) raise
# buckets — 256+ — while the sf-test default stays listing-cheap.

_TBL_META = "_table_meta.json"  # leading '_': parquet listing skips it
_TBL_PB = "pb"
_STORE_BUCKETS = 16  # fallback when the build's row count is unknown

# Build-time bucket sizing (r18 optimization): a fresh build knows its
# own row count, so the initial bucket count is derived from it instead
# of a constant — the same rows/bucket arithmetic `maybe_rebucket_table`
# maintains as the store grows (target 1024 / trigger 4096; builds aim
# at the midpoint so a store neither rebuckets on its first maintenance
# pass nor starts at the knee). The r18 profile measured the constant-16
# default as the dominant lifecycle cost at small stores: every
# partitioned write pays per-file open/commit overhead per touched dir
# (the banded index's 4×16 = 64 dirs made one tiny append a 3.2 s
# write), while the prune bound only needs rows/bucket, not dir count.
# Production story unchanged: growth re-buckets UP automatically
# (compact-store), and a huge bootstrap sizes itself up to the same
# _REBUCKET_MAX listing ceiling.
_BUILD_ROWS_PER_BUCKET = 2048


def _auto_buckets(rows: int) -> int:
    """Smallest power-of-two bucket count keeping rows/bucket at or
    under _BUILD_ROWS_PER_BUCKET, floored at 2 (so kb stays a real
    pruning key) and capped at _REBUCKET_MAX (one listing dir per
    bucket)."""
    b = 2
    while rows > b * _BUILD_ROWS_PER_BUCKET and b < _REBUCKET_MAX:
        b *= 2
    return b

# Partition-granular fold (VERDICT r15 #2): the retraction fold used
# to rewrite the bucketed tables whole (`_swap_write_table`), paying
# per-partition write overhead exactly when the production recipe
# says to RAISE the bucket count (the r15 soak: fold 7.6 s at 256
# buckets vs 18.0 s at 1024 on the same store). The granular path
# rewrites ONLY the partitions that hold tombstoned/relabeled rows
# and leaves every other partition dir byte-invariant. Crash story:
# a journal marker (leading '_' — parquet listing skips it) lists
# the partition dirs mid-swap; each dir is renamed aside to a
# '.bfold-'-prefixed sibling (leading '.' — likewise invisible)
# before its staged replacement renames in, so `heal_table_fold`
# can always roll a bucket back (safe at ANY point: the sidecars
# are retired only after the whole fold succeeds, so pre-fold
# bucket + sidecars is exactly the live view) or drop a completed
# swap's remnant. Hot read paths pay one stat() on the journal.
_FOLD_JOURNAL = "_fold_inflight.json"
_BFOLD_PREFIX = ".bfold-"


def table_layout(path: str) -> dict | None:
    """The bucketed layout a store/members table was BUILT with:
    {"buckets": int, "key": str}, or None for a legacy flat dir (no
    marker). Appends and pruned reads must use the persisted layout,
    never in-process defaults — the banded index rule
    (`banded_layout`), for the same reason: a different bucket count
    selects partitions where the matching rows don't live."""
    import json
    import os

    meta = os.path.join(path, _TBL_META)
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        lay = json.load(f)
    return {
        "buckets": int(lay["buckets"]),
        "key": str(lay["key"]),
        # bucket-expression version: markers written before round
        # 15's skew fix carry no field and mean the raw-pmod
        # spelling; every reader/appender must reproduce the exact
        # expression the data was WRITTEN with or the prune selects
        # partitions where the matching rows don't live.
        "pb": str(lay.get("pb", "mod")),
    }


def _tbl_pb_expr(dtype, col: str, buckets: int, variant: str = "xxh64"):
    """Deterministic bucket of a join key. String keys (gh is an md5
    hex, but any string works) hash through md5 so the bucketing
    never assumes hex. Integral keys HASH through xxhash64 before
    the pmod (variant 'xxh64', the default for new layouts): raw
    `pmod(id, buckets)` degenerates on arithmetic-progression id
    spaces — snowflake-style ids with low bits zero land every row
    in a handful of buckets (all in ONE when the stride shares the
    bucket count's factors), silently turning the pruned read back
    into a near-full scan. xxhash64 is seed-stable inside Spark, so
    the same expression buckets the store at write time and the
    batch at read time; variant 'mod' reproduces pre-r15 markers.
    Both spellings are pure Spark SQL."""
    from pyspark.sql.types import StringType

    if isinstance(dtype, StringType):
        return F.expr(
            f"CAST(pmod(CAST(conv(substring(md5({col}), 1, 8), 16, 10) "
            f"AS BIGINT), {buckets}) AS INT)"
        )
    if variant == "mod":
        return F.expr(f"CAST(pmod(CAST({col} AS BIGINT), {buckets}) AS INT)")
    return F.expr(
        f"CAST(pmod(xxhash64(CAST({col} AS BIGINT)), {buckets}) AS INT)"
    )


def _write_tbl_marker(
    path: str, key: str, buckets: int, schema_json: str,
    rows: int | None = None,
) -> None:
    """The marker also persists the TABLE SCHEMA: a hive write of an
    EMPTY frame creates no data files at all (unlike the legacy flat
    write, which leaves a schema-carrying empty part file), so an
    empty bucketed table would otherwise be unreadable
    (UNABLE_TO_INFER_SCHEMA) — the empty-base-store bootstrap is a
    real CLI path (tests/test_cli.py::test_admit_cli_empty_base_store).
    `rows` (VERDICT r17 #5) caches the EXACT row count where the
    writer knows it — full rewrites footer-count what they just
    wrote — so `maybe_rebucket_table` reads a number instead of
    scanning; appends invalidate it (`_set_marker_rows(path, None)`)
    and the gate's count() fallback re-derives + re-persists.
    Written atomically (tmp + rename): readers stat it on every
    pruned read."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    meta = {
        "buckets": buckets,
        "key": key,
        "schema": schema_json,
        "pb": "xxh64",
    }
    if rows is not None:
        meta["rows"] = rows
    p = os.path.join(path, _TBL_META)
    with open(p + ".tmp", "w") as f:
        json.dump(meta, f)
    os.rename(p + ".tmp", p)


def _footer_rows(path: str) -> int | None:
    """Driver-side EXACT row count of a parquet dir from file footers
    (no Spark job, no data read): O(files) metadata reads, bounded by
    the just-written/compacted file count at every call site. None
    when pyarrow is unavailable or any footer is unreadable — callers
    fall back to a Spark count()."""
    import glob
    import os

    try:
        import pyarrow.parquet as pq
    except ImportError:
        return None
    if not os.path.isdir(path):
        return 0
    try:
        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(
                os.path.join(path, "**", "*.parquet"), recursive=True
            )
        )
    except Exception:
        return None


def _marker_rows(path: str) -> int | None:
    """The marker-cached exact row count, or None (no marker, a
    pre-r18 marker, or a count invalidated by an append)."""
    import json
    import os

    meta = os.path.join(path, _TBL_META)
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        rows = json.load(f).get("rows")
    return int(rows) if rows is not None else None


def _set_marker_rows(path: str, rows: int | None) -> None:
    """Update (rows=int) or invalidate (rows=None) the marker's
    cached row count, preserving every other field; no-op on tables
    without a `_TBL_META` marker (legacy flat dirs, banded indexes).
    Atomic (tmp + rename) — readers stat the marker on every pruned
    read."""
    import json
    import os

    meta = os.path.join(path, _TBL_META)
    if not os.path.exists(meta):
        return
    with open(meta) as f:
        lay = json.load(f)
    if rows is None:
        if "rows" not in lay:
            return
        lay.pop("rows")
    else:
        lay["rows"] = int(rows)
    with open(meta + ".tmp", "w") as f:
        json.dump(lay, f)
    os.rename(meta + ".tmp", meta)


def _table_schema(spark: SparkSession, path: str):
    """The marker-persisted schema (StructType) or None."""
    import json
    import os

    from pyspark.sql.types import StructType

    meta = os.path.join(path, _TBL_META)
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        raw = json.load(f).get("schema")
    return StructType.fromJson(json.loads(raw)) if raw else None


def write_table(
    df: DataFrame,
    path: str,
    mode: str,
    *,
    key: str | None = None,
    buckets: int | None = None,
) -> None:
    """Layout-honoring write of a flat-store/members table. Appends
    read the persisted marker: bucketed tables get a bucketed append
    (repartition(pb) first — one file per touched partition per
    append, `write_banded_index`'s clustering rationale), legacy
    dirs a plain flat append. Builds (overwrite / first write) with
    `key` set create the bucketed layout and persist the marker;
    without `key` they stay legacy-flat."""
    import os

    variant = "xxh64"  # new layouts; appends reproduce the persisted one
    write_marker = True
    if mode == "append" and os.path.exists(path):
        lay = table_layout(path)
        if lay is None:
            df.write.mode("append").parquet(path)
            return
        key, buckets, variant = lay["key"], lay["buckets"], lay["pb"]
        write_marker = False  # the marker IS the layout — never drift it
    if key is None:
        df.write.mode(mode).parquet(path)
        return
    persisted = None
    sized_rows = None
    if buckets is None:
        # data-derived initial bucket count (see _auto_buckets): one
        # persist + count materializes the build frame exactly once —
        # in the CLI shape its lineage is a corpus JSON scan, so the
        # cache also keeps the sizing pass from re-reading the corpus.
        # Callers that already know the layout (rebuilds, migrations)
        # pass `buckets` and skip this entirely. A frame the caller
        # already persisted is counted in place, never re-persisted
        # (so the unpersist below can't drop the caller's cache).
        if df.storageLevel.useMemory or df.storageLevel.useDisk:
            sized_rows = df.count()
        else:
            persisted = df.persist()
            sized_rows = persisted.count()
        buckets = _auto_buckets(sized_rows)
    pb = _tbl_pb_expr(df.schema[key].dataType, key, buckets, variant)
    (
        df.withColumn(_TBL_PB, pb)
        .repartition(_TBL_PB)
        .write.partitionBy(_TBL_PB)
        .mode(mode)
        .parquet(path)
    )
    if persisted is not None:
        persisted.unpersist()
    if write_marker:
        # a build/rewrite knows its exact row count for free — the
        # sizing count above when it ran, else footer metadata of the
        # files just written, no Spark job (VERDICT r17 #5: the
        # rebucket gate reads this instead of scanning)
        _write_tbl_marker(
            path,
            key,
            buckets,
            df.schema.json(),
            rows=sized_rows if sized_rows is not None else _footer_rows(path),
        )
    else:
        # append: the cached count is stale now — invalidate; the
        # next maintenance gate re-derives and re-persists it
        _set_marker_rows(path, None)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Full read of a store/members table, layout-agnostic: the
    hive partition column never escapes into consumer schemas. An
    EMPTY bucketed table (marker, no data files — a hive write of
    an empty frame creates none) reads as an empty frame with the
    marker-persisted schema."""
    from pyspark.errors import AnalysisException

    # one stat call unless a granular fold crashed mid-swap, in which
    # case a missing bucket dir would silently drop its rows from
    # this read (the _read_sidecar heal-first lesson, per-partition)
    heal_table_fold(path)
    try:
        return spark.read.parquet(path).drop(_TBL_PB)
    except AnalysisException:
        schema = _table_schema(spark, path)
        if schema is None:
            raise
        return spark.createDataFrame([], schema)


def pruned_table(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_col: str | None = None,
    *,
    vals: list[int] | None = None,
) -> DataFrame:
    """Read ONLY the partitions the batch's keys can match: bucket
    the batch's key column with the table's PERSISTED layout,
    collect the distinct bucket ids (≤ buckets literals — bounded by
    the layout, not the data), list exactly those partition dirs
    (full-table partition discovery is O(buckets) listing calls even
    when the filter prunes to a handful — the banded index's r12
    sweep measurement), and push the isin down as a partition
    filter. Legacy tables (no marker) fall back to the full scan —
    correctness never depends on the layout, only the read bound
    does. `vals` (r18): a caller that already collected the batch's
    bucket ids with THIS table's layout (`batch_bucket_vals` — one
    combined job instead of one collect per table) passes them in and
    the collect here is skipped; correctness is the caller's layout
    match, which `batch_bucket_vals` guarantees by deriving the
    expression from the same persisted marker."""
    import os

    from pyspark.errors import AnalysisException

    heal_table_fold(path)  # same per-partition heal as read_table
    lay = table_layout(path)
    if lay is None:
        return read_table(spark, path)
    buckets = lay["buckets"]
    if vals is None:
        kc = key_col or lay["key"]
        pb = _tbl_pb_expr(keys.schema[kc].dataType, kc, buckets, lay["pb"])
        vals = sorted(
            r[0]
            for r in keys.select(pb.alias(_TBL_PB)).distinct().collect()
            if r[0] is not None
        )
    dirs = [
        d
        for v in vals
        if os.path.isdir(d := os.path.join(path, f"{_TBL_PB}={v}"))
    ]
    if not dirs:
        return read_table(spark, path).limit(0)
    try:
        src = spark.read.option("basePath", path).parquet(*dirs)
    except AnalysisException:
        # dirs exist but hold no parquet (crash remnants) — empty
        return read_table(spark, path).limit(0)
    # belt over suspenders, same as pruned_store_rows: the isin is a
    # no-op on the explicit dir list but keeps the plan
    # self-describing (and plan-assertable) about WHICH partitions
    # this read may touch
    return src.where(F.col(_TBL_PB).isin(vals)).drop(_TBL_PB)


def batch_bucket_vals(
    batch: DataFrame, tables: list[tuple[str, str]]
) -> list[list[int] | None]:
    """Collect the batch's distinct bucket ids for SEVERAL bucketed
    tables in ONE Spark job (r18: the admission step paid one
    driver collect per pruned table — members by doc_id, flat store
    by gh — each a full pass over the batch frame for one tiny value
    set). `tables` is [(path, key_col)]; the bucket expression for
    each comes from that table's own persisted marker (the layout-
    honoring rule), so the returned ids are exactly what
    `pruned_table`'s internal collect would produce. A legacy table
    (no marker) yields None at its position — the caller passes
    keys instead and `pruned_table` falls back to the full scan."""
    exprs = []
    slots: list[int | None] = []
    for path, kc in tables:
        heal_table_fold(path)  # marker read below must see live state
        lay = table_layout(path)
        if lay is None:
            slots.append(None)
            continue
        pb = _tbl_pb_expr(
            batch.schema[kc].dataType, kc, lay["buckets"], lay["pb"]
        )
        slots.append(len(exprs))
        exprs.append(F.collect_set(pb).alias(f"v{len(exprs)}"))
    if not exprs:
        return [None] * len(tables)
    row = batch.agg(*exprs).collect()[0]
    return [
        None if s is None else sorted(v for v in row[s] if v is not None)
        for s in slots
    ]


def bucket_table(
    spark: SparkSession, path: str, key: str, buckets: int
) -> dict:
    """Migrate a table to the bucketed layout (or to a NEW bucket
    count) — the flat-store/members sibling of
    `rebucket_banded_index`, with the same rename-aside swap: at
    every instant `path` or `path + '.old'` holds a complete table.
    Pruned-read results are invariant across a re-bucket (the bucket
    is a pure pruning key; every join still matches on the key value
    itself). Also migrates a pre-r15 raw-pmod layout to the
    skew-robust xxh64 bucket expression (data and marker rewritten
    together — the no-op early return requires the CURRENT
    expression version). Returns {buckets_before, buckets_after}."""
    import shutil

    heal_swap(path)
    heal_table_fold(path)
    _claim_rmtree(path + ".old")
    lay = table_layout(path)
    before = lay["buckets"] if lay else None
    if (
        lay
        and lay["buckets"] == buckets
        and lay["key"] == key
        and lay["pb"] == "xxh64"
    ):
        return {"buckets_before": before, "buckets_after": buckets}
    staging = path + ".rebucket"
    shutil.rmtree(staging, ignore_errors=True)
    write_table(
        read_table(spark, path), staging, "overwrite", key=key, buckets=buckets
    )
    _swap_aside(path, staging)
    return {"buckets_before": before, "buckets_after": buckets}


# Auto-rebucket thresholds (VERDICT r15 #3), derived from the r15
# soak's measured knee: at 256 buckets the ×256 store (1.02 M
# groups ≈ 4 k rows/bucket) bent the admit curve (6.52 → 9.43 s
# from ×64), while 1024 buckets (≈ 1 k rows/bucket) sat BELOW the
# ×1 time — so the maintenance pass re-buckets UP when a table
# crosses ~4 k rows/bucket, jumping straight to the ~1 k-rows/bucket
# good point (the gap between trigger and target is what prevents a
# growing store from re-bucketing on every pass).
_REBUCKET_TRIGGER_ROWS = 4096  # rows/bucket at the measured knee
_REBUCKET_TARGET_ROWS = 1024  # rows/bucket at the measured good point
_REBUCKET_MAX = 65536  # ceiling: one listing dir per bucket


def maybe_rebucket_table(
    spark: SparkSession,
    path: str,
    *,
    trigger_rows: int = _REBUCKET_TRIGGER_ROWS,
    target_rows: int = _REBUCKET_TARGET_ROWS,
    max_buckets: int = _REBUCKET_MAX,
) -> dict:
    """The automated re-bucket decision (VERDICT r15 #3: the soak's
    1024-bucket row proved 're-bucket up as the store grows' is the
    production recipe, but only the manual `bucket-store` CLI did it
    — at 100 TB someone had to notice the admit curve bending).
    Called from the compact-store maintenance pass: when a bucketed
    table's rows/bucket crosses `trigger_rows`, re-bucket UP (never
    down — shrinking buys nothing and pays a rewrite) to the next
    power of two that brings it under `target_rows`. Legacy-flat
    tables are left alone — `bucket_table` is the deliberate
    migration step. Returns {"rebucketed": bool, "rows": n,
    "buckets_before": b, "buckets_after": b'} (rows/buckets None for
    legacy).

    The row count comes from the layout marker when a full rewrite
    cached it there (VERDICT r17 #5 — exact at write/compact/fold
    time, invalidated by appends), so a maintenance pass whose fold
    already rewrote the table pays NO table scan here; the count()
    fallback re-derives it once and re-persists."""
    lay = table_layout(path)
    if lay is None:
        return {
            "rebucketed": False,
            "rows": None,
            "buckets_before": None,
            "buckets_after": None,
        }
    n = _marker_rows(path)
    if n is None:
        n = read_table(spark, path).count()
        _set_marker_rows(path, n)
    before = lay["buckets"]
    out = {
        "rebucketed": False,
        "rows": n,
        "buckets_before": before,
        "buckets_after": before,
    }
    if n <= before * trigger_rows:
        return out
    need = before
    while need * target_rows < n and need < max_buckets:
        need *= 2
    if need <= before:
        return out
    bucket_table(spark, path, lay["key"], need)
    out["rebucketed"] = True
    out["buckets_after"] = need
    return out


def _swap_write_table(df: DataFrame, path: str) -> None:
    """`_swap_write` for the big tables: a full rewrite (retraction
    fold) that PRESERVES the persisted bucketed layout — the marker
    is written into the staging dir before the swap, so no
    observable state pairs bucketed data with a missing marker.
    Legacy tables stay legacy."""
    import shutil

    heal_swap(path)
    lay = table_layout(path)
    if lay is None:
        _swap_write(df, path)
        return
    old, staging = path + ".old", path + ".staging"
    _claim_rmtree(old)
    shutil.rmtree(staging, ignore_errors=True)
    write_table(df, staging, "overwrite", key=lay["key"], buckets=lay["buckets"])
    _swap_aside(path, staging)


def bootstrap_rep_store(
    spark: SparkSession,
    sig_frame: DataFrame,
    members_frame: DataFrame,
    sig_path: str,
    band_path: str,
    mem_path: str,
    *,
    key_cols: list[str] | None = None,
) -> None:
    """Fresh three-table rep-store bootstrap (flat signatures, banded
    index, members), shared by the proof ops and the streaming
    lifecycles: the flat store is written first (the banded index
    auto-sizes from its just-written marker via `sized_from`), then
    the banded index and the members table build CONCURRENTLY (r19,
    guide §2.6 — they write to different dirs and neither reads the
    other's output, so a bootstrap pays max(banded, members) instead
    of their sum). Appends never come through here; the
    crash-ordering contract belongs to `rep_admission_step`, and a
    crashed BOOTSTRAP is re-run from scratch wholesale (every caller
    builds into a fresh root), so the banded/members completion order
    is not load-bearing."""
    from concurrent.futures import ThreadPoolExecutor

    write_table(sig_frame, sig_path, "overwrite", key="gh")
    with ThreadPoolExecutor(max_workers=1) as pool:
        mem_f = pool.submit(
            write_table, members_frame, mem_path, "overwrite", key="doc_id"
        )
        try:
            write_banded_index(
                read_table(spark, sig_path),
                band_path,
                "overwrite",
                sized_from=sig_path,
                **({"key_cols": key_cols} if key_cols else {}),
            )
        finally:
            mem_f.result()


def rep_admission_frames(
    store_sigs: DataFrame, g_batch: DataFrame, rep_builder=None
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Classify one batch's content groups against the persisted rep
    store and build the band join's batch side. Returns
    (group_map, new_sigs, batch_side, touched_sigs):
      group_map  — (gh, group_id, is_new) for EVERY batch gh
                   (existing id for known content, min batch doc_id
                   for new content; is_new distinguishes the two so
                   one aggregation yields both step stats);
      new_sigs   — signature rows for the new groups only (the only
                   rows an append adds — known content never grows
                   the store);
      batch_side — new groups ∪ TOUCHED store groups (groups that
                   gained a member this batch are rescored so
                   late-joining exact dups inherit complete
                   neighbor evidence — see the block comment above);
      touched_sigs — the CACHED store rows backing all of the above;
                   the caller unpersists it after the appends.
    The store side is the banded index's pruned read MINUS every
    batch-side group id (`pruned_store_rows` + anti-join): touched
    groups move wholly to the batch side, and a crash-leaked banded
    row for a group being re-admitted as new can never double-join.

    ONE flat-store scan per step: everything the step needs from the
    store reduces to the touched groups' full rows (a gh semi-join
    against the batch, batch-bounded by definition), so that frame is
    computed once and cached — classification (`touched` is its
    2-column projection; a batch gh is in the store iff it is in
    touched), the batch side, the pruned read's footprint collect,
    and the band rows all read the cache. The r14 phase profile at a
    256×/1M-group store caught the uncached spelling re-scanning the
    flat store ~5× per step (classification 12 s + 28 s hiding in the
    'pruned' phase, both dominated by repeated store scans).

    `rep_builder` maps the new-group subset of the batch group frame
    to its signature rows (group_id, gh, *key_cols) — the MinHash
    rep build by default; the vector store passes its hyperplane
    sibling (the frames logic is family-agnostic)."""
    rep_builder = rep_builder or (lambda g: rep_signature_frame(rep_reps(g)))
    bg = g_batch.select("gh").distinct()
    touched_sigs = store_sigs.join(bg, "gh", "left_semi").cache()
    touched = touched_sigs.select("gh", "group_id")
    g_new = g_batch.join(touched.select("gh"), "gh", "left_anti")
    new_sigs = rep_builder(g_new)
    batch_side = new_sigs.unionByName(touched_sigs)
    # is_new tags the union so the step reads BOTH stats (total
    # groups, new groups) off one aggregation job instead of two
    # counts (r18); consumers project it away.
    return (
        touched.withColumn("is_new", F.lit(False)).unionByName(
            new_sigs.select("gh", "group_id").withColumn(
                "is_new", F.lit(True)
            )
        ),
        new_sigs,
        batch_side,
        touched_sigs,
    )


def rep_admission_step(
    spark: SparkSession,
    g_batch: DataFrame,
    sig_path: str,
    band_path: str,
    mem_path: str,
    feats_for,
    write_evidence,
    *,
    threshold: float = _JACCARD_THRESHOLD,
    skip_when_no_new_docs: bool = False,
    apply_appends: bool = True,
    key_cols: list[str] | None = None,
    rep_builder=None,
    verify=None,
) -> dict:
    """ONE admission step against a persisted rep store — the single
    source of truth for the ordering-critical sequence the CLI
    (`admit`), the batch proof op, and the streaming sibling all
    run (review finding, round 11: three hand-maintained copies had
    already drifted — the streaming copy lost the members
    anti-join):

    1. docs already in members are identified (exactly-once under
       redelivery; `skip_when_no_new_docs` makes a fully-delivered
       batch a no-op);
    2. batch groups classify against the flat store (new vs
       touched), the banded index serves the PRUNED store side,
       and everything reading the store is cache-materialized
       BEFORE any append mutates it;
    3. verified group evidence goes to `write_evidence` FIRST, then
       banded → flat → members appends (each idempotent: the banded
       read dropDuplicates, the gh classification, the doc_id
       anti-join).

    `feats_for(cand_ids)` supplies verify-side features for candidate
    group reps (corpus JSON in the CLI, a cached group frame in the
    operators): (doc_id, fs) shingle sets for the MinHash store, the
    quantized-vector frame for the hyperplane store. `key_cols` /
    `rep_builder` / `verify` generalize the step over the two store
    families — defaults are the MinHash spelling (bk0..bk3, the rep
    MinHash signature build, exact-Jaccard verification at
    `threshold`); the vector store passes bv0..bv5, the hyperplane
    signature build, and exact-cosine verification. Returns the
    step's counts."""
    key_cols = key_cols or [f"bk{b}" for b in range(_N_BANDS)]
    if verify is None:
        verify = lambda cand, feats: jaccard_on_candidates(  # noqa: E731
            cand, feats, threshold
        )
    # Heal crashed maintenance swaps BEFORE any read: a fold/rebucket
    # interrupted between its two renames leaves the table only at
    # path+'.old', and the next caller is far more likely to be an
    # admission step than a maintenance re-run — without this the
    # step dies on PATH_NOT_FOUND until an operator runs
    # compact-store (the _read_sidecar lesson, r14 self-review #1,
    # applied to the main tables).
    heal_swap(sig_path)
    heal_swap(mem_path)
    # Tombstoned doc_ids are invisible to the WHOLE step, not just the
    # members append (ADVICE r13 high): a redelivered retracted doc
    # whose group was dropped would otherwise classify as NEW content
    # and can become the new group's id (min batch doc_id) — either
    # resurrecting takedown content as a live memberless group (its id
    # never got a gdelta key) or, when the id IS a retired gdelta key,
    # silently routing a genuinely new same-content doc's member row
    # to a dead id (_apply_gdelta filters it forever: data loss). The
    # sidecar is O(retracted) → broadcast, same as _apply_gdelta's.
    tomb = _read_sidecar(spark, tombstones_path(mem_path))
    if tomb is not None:
        g_batch = g_batch.join(
            F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
        )
    # Cache the batch frame: the two bucket-footprint collects below
    # (members by doc_id, flat store by gh) plus mem_new and
    # classification all re-read it, and in the CLI shape its lineage
    # is a JSON corpus scan per re-read. Batch-bounded by definition.
    g_batch = g_batch.cache()
    # ONE footprint job for both pruned reads (r18): the members
    # (doc_id) and flat-store (gh) bucket sets are collected from the
    # cached batch in a single aggregation — this is also the action
    # that fills the g_batch cache — instead of one collect per table.
    mem_vals, sig_vals = batch_bucket_vals(
        g_batch, [(mem_path, "doc_id"), (sig_path, "gh")]
    )
    # RAW members on purpose: a tombstoned (retracted) doc_id still
    # anti-joins here, so a redelivered batch can never resurrect a
    # takedown — the id stays out until fold_retractions retires the
    # tombstone and the physical row together (retraction contract).
    # PRUNED to the batch's doc_id buckets: an anti-join match can
    # only live in a bucket some batch doc_id hashes into, so the
    # pruned read is a provable superset of every match — the last
    # O(store) members term, now bounded by batch footprint.
    members = pruned_table(
        spark, mem_path, g_batch.select("doc_id"), vals=mem_vals
    )
    mem_new = (
        g_batch.select("doc_id", "gh")
        .join(members.select("doc_id"), "doc_id", "left_anti")
        .cache()
    )
    # Redelivery fast path keeps its own cheap count: a
    # fully-delivered batch must skip BEFORE any classification /
    # candidate work runs — folding this count into the combined
    # step-stats job below (r19) would make every replayed no-op
    # batch pay the full scoring plan just to learn it can skip.
    # Batch ops (skip_when_no_new_docs=False) read new_docs off the
    # combined job instead — one driver action fewer per step.
    n_mem_new = None
    if skip_when_no_new_docs:
        n_mem_new = mem_new.count()
        if n_mem_new == 0:
            mem_new.unpersist()
            g_batch.unpersist()
            return {"new_docs": 0, "groups": 0, "new_groups": 0, "scored": False}

    # LIVE store views: classification must not recognize a dropped
    # group's gh (its content re-admits fresh), and both the flat and
    # pruned-index sides must carry post-re-election group ids so
    # evidence expansion and verify features resolve to live docs.
    # PRUNED to the batch's gh buckets: the frames logic only ever
    # consumes store rows that share a gh with the batch (touched
    # groups + classification), so the gh-bucket prune is exact —
    # the last O(store) flat-scan term, now bounded by batch
    # footprint (gdelta composes AFTER the prune; it relabels and
    # drops rows row-locally, never moves a row across gh).
    store_sigs = live_store_sigs(
        spark, sig_path, g_batch.select("gh"), vals=sig_vals
    )
    group_map, new_sigs, batch_side, touched_sigs = rep_admission_frames(
        store_sigs, g_batch, rep_builder
    )
    group_map, new_sigs = group_map.cache(), new_sigs.cache()
    store_rows = _apply_gdelta(
        spark, pruned_store_rows(spark, band_path, batch_side), sig_path, "id"
    ).join(
        batch_side.select(F.col("group_id").alias("id")), "id", "left_anti"
    )
    cand = candidates_from_rows(
        store_rows,
        store_band_rows(batch_side, key_cols, id_col="group_id"),
        len(key_cols),
    ).cache()
    cand_ids = (
        cand.select(F.col("da").alias("doc_id"))
        .unionByName(cand.select(F.col("db").alias("doc_id")))
        .distinct()
    )
    # Materialize the candidate-pruned verify features ONCE: every
    # verify joins feats on BOTH pair sides (da and db), so an
    # uncached feats recomputes its whole lineage twice — and in the
    # production shape (the admit CLIs, where feats_for reads the
    # corpus JSON) that means scanning the ENTIRE corpus twice, since
    # a JSON scan gets no semi-join pushdown. feats stays bounded by
    # the candidate set.
    feats = feats_for(cand_ids).cache()
    # ONE combined step-stats job (r19, guide §1.2/§2.6): group_map —
    # whose first consumer is the post-append members write — must be
    # cache-materialized BEFORE the appends mutate the store it
    # reads, and feats must be cache-filled before verify joins it on
    # both pair sides. A crossJoin of single-row aggregations does
    # all of it in one driver action (the subtrees run as concurrent
    # stages of one job), where r18 still paid one count per cache
    # plus a stats aggregation: new-docs stat (batch ops only — the
    # redelivery fast path above counted it already), (groups,
    # new-groups) off the is_new tag, and the feats cache fill whose
    # count value nothing reads. The heavy shared lineages
    # (touched_sigs, new_sigs, cand) are already cached by the banded
    # footprint's evaluation, so the concurrent subtrees cannot
    # double-compute them.
    step_stats = group_map.agg(
        F.count(F.lit(1)).alias("g"),
        F.count(F.when(F.col("is_new"), 1)).alias("n"),
    ).crossJoin(feats.agg(F.count(F.lit(1)).alias("nf")))
    if n_mem_new is None:
        step_stats = step_stats.crossJoin(
            mem_new.agg(F.count(F.lit(1)).alias("nd"))
        )
    srow = step_stats.collect()[0]
    n_groups, n_new_groups = srow["g"], srow["n"]
    if n_mem_new is None:
        n_mem_new = srow["nd"]
    verified = verify(cand, feats)
    if apply_appends:
        # banded BEFORE flat: a crash between the two re-admits the
        # group as new next retry and the index read's dropDuplicates
        # absorbs the re-appended rows — the reverse order would
        # strand a group with no index rows at all. The evidence
        # write OVERLAPS the banded + flat appends (r19, guide §2.6:
        # independent jobs back-fill each other's stragglers): it
        # reads only cached frames (cand, feats) and its own output
        # dir, and every crash state the overlap can produce —
        # evidence without banded rows, banded rows without evidence
        # — is one the sequential order already reaches (crash after
        # / before the evidence write) and recovers from by the same
        # idempotence (rotation-scoped evidence overwrite, banded
        # dropDuplicates, gh classification). The members append —
        # the step's commit point, which flips a redelivered batch to
        # "skip" — still runs LAST, strictly after the evidence
        # result is in (ev.result() re-raises a failed evidence write
        # before the batch can commit).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            ev = pool.submit(write_evidence, verified)
            try:
                write_banded_index(new_sigs, band_path, "append")
                write_table(new_sigs, sig_path, "append")
            finally:
                ev.result()
        write_table(
            mem_new.join(group_map, "gh").select("doc_id", "gh", "group_id"),
            mem_path,
            "append",
        )
    else:
        write_evidence(verified)
    for c in (mem_new, group_map, new_sigs, cand, feats, touched_sigs, g_batch):
        c.unpersist()
    return {
        "new_docs": n_mem_new,
        "groups": n_groups,
        "new_groups": n_new_groups,
        "scored": True,
    }


def dedup_store_rep_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_store_admission` with the production exact-dedup
    representative pre-pass composed in (block comment above): the
    same two-batch read-append-read lifecycle, but the persisted
    store holds ONE signature row per distinct token stream plus a
    (doc_id, gh, group_id) membership table, and the band join only
    ever sees group representatives. The returned frame is the
    group-level evidence EXPANDED back through membership to member
    pairs — the oracle is the uncapped op's one-shot union SQL,
    unchanged, so the hash match proves the pre-pass is
    semantics-preserving while the kernel's working set shrank from
    O(docs) to O(distinct contents). The store side of every band
    join comes through the band-partitioned index's PRUNED read
    (`pruned_store_rows` — only partitions the batch's band keys can
    match are opened), so the oracle covers the scan-pruning design
    too."""
    from ..functions.text import shingles_expr
    from ..sources.tables import table
    from .sinkcheck import scratch_dir

    root = scratch_dir("rep_store")
    sig_path = root + "/signatures"
    band_path = root + "/bands"
    mem_path = root + "/members"
    evidence = root + "/evidence"

    g_all = rep_group_frame(table(spark, sf_dir, "documents")).cache()

    g_base = g_all.where(_base_pred(F.col("doc_id")))
    reps_base = rep_reps(g_base)
    bootstrap_rep_store(
        spark,
        rep_signature_frame(reps_base),
        g_base.select("doc_id", "gh")
        .join(reps_base.select("gh", "group_id"), "gh")
        .select("doc_id", "gh", "group_id"),
        sig_path,
        band_path,
        mem_path,
    )

    # a group id IS its rep's doc_id, so rep features come straight
    # from the cached group frame, pruned to candidates
    def feats_for(cand_ids: DataFrame) -> DataFrame:
        return g_all.join(cand_ids, "doc_id", "left_semi").select(
            "doc_id",
            F.array_distinct(F.expr(shingles_expr("t", 3))).alias("fs"),
        )

    for rem in (_BATCH1_REM, _BATCH2_REM):
        rep_admission_step(
            spark,
            g_all.where(_slice(F.col("doc_id"), rem)),
            sig_path,
            band_path,
            mem_path,
            feats_for,
            lambda verified: verified.write.mode("append").parquet(evidence),
        )

    expand_group_evidence(spark, evidence, mem_path).write.mode(
        "overwrite"
    ).parquet(root + "/result")
    g_all.unpersist()
    return spark.read.parquet(root + "/result").select("da", "db", "jaccard")


def expand_group_evidence(
    spark: SparkSession,
    evidence: str,
    mem_path: str,
    value_col: str = "jaccard",
    self_values: DataFrame | None = None,
    sig_path: str | None = None,
    store_pred=None,
) -> DataFrame:
    """Group evidence + membership → member-level pairs (da, db,
    value), O(output) by contract — the kernel never did quadratic
    work. DISTINCT on the group evidence first: a group touched by
    several batches deterministically re-emits its pairs. Cross-group
    member pairs inherit the rep pair's value; within-group pairs are
    exact dups — jaccard exactly 1.0 (|A∩A| / |A∪A| is an integer
    ratio of equal counts), which is why the default needs no
    `self_values`. The vector store MUST pass `self_values`
    (group_id, value): its oracle computes a within-group pair's
    cosine as dot(q,q) / (sqrt(nq)·sqrt(nq)), and
    sqrt-of-rounded-square need not round-trip to exactly 1.0
    (SCALE.md "Vector-side exposure"), so the expansion reuses the
    oracle's own self-cosine arithmetic instead of a literal. Pairs
    with both sides in the base slice are excluded (the admission
    contract). Shared by the batch proof ops and the streaming
    sibling (streaming/rep_admission.py).

    `sig_path` switches membership to the LIVE (retraction-composed)
    view; `store_pred(col)` generalizes the both-sides-already-in-
    store exclusion (default: the two-batch ops' base slice — the
    retraction ops pass 'not in batch 2')."""
    store_pred = store_pred or _base_pred
    ev = spark.read.parquet(evidence).distinct()
    m = (
        live_members(spark, mem_path, sig_path)
        if sig_path is not None
        else read_table(spark, mem_path)
    )
    cross = (
        ev.join(
            m.select(F.col("group_id").alias("da"), F.col("doc_id").alias("xa")),
            "da",
        )
        .join(
            m.select(F.col("group_id").alias("db"), F.col("doc_id").alias("xb")),
            "db",
        )
        .where(~(store_pred(F.col("xa")) & store_pred(F.col("xb"))))
        .select(
            F.least("xa", "xb").alias("da"),
            F.greatest("xa", "xb").alias("db"),
            value_col,
        )
    )
    mw = m.select(F.col("group_id").alias("g"), F.col("doc_id").alias("xa"))
    if self_values is not None:
        mw = mw.join(
            self_values.select(
                F.col("group_id").alias("g"), F.col(value_col).alias("_sv")
            ),
            "g",
        )
    within = (
        mw.join(
            m.select(F.col("group_id").alias("g"), F.col("doc_id").alias("xb")),
            "g",
        )
        .where(F.col("xa") < F.col("xb"))
        .where(~(store_pred(F.col("xa")) & store_pred(F.col("xb"))))
        .select(
            F.col("xa").alias("da"),
            F.col("xb").alias("db"),
            (
                F.col("_sv") if self_values is not None
                else F.lit(1.0).cast("double")
            ).alias(value_col),
        )
    )
    return cross.unionByName(within)


# --------------------------------- embedding_store_admission

def cosine_on_candidates_nullsafe(
    cand: DataFrame, qn: DataFrame, threshold: float
) -> DataFrame:
    """`dedup.cosine_on_candidates` with the ORACLE's divide-by-zero
    semantics: DuckDB yields NULL for x/0 (a zero vector's pair is
    excluded by the threshold), while Spark 4's ANSI default RAISES —
    try_divide restores the NULL, so a corpus containing a zero
    embedding admits instead of crashing. Identical output wherever
    no zero vector appears (try_divide ≡ / for nonzero divisors).
    Kept local to the store family this round: dedup.py is
    byte-pinned until its r8 cohort rotates through the r13 window;
    its cosine ops carry the same latent zero-vector crash and should
    adopt this spelling then."""
    pairs = cand.join(
        qn.select(
            F.col("vec_id").alias("va"),
            F.col("q").alias("qa"),
            F.col("nq").alias("na"),
        ),
        "va",
    ).join(
        qn.select(
            F.col("vec_id").alias("vb"),
            F.col("q").alias("qb"),
            F.col("nq").alias("nb"),
        ),
        "vb",
    )
    cos = F.try_divide(
        _dot("qa", "qb").cast("double"),
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")),
    )
    return pairs.select("va", "vb", cos.alias("cosine")).where(
        F.col("cosine") >= threshold
    )


def emb_signature_frame(spark: SparkSession, qn: DataFrame) -> DataFrame:
    """(vec_id, q) → the persistable VECTOR store row: 6 hyperplane
    sign-band values (bv0..bv5) — the embedding analog of
    `signature_frame` (the `_hyperplane_bands` construction up to
    the bandvals stage, kept here so the store build, like the text
    side, shares one code path between base and batches)."""
    pl = spark.createDataFrame(_neardup_planes(), "p int, i int, w long")
    el = qn.select("vec_id", F.posexplode("q").alias("i", "v"))
    dots = (
        el.join(F.broadcast(pl), "i")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("v") * F.col("w")).alias("dot"))
    )
    bb = _NEARDUP_LSH_BAND_BITS
    return dots.groupBy("vec_id").agg(
        *[
            F.sum(
                F.expr(
                    f"CASE WHEN p >= {b * bb} AND p < {(b + 1) * bb} AND dot >= 0 "
                    f"THEN shiftleft(1, p - {b * bb}) ELSE 0 END"
                )
            )
            .cast("int")
            .alias(f"bv{b}")
            for b in range(_NEARDUP_LSH_BANDS)
        ]
    )


def embedding_store_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VECTOR-store admission lifecycle — same read-append-read
    contract as `dedup_store_admission`, over the hyperplane
    sign-band store: base vectors' band signatures written to
    parquet; two sequential batches (vec_id ≡ 0, then ≡ 5 mod 10)
    each read the store from disk, band-join against it (plus
    batch-internal pairs), verify candidates with EXACT
    int64-quantized cosine, and append their signatures. The oracle
    is the one-shot union spelling (all non-base×base pairs over
    uncapped bands), so the hash match proves the same sequential ≡
    one-shot equivalence — the store persists signatures only; the
    verifier re-reads candidate vectors from the embedding table,
    exactly how a production vector store splits index vs payload."""
    from .sinkcheck import scratch_dir

    root = scratch_dir("hyperplane_store")
    store_path = root + "/signatures"
    evidence = root + "/evidence"

    qn = _quantized(spark, sf_dir).cache()
    emb_signature_frame(
        spark, qn.where(_base_pred(F.col("vec_id")))
    ).write.mode("overwrite").parquet(store_path)

    key_cols = [f"bv{b}" for b in range(_NEARDUP_LSH_BANDS)]
    for step, rem in ((1, _BATCH1_REM), (2, _BATCH2_REM)):
        batch_sigs = emb_signature_frame(
            spark, qn.where(_slice(F.col("vec_id"), rem))
        )
        store_sigs = spark.read.parquet(store_path)
        cand = admission_candidates(
            store_sigs, batch_sigs, key_cols, id_col="vec_id"
        ).select(F.col("da").alias("va"), F.col("db").alias("vb"))
        verified = cosine_on_candidates_nullsafe(cand, qn, _COSINE_THRESHOLD)
        verified.write.mode("append").parquet(evidence)
        batch_sigs.write.mode("append").parquet(store_path)

    qn.unpersist()  # evidence is on disk; drop the vector cache
    return spark.read.parquet(evidence).select("va", "vb", "cosine")


_EMB_STORE_ADMISSION_SQL = f"""
WITH {_QUANT_CTE},
planes(p, i, w) AS (VALUES {_neardup_planes_values_sql()}),
{_hyperplane_bands_cte()},
cand AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id
  WHERE {_HYPERPLANE_GATE_SQL}
    AND NOT ({_pmod_sql('a.vec_id')} NOT IN ({_BATCH1_REM}, {_BATCH2_REM})
         AND {_pmod_sql('b.vec_id')} NOT IN ({_BATCH1_REM}, {_BATCH2_REM}))
)
SELECT va, vb,
       {_NEARDUP_COS_SQL_BODY} AS cosine
FROM cand
JOIN qn a ON a.vec_id = va
JOIN qn b ON b.vec_id = vb
WHERE {_NEARDUP_COS_SQL_BODY} >= {_COSINE_THRESHOLD}
"""


# ---------------------- embedding_store_rep_admission
#
# VERDICT r11's one standing `weak`: byte-identical documents produce
# byte-identical embeddings under any deterministic embedder, so the
# text kernel's mega-bucket mode existed verbatim on the vector side
# — a degenerate sign-band bucket of identical vectors made the band
# join quadratic in the bucket and grew the store with copies. The
# fix is the SAME rep pre-pass, generalized over the hyperplane
# band-key columns: group hash = md5 of the quantized component
# stream (identical q arrays have identical sign bands AND identical
# exact cosines to every other vector, so the collapse argument
# carries over verbatim). The one family-specific subtlety lives in
# the expansion: within-group pairs use the oracle's own self-cosine
# arithmetic, never a 1.0 literal (see expand_group_evidence).

_EMB_KEY_COLS = [f"bv{b}" for b in range(_NEARDUP_LSH_BANDS)]


def emb_rep_group_frame(qn: DataFrame) -> DataFrame:
    """Quantized vectors → the vector group frame (doc_id, gh, q,
    nq): gh = md5 of the exact quantized component stream (decimal
    longs joined by a separator no long contains; NULL elements are
    encoded to a sentinel OUTSIDE the decimal-long alphabet first,
    because concat_ws silently skips NULLs and would otherwise hash
    [1,NULL,2] and [1,2] to the same group — so the encoding is
    injective over malformed embeddings too, ADVICE r12). doc_id
    carries the vec_id under the name the shared step machinery
    uses. Eligibility mirrors the text side's ≥3-token rule: an EMPTY
    quantized vector is excluded here, at the group-frame level — it
    can produce no band rows (the uncapped op and the oracle emit
    none for it) and no non-NULL cosine, and admitting it into
    membership would make every later batch's identical empty vector
    classify as NEW content forever, since its group never gets a
    signature row (self-review r13 finding #4)."""
    return qn.where(F.size("q") > 0).select(
        F.col("vec_id").alias("doc_id"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.col("q"), lambda x: F.coalesce(x.cast("string"), F.lit("∅"))
                ),
            )
        ).alias("gh"),
        "q",
        "nq",
    )


def emb_rep_reps(g: DataFrame) -> DataFrame:
    """Vector group frame → one row per content group: same gh ⟹
    byte-identical q, so `first(q)` is exact and the rep choice is
    one aggregate (the vector sibling of `rep_reps`)."""
    return g.groupBy("gh").agg(
        F.min("doc_id").alias("group_id"), F.first("q").alias("q")
    )


def emb_rep_signature_frame(spark: SparkSession, reps: DataFrame) -> DataFrame:
    """Rep rows → one persistable hyperplane signature row PER GROUP:
    (group_id, gh, bv0..bv5) — the IN-ROW sign-band spelling: each
    plane's dot product is one `zip_with` aggregate against a 64-long
    weight-array literal, the 8 planes of a band fold into one bit-OR
    sum, all inside whole-stage codegen with ZERO shuffles (the
    exploded posexplode → broadcast-join → double-groupBy spelling
    costs two shuffles per call and this frame is built 3× per
    admission lifecycle — base + both batches' rep_builder).
    Interleaved median-of-5 A/B at sf0.1: 0.64 s → 0.26 s per build,
    outputs byte-identical (round-12 rep-op cost audit). This is the
    documented crossover case where in-row wins: the signature is
    PERSISTED (no cache-shared verify join re-derives it — the
    verify side reads raw q vectors, not signatures)."""
    bb = _NEARDUP_LSH_BAND_BITS
    w: dict[int, dict[int, int]] = {}
    for p, i, wt in _neardup_planes():
        w.setdefault(p, {})[i] = wt
    dim = max(max(d) for d in w.values()) + 1
    # both sides sliced to min(size(q), dim): zip_with NULL-pads the
    # shorter array, which would poison the whole fold for any
    # corpus whose vectors aren't exactly `dim`-dimensional — the
    # exploded spelling this replaces intersected indices instead
    # (caught by the hypothesis rep≡uncapped property on 4-dim
    # corpora)
    ln = f"least(size(q), {dim})"
    cols = []
    for b in range(_NEARDUP_LSH_BANDS):
        terms = []
        for j in range(bb):
            p = b * bb + j
            arr = "array(" + ",".join(
                f"{w[p][i]}L" for i in range(dim)
            ) + ")"
            dot = (
                f"aggregate(zip_with(slice(q, 1, {ln}), "
                f"slice({arr}, 1, {ln}), (x, y) -> x * y), "
                "0L, (a, x) -> a + x)"
            )
            terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
        cols.append(F.expr(" + ".join(terms)).cast("int").alias(f"bv{b}"))
    # An EMPTY q would fold to dot = 0 on every plane (CASE >= 0 true
    # → all-bits-set bands) while the exploded builder and the oracle
    # emit NO band rows for it — filter it out here so the two
    # signature builders stay structurally equivalent (ADVICE r12).
    # Convergence was never at risk (empty-q cosines are NULL,
    # threshold-excluded), but the spurious candidates and store row
    # are gone now.
    return reps.where(F.size("q") > 0).select("group_id", "gh", *cols)


def emb_self_cosines(groups: DataFrame, qn_groups: DataFrame) -> DataFrame:
    """(group_id) × the groups' quantized vectors → (group_id,
    cosine) where cosine is the pair expression evaluated at qa = qb
    — dot(q,q) / (sqrt(nq)·sqrt(nq)), THE SAME code path
    (`cosine_on_candidates`) every cross pair runs, threshold
    included, so a within-group member pair inherits exactly the
    value the oracle computes for it (and a zero-vector group, whose
    self-cosine is null, is excluded on both engines alike)."""
    pairs = groups.select(
        F.col("group_id").alias("va"), F.col("group_id").alias("vb")
    )
    return cosine_on_candidates_nullsafe(pairs, qn_groups, _COSINE_THRESHOLD).select(
        F.col("va").alias("group_id"), "cosine"
    )


def embedding_store_rep_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`embedding_store_admission` with the representative pre-pass
    composed in — the vector sibling of `dedup_store_rep_admission`,
    closing the last uncapped admission kernel (VERDICT r11 #1): the
    persisted store holds ONE hyperplane signature row per distinct
    quantized vector plus a membership table, the band join only ever
    sees group reps (served through the banded index's PRUNED read,
    int-keyed), and the returned frame is the group evidence expanded
    through membership — cross-group pairs inherit the rep pair's
    cosine, within-group pairs carry the oracle's self-cosine
    arithmetic. The oracle is the uncapped op's one-shot union SQL,
    UNCHANGED, so the hash match proves the pre-pass
    semantics-preserving while a degenerate bucket of B identical
    vectors reaches the kernel as one row and the store grows
    O(distinct vectors)."""
    from .sinkcheck import scratch_dir

    root = scratch_dir("hyperplane_rep_store")
    sig_path = root + "/signatures"
    band_path = root + "/bands"
    mem_path = root + "/members"
    evidence = root + "/evidence"

    g_all = emb_rep_group_frame(_quantized(spark, sf_dir)).cache()

    g_base = g_all.where(_base_pred(F.col("doc_id")))
    reps_base = emb_rep_reps(g_base)
    bootstrap_rep_store(
        spark,
        emb_rep_signature_frame(spark, reps_base),
        g_base.select("doc_id", "gh")
        .join(reps_base.select("gh", "group_id"), "gh")
        .select("doc_id", "gh", "group_id"),
        sig_path,
        band_path,
        mem_path,
        key_cols=_EMB_KEY_COLS,
    )

    # a group id IS its rep's vec_id, so verify-side vectors come
    # straight from the cached group frame, pruned to candidates
    def feats_for(cand_ids: DataFrame) -> DataFrame:
        return g_all.join(cand_ids, "doc_id", "left_semi").select(
            F.col("doc_id").alias("vec_id"), "q", "nq"
        )

    def verify(cand: DataFrame, feats: DataFrame) -> DataFrame:
        v = cosine_on_candidates_nullsafe(
            cand.select(F.col("da").alias("va"), F.col("db").alias("vb")),
            feats,
            _COSINE_THRESHOLD,
        )
        return v.select(
            F.col("va").alias("da"), F.col("vb").alias("db"), "cosine"
        )

    for rem in (_BATCH1_REM, _BATCH2_REM):
        rep_admission_step(
            spark,
            g_all.where(_slice(F.col("doc_id"), rem)),
            sig_path,
            band_path,
            mem_path,
            feats_for,
            lambda verified: verified.write.mode("append").parquet(evidence),
            key_cols=_EMB_KEY_COLS,
            rep_builder=lambda g: emb_rep_signature_frame(spark, emb_rep_reps(g)),
            verify=verify,
        )

    # self-cosines are only consumed by WITHIN-group pairs, which
    # exist only for groups with ≥ 2 members — restrict the frame to
    # those (on a mostly-distinct corpus this is near-empty, and the
    # expansion's self-value join stays O(groups-with-dups), never
    # O(groups); bench audit, round 12)
    multi = (
        read_table(spark, mem_path)
        .groupBy("group_id")
        .count()
        .where(F.col("count") > 1)
        .select(F.col("group_id").alias("doc_id"))
    )
    reps_q = g_all.join(multi, "doc_id", "left_semi")
    self_vals = emb_self_cosines(
        reps_q.select(F.col("doc_id").alias("group_id")),
        reps_q.select(F.col("doc_id").alias("vec_id"), "q", "nq"),
    )
    expand_group_evidence(
        spark, evidence, mem_path, value_col="cosine", self_values=self_vals
    ).write.mode("overwrite").parquet(root + "/result")
    g_all.unpersist()
    return spark.read.parquet(root + "/result").select(
        F.col("da").alias("va"), F.col("db").alias("vb"), "cosine"
    )


# ------------------------------------------------------ retraction
#
# VERDICT r12 #3: the store lifecycle had build/admit/compact/
# re-bucket/refresh but NO retire path — a production corpus shrinks
# (takedowns, re-crawls, licensing) and a rebuild-per-takedown is not
# a 100 TB answer. Design: retraction writes two SIDECARS and never
# rewrites the big tables —
#   <members>_tombstones  (doc_id)            docs removed
#   <signatures>_gdelta   (group_id, new_group_id)  group relabels;
#                                             new_group_id NULL ⟹
#                                             the group is DROPPED
# Readers compose them (live_members / live_store_sigs / the gdelta
# pass over the pruned index read), so a retraction costs
# O(retracted docs + affected groups), never O(store). Compaction
# (`fold_retractions`) folds both sidecars into the physical tables
# and retires them. The rep subtlety the verdict called out —
# retracting a group's FOUNDING doc — is handled by deterministic
# re-election: the new group_id is the min surviving member's doc id,
# and since gh ⟹ byte-identical content, every downstream consumer
# (verify features by rep doc id, self-cosines, band keys) is
# invariant under the relabel.
#
# Contract: a retracted doc_id stays retracted until the next fold —
# the admission step's raw-members anti-join treats the tombstoned
# row as "already seen", so a takedown can never silently resurrect
# through a redelivered batch. After a fold the id may be admitted
# fresh.


def tombstones_path(mem_path: str) -> str:
    return mem_path.rstrip("/") + "_tombstones"


def gdelta_path(sig_path: str) -> str:
    return sig_path.rstrip("/") + "_gdelta"


def gdelta_keys_path(sig_path: str) -> str:
    """The gdelta's BUCKET-KEY sidecar (VERDICT r16 #5): one row per
    (gh, doc_id) of every live member of a group the gdelta touches,
    recorded at `retract_docs` time while the rows are cheap to name
    — `retract_docs` reads the affected groups' membership anyway to
    compose relabels. The fold's partition discovery then derives
    the affected sig-store buckets from the gh column and the
    members buckets from the doc_id column DIRECTLY, skipping its
    raw-table affected-key scans — the last store-sized read in the
    retire path. Accumulated by union across retractions (like the
    tombstones) and retired with the gdelta. COMPLETENESS RULE: the
    file exists ⟺ it covers the ENTIRE pending gdelta — a retraction
    composing onto a pre-schema-change sidecar (gdelta present, keys
    absent) skips writing keys, so the fold falls back to the legacy
    scans instead of trusting a partial key set."""
    return sig_path.rstrip("/") + "_gdelta_keys"


def _read_sidecar(spark: SparkSession, path: str) -> DataFrame | None:
    """Sidecar read: None when absent or holding no parquet yet (a
    crashed first write) — callers treat both as 'no retractions'.
    Heals a crash-interrupted swap FIRST (self-review r14): a reader
    running before any writer would otherwise see only path+'.old'
    and conclude 'no retractions' — the admission guard would readmit
    takedowns, a retract re-run would rebuild the sidecar WITHOUT the
    earlier tombstones (then _swap_write's own healer restores the
    old set only to rename it aside and delete it: permanent loss),
    and every IVF reader would serve taken-down vectors."""
    import os

    from pyspark.errors import AnalysisException

    heal_swap(path)
    if not os.path.isdir(path):
        return None
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def _pid_alive(pid: int) -> bool:
    """Same-host process liveness (signal 0): True on EPERM (alive,
    not ours), False only when the pid is gone."""
    import os

    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return False


def _claim_rmtree(d: str) -> None:
    """Delete a dir ANOTHER process may concurrently rename content
    INTO (asides, '.old' swap remnants, retired sidecars): an
    in-place rmtree races path reuse — its file walk can unlink the
    FRESH content a racing rename just moved into the path, gutting
    a dir some process then treats as a complete table (the r18 fold
    stress's final loss chain: a healer's remnant rmtree gutted an
    aside the writer had re-renamed the live partition into, and a
    later restore published the gutted copy). So: atomically CLAIM
    the dir by renaming it to a unique dot-prefixed trash name
    (rename is atomic — after it, no other process's rename can
    target the claimed content), then delete the claim at leisure.
    Losing the claim race (dir gone / being claimed) means someone
    else owns the deletion — done either way. Crash-leaked trash
    dirs are invisible to readers (dot prefix) and reaped by
    `_clear_orphan_fold_staging` / the next claim of the same
    path."""
    import os
    import shutil
    import uuid

    parent, leaf = os.path.split(d.rstrip("/"))
    trash = os.path.join(
        parent, f".trash-{leaf}-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    )
    try:
        os.rename(d, trash)
    except OSError:
        return
    shutil.rmtree(trash, ignore_errors=True)


def heal_swap(path: str) -> None:
    """Complete a crash-interrupted rename-aside swap: if only
    path+'.old' exists it is the complete table — restore it. Must
    run BEFORE any read of `path` on a recovery path (self-review
    r13: building a read plan over the missing path raises
    PATH_NOT_FOUND before the healer inside the writer is ever
    reached).

    RACE-TOLERANT (ADVICE r17, hardened by tools/race_stress.py): a
    reader's heal can observe the live maintainer's swap window —
    path absent between rename(path→old) and rename(staging→path) —
    and lose the restore race to the maintainer completing its swap
    or to another reader's heal. The loss can surface as EITHER
    rename error (ENOENT: someone moved `old` first; ENOTEMPTY:
    `path` came back first), and a point-in-time guard is itself
    racy — by the time this process re-checks, the live writer may
    already have re-asided `path` for its NEXT swap (the TOCTOU the
    stress tool caught at 5000 swaps × 8 healers). So: re-evaluate
    the heal precondition and retry. A RACE cannot reproduce across
    8 observations of a stable (old ∧ ¬path) state — races require
    another process actively moving these dirs — so a persistent
    failure on a stable state is a real filesystem error and
    surfaces on the final attempt. The maintainer's side of the same
    race is `_swap_aside`'s retry."""
    import os

    old = path + ".old"
    for _ in range(8):
        if not (os.path.exists(old) and not os.path.exists(path)):
            return  # nothing to heal (or someone else already did)
        try:
            os.rename(old, path)
            return
        except OSError:
            continue  # raced — re-check the precondition
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)  # stable state + still failing: surface it


def retire_sidecar(path: str) -> None:
    """Remove a FOLDED sidecar together with its swap remnants: a
    stale path+'.old' left by a _swap_write that crashed before its
    final cleanup would be resurrected by the next heal_swap as live
    state — e.g. re-inserted vectors silently vanishing because a
    long-retired tombstone set came back (self-review r14)."""
    for p in (path, path + ".old", path + ".staging"):
        _claim_rmtree(p)


def _swap_aside(live: str, staging: str) -> None:
    """Publish a complete `staging` dir over `live` through the
    rename-aside discipline, ROBUST to a racing reader heal
    (ADVICE r17): a query node in ANOTHER process whose `heal_swap`
    fires between this writer's rename(live→old) and
    rename(staging→live) restores the superseded table into `live`,
    failing the second rename (ENOTEMPTY). Since `staging` is still
    complete, the restored dir is by construction the superseded
    table — re-aside it and retry instead of aborting the
    maintenance pass. Each retry consumes one reader's one-shot
    heal, so the loop terminates against any finite set of racing
    readers; exhausting it means a SECOND WRITER keeps re-creating
    `live` (out of contract — every maintainer docstring pins ONE
    maintenance process per artifact set) and raises with the
    artifact set intact (live complete, staging complete — re-run
    converges).

    At every instant `live` or `live+'.old'` holds a complete table
    (both, transiently, when a heal raced) — the invariant every
    crash/heal path in this module relies on."""
    import os
    import shutil

    old = live + ".old"
    for _ in range(16):
        if os.path.exists(live):
            os.rename(live, old)
        try:
            os.rename(staging, live)
        except OSError:
            if os.path.isdir(staging) and os.path.exists(live):
                continue  # racing heal restored old→live: re-aside
            raise
        _claim_rmtree(old)
        return
    raise RuntimeError(
        f"swap of {live!r} kept losing the rename race — a second "
        "maintainer process is writing the same artifact set (the "
        f"contract is ONE); staging is complete at {staging!r} and "
        "the live table is intact — stop the other writer and re-run"
    )


def _swap_write(df: DataFrame, path: str) -> None:
    """Generic rename-aside swap rewrite: at every instant path or
    path+'.old' is complete. Callers own sizing and layout — the
    O(retracted) sidecars write through it directly; full-table
    rewrites go through `_swap_write_table` (bucketed-layout
    preserving) or the compactors' staging spellings, which handle
    their own repartitioning (ADVICE r14: the old 'sidecars only'
    docstring had drifted — fold_ivf_retractions and
    compact_ivf_lists push the full inverted-lists table through
    here). The final swap is `_swap_aside` — robust to a racing
    reader heal (ADVICE r17)."""
    import shutil

    heal_swap(path)
    _claim_rmtree(path + ".old")
    staging = path + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    df.write.parquet(staging)
    _swap_aside(path, staging)


def live_members(
    spark: SparkSession, mem_path: str, sig_path: str
) -> DataFrame:
    """The membership table with retractions applied: tombstoned docs
    removed, re-elected groups relabeled, dropped groups' rows gone
    (belt — a dropped group's members are all tombstoned by
    construction)."""
    m = read_table(spark, mem_path)
    tomb = _read_sidecar(spark, tombstones_path(mem_path))
    if tomb is not None:
        m = m.join(tomb.select("doc_id"), "doc_id", "left_anti")
    return _apply_gdelta(spark, m, sig_path, "group_id")


def live_store_sigs(
    spark: SparkSession,
    sig_path: str,
    gh_keys: DataFrame | None = None,
    *,
    vals: list[int] | None = None,
) -> DataFrame:
    """The flat signature store with retractions applied. `gh_keys`
    (a frame with a gh column) prunes the read to the keys' buckets
    — exact for any consumer that only joins the store on gh (the
    admission kernel); omit it for whole-store passes (folds,
    rebuilds). `vals`: pre-collected bucket ids (see
    `batch_bucket_vals`) — skips the per-table collect."""
    src = (
        pruned_table(spark, sig_path, gh_keys, "gh", vals=vals)
        if gh_keys is not None
        else read_table(spark, sig_path)
    )
    return _apply_gdelta(spark, src, sig_path, "group_id")


def _apply_gdelta(
    spark: SparkSession, df: DataFrame, sig_path: str, id_col: str
) -> DataFrame:
    """Compose the group-delta sidecar over any frame carrying a
    group-id column (flat sigs, members, the pruned index read):
    dropped groups' rows removed, re-elected groups relabeled. The
    sidecar is O(retracted groups) → broadcast."""
    gd = _read_sidecar(spark, gdelta_path(sig_path))
    if gd is None:
        return df
    gd = F.broadcast(
        gd.select(
            F.col("group_id").alias("__gd_old"),
            F.col("new_group_id").alias("__gd_new"),
            F.lit(True).alias("__gd_hit"),
        )
    )
    out = df.join(gd, df[id_col] == F.col("__gd_old"), "left")
    out = out.where(~(F.col("__gd_hit").isNotNull() & F.col("__gd_new").isNull()))
    return out.withColumn(
        id_col, F.coalesce(F.col("__gd_new"), F.col(id_col))
    ).drop("__gd_old", "__gd_new", "__gd_hit")


def retract_docs(
    spark: SparkSession,
    sig_path: str,
    mem_path: str,
    ids: DataFrame,
) -> dict:
    """Remove docs from a rep store (both families — nothing here
    touches the signature columns): tombstone their membership, drop
    groups they empty, re-elect (min surviving doc id) groups whose
    rep they take away. The banded index is never touched — readers
    compose the gdelta over the pruned read (rep_admission_step), so
    retraction needs no index path. Write order: the bucket-key
    sidecar FIRST (`gdelta_keys_path` — a crash after it leaves a
    harmless superset of keys over the old gdelta), gdelta second,
    tombstones last, so a crash between any two leaves a state a
    plain re-run repairs (the docs are still live members, the
    recompute converges to the same delta — re-election is
    deterministic). Retracting an id the store never admitted is a
    no-op. Returns counts."""
    ids = ids.select("doc_id").distinct().cache()
    live = live_members(spark, mem_path, sig_path)
    # localCheckpoint, not cache: r is consumed AFTER the gdelta swap
    # below (the new tombstone rows), and cache is best-effort — an
    # evicted partition would recompute r's lineage against the NEW
    # gdelta, which already drops the dropped groups' rows, silently
    # losing their tombstones (ADVICE r13). Checkpointing severs the
    # lineage; r is O(retracted), so the materialization is bounded.
    r = live.join(ids, "doc_id", "left_semi").localCheckpoint()
    n_r = r.count()
    if n_r == 0:
        ids.unpersist()
        return {"retracted": 0, "dropped_groups": 0, "reelected": 0}

    affected = r.select("group_id").distinct()
    aff_members = live.join(affected, "group_id", "left_semi")
    surv = aff_members.join(ids, "doc_id", "left_anti")
    surv_min = surv.groupBy("group_id").agg(F.min("doc_id").alias("min_surv"))
    rep_alive = (
        surv.where(F.col("doc_id") == F.col("group_id"))
        .select("group_id")
        .distinct()
        .withColumn("__alive", F.lit(True))
    )
    # new effective id per affected group: unchanged when the rep
    # survives; min survivor when it doesn't; NULL (drop) when nobody
    # does. Only CHANGED groups become delta entries.
    eff_changes = (
        affected.join(surv_min, "group_id", "left")
        .join(rep_alive, "group_id", "left")
        .withColumn(
            "new_eff",
            F.when(F.col("__alive").isNotNull(), F.col("group_id")).otherwise(
                F.col("min_surv")
            ),
        )
        .where(
            F.col("new_eff").isNull() | (F.col("new_eff") != F.col("group_id"))
        )
        .select(F.col("group_id").alias("eff"), "new_eff")
        .cache()
    )
    # one aggregation fills the cache and yields both stats (r18:
    # replaced a count plus a filtered recount)
    cstats = eff_changes.agg(
        F.count(F.lit(1)).alias("c"),
        F.count(F.when(F.col("new_eff").isNull(), 1)).alias("d"),
    )
    crow = cstats.collect()[0]
    n_changes, n_dropped = crow["c"], crow["d"]

    # Compose onto PHYSICAL row keys: old sidecar entries pointing at
    # a changed effective id are rewritten to chain stored → latest,
    # AND every changed group also gets an entry keyed by its
    # effective id itself — members rows appended AFTER an earlier
    # re-election carry the then-live (effective) id physically, so
    # dropping that entry would strand them in a phantom group when
    # the re-elected rep is later retracted (round-13 self-review
    # finding #1; the entry is harmless when no physical row carries
    # the effective key — it just matches nothing). Key sets cannot
    # collide: old entry keys are previously retired ids, effective
    # ids were live until this very retraction.
    # the bucket-key sidecar (VERDICT r16 #5): (gh, doc_id) of the
    # CHANGED groups' live members — aff_members carries gh, so the
    # one frame names both the sig-store buckets (gh) and the
    # members buckets (doc_id) this gdelta's fold must rewrite.
    # Written BEFORE the gdelta so any crash leaves keys ⊇ gdelta.
    gd_schema = "group_id long, new_group_id long"
    old_gd = _read_sidecar(spark, gdelta_path(sig_path))
    keys_p = gdelta_keys_path(sig_path)
    old_keys = _read_sidecar(spark, keys_p)
    legacy_keys = old_gd is not None and old_keys is None
    if not legacy_keys:
        new_keys = (
            aff_members.join(
                eff_changes.select(F.col("eff").alias("group_id")),
                "group_id",
                "left_semi",
            )
            .select("gh", "doc_id")
            .distinct()
        )
        if old_keys is not None:
            new_keys = new_keys.unionByName(
                old_keys.select("gh", "doc_id")
            ).distinct()
        # localCheckpoint: the union's lineage reads the old sidecar
        # the swap below removes (the tombstone write's rule)
        new_keys = new_keys.localCheckpoint()
        _swap_write(new_keys, keys_p)
    if old_gd is None:
        old_gd = spark.createDataFrame([], gd_schema)
    mapped = old_gd.join(
        eff_changes, old_gd["new_group_id"] == eff_changes["eff"]
    ).select("group_id", F.col("new_eff").alias("new_group_id"))
    eff_entries = eff_changes.select(
        F.col("eff").alias("group_id"), F.col("new_eff").alias("new_group_id")
    )
    old_keep = old_gd.join(
        eff_changes.select(F.col("eff").alias("new_group_id")),
        "new_group_id",
        "left_anti",
    ).select("group_id", "new_group_id")
    new_gd = old_keep.unionByName(mapped).unionByName(eff_entries)
    _swap_write(new_gd, gdelta_path(sig_path))

    tomb_path = tombstones_path(mem_path)
    old_tomb = _read_sidecar(spark, tomb_path)
    new_tomb = r.select("doc_id")
    if old_tomb is not None:
        new_tomb = new_tomb.unionByName(old_tomb.select("doc_id")).distinct()
    _swap_write(new_tomb, tomb_path)

    for c in (ids, eff_changes):
        c.unpersist()
    return {
        "retracted": n_r,
        "dropped_groups": n_dropped,
        "reelected": n_changes - n_dropped,
    }


def heal_table_fold(path: str) -> None:
    """Complete or roll back a crash-interrupted partition-granular
    fold (`_granular_fold_rewrite`). The journal names the partition
    dirs that were mid-swap: an aside dir ('.bfold-<leaf>') paired
    with a MISSING live dir is the complete pre-fold partition —
    restore it (rolling back is always safe: the retraction sidecars
    are retired only after the entire fold succeeds, so pre-fold
    content + sidecars IS the live view, and the fold re-run
    converges — already-folded partitions hold no matching rows and
    are not selected again); an aside paired with a present live dir
    is a completed swap's remnant — drop it. No journal = one stat
    call, so every read path affords the check.

    SINGLE MAINTAINER, MANY READERS (ADVICE r16/r17): one fold
    WRITER per table — two concurrent folds corrupt nothing but
    abort each other (rename collisions; both converge on re-run).
    Concurrent READERS in other processes are safe: this healer
    tolerates losing its restore race to the live fold completing a
    swap (`_restore_aside`), and the fold's per-partition swaps
    retry through a racing heal (`_granular_fold_rewrite`'s bounded
    retry) instead of aborting — a reader whose already-built scan
    plan raced a swap sees FileNotFound and retries the read, the
    standard rename-swap caveat.

    An UNREADABLE journal (truncated/corrupt JSON — the writer
    crashed inside the journal write) is recovered, not raised
    (ADVICE r16): at that crash point no live partition has been
    touched (staging is fully written before the journal; swaps
    happen only after the journal is complete), so recovery is
    'remove journal + staging, restore any aside dirs found by
    glob' — and since the journal is now written atomically
    (tmp + rename), asides can only be remnants of an EARLIER
    completed heal, safe to restore-or-drop by the same rule."""
    import glob
    import json
    import os
    import shutil

    j = os.path.join(path, _FOLD_JOURNAL)
    if not os.path.exists(j):
        return
    try:
        with open(j) as f:
            jd = json.load(f)
        rels = jd["dirs"]
        if not isinstance(rels, list):
            raise ValueError("journal dirs is not a list")
    except FileNotFoundError:
        # the exists()→open() window raced the live fold writer (or
        # another healer) removing the journal — the fold completed;
        # nothing to heal (tools/race_stress.py fold mode)
        return
    except (json.JSONDecodeError, KeyError, ValueError, TypeError):
        jd = None
    if jd is not None:
        # LIVE-WRITER DISCRIMINATION (r18, tools/race_stress.py fold
        # mode): a journal names an in-flight fold, and rolling back
        # a LIVE one both aborts useful work and — under many hot
        # readers — livelocks the fold entirely. The journal records
        # the writer's pid; while that process is alive, WAIT for
        # the swap phase to finish (journal removed — typically
        # milliseconds) instead of rolling back. Rollback remains the
        # recovery for a DEAD writer (crash) and, after the bounded
        # wait, for a hung one — abort-then-converge as before. Pid
        # liveness is same-host; a multi-host shared-storage
        # deployment needs a lease service in its place (the module
        # contract already pins one maintainer per artifact set).
        pid = jd.get("pid")
        if pid and _pid_alive(int(pid)):
            import time as _time

            for _ in range(200):  # ≤ 10 s: swap phases are ms-scale
                _time.sleep(0.05)
                if not os.path.exists(j):
                    return  # the live fold finished its swap phase
                try:
                    with open(j) as f:
                        jd2 = json.load(f)
                    if jd2.get("pid") != pid:
                        # a different fold owns the journal now —
                        # restart against the fresh state
                        return heal_table_fold(path)
                except (FileNotFoundError, json.JSONDecodeError):
                    return
            # fall through: writer hung (or pid confusion) — roll back
    if jd is None:
        # corrupt journal: no swap has happened — drop journal +
        # staging, restore any aside found on disk (missing live →
        # it IS the partition; live present → stale remnant)
        for aside in glob.glob(
            os.path.join(path, "**", _BFOLD_PREFIX + "*"), recursive=True
        ):
            parent, leaf = os.path.split(aside)
            live = os.path.join(parent, leaf[len(_BFOLD_PREFIX):])
            _restore_aside(aside, live)
        _claim_rmtree(path + ".bfold")
        _remove_quiet(j)
        return
    for rel in rels:
        parent, leaf = os.path.split(rel)
        live = os.path.join(path, rel)
        aside = os.path.join(path, parent, _BFOLD_PREFIX + leaf)
        _restore_aside(aside, live)
    # remove ONLY the staging dir THIS journal names (r18 stress
    # finding): a healer acting on a stale journal must never fire
    # its rmtree into a later attempt's staging. Legacy journals
    # (no 'staging' key) used the fixed '.bfold' name.
    stg = jd.get("staging")
    _claim_rmtree(
        os.path.join(os.path.dirname(path), stg)
        if stg
        else path + ".bfold"
    )
    _remove_quiet(j)


def _restore_aside(aside: str, live: str) -> None:
    """Restore one fold aside dir, tolerating the races concurrent
    READERS are allowed to run (ADVICE r17 — heal fires on every
    read path, so two query processes can heal the same crash
    remnant, and a heal can fire inside the live fold's own swap
    window): losing the rename race to the fold writer completing
    its swap (`live` appears) or to another healer (`aside`
    vanishes) means the partition already holds a complete state —
    nothing left to heal. A point-in-time failure guard is itself
    racy (heal_swap's TOCTOU, caught by tools/race_stress.py), so
    the precondition is re-evaluated and retried; a persistent
    failure on a stable state is a real error and surfaces."""
    import os
    import shutil

    for _ in range(8):
        if not os.path.isdir(aside):
            return
        if os.path.isdir(live):
            _claim_rmtree(aside)
            return
        try:
            os.rename(aside, live)
            return
        except OSError:
            continue  # raced — re-check
    if os.path.isdir(aside) and not os.path.isdir(live):
        os.rename(aside, live)


def _remove_quiet(p: str) -> None:
    """os.remove tolerating a concurrent healer/writer having removed
    the file first (two readers may heal the same journal)."""
    import os

    try:
        os.remove(p)
    except FileNotFoundError:
        pass


def _fold_staging_path(path: str) -> str:
    """A UNIQUE staging dir per fold attempt, recorded in the
    journal so healers only ever clean the staging of the fold they
    actually observed (r18 stress finding, tools/race_stress.py fold
    mode): with the old fixed `path + '.bfold'` name, a healer that
    read an EARLIER aborted attempt's journal could fire its staging
    rmtree into a LATER attempt's in-progress staging write."""
    import os
    import uuid

    return f"{path}.bfold-{os.getpid()}-{uuid.uuid4().hex[:8]}"


def _clear_orphan_fold_staging(path: str) -> None:
    """Writer-side entry cleanup: remove fold staging dirs with no
    journal left to name them (a crashed attempt after its journal
    was healed away), and orphaned publish-handoff dirs ('.bpub-*',
    dot-prefixed so readers never see them — a crash between the
    handoff rename and the publish leaves one; its live partition
    still holds the pre-fold content, so dropping the orphan and
    re-folding is the correct recovery). Single-maintainer territory
    — only the fold writer calls this, and only BEFORE it begins
    staging."""
    import glob
    import os
    import shutil

    if os.path.exists(os.path.join(path, _FOLD_JOURNAL)):
        return  # a journal exists: heal first, don't guess
    for d in glob.glob(path + ".bfold*"):
        shutil.rmtree(d, ignore_errors=True)
    for d in glob.glob(os.path.join(path, "**", ".bpub-*"), recursive=True):
        shutil.rmtree(d, ignore_errors=True)
    # reap crash-leaked claim-trash (`_claim_rmtree` died between its
    # claim rename and the delete): inside the table (aside claims)
    # and beside it (.old/staging claims) — all dot-prefixed, so
    # readers never saw them
    for d in glob.glob(os.path.join(path, "**", ".trash-*"), recursive=True):
        shutil.rmtree(d, ignore_errors=True)
    parent, leaf = os.path.split(path.rstrip("/"))
    for d in glob.glob(os.path.join(parent, f".trash-{leaf}*")):
        shutil.rmtree(d, ignore_errors=True)


def _granular_fold_rewrite(
    path: str, staging: str, rels: list[str], emptied: set[str]
) -> None:
    """Swap staged partition dirs into the live table under the fold
    journal. `staging` (already fully written — no live state is
    touched until the staged job has committed) holds the FOLDED
    content of exactly the partitions named by `rels` (relative dirs
    like 'pb=3' or 'band=2/kb=7'); a rel the fold EMPTIED has its
    live dir retired. `emptied` is computed by the CALLER from the
    folded frame's own lineage (distinct partition values — reads
    the writer-owned live sources, never the staging dir), so no
    amount of staging tampering by a racing healer can turn a
    non-empty partition into a retire: tampering at worst fails the
    staged-dir checks below and aborts (r18 stress finding — the
    earlier staged-dir-absence inference lost a partition when a
    stale healer gutted staging mid-write). Every
    partition NOT in `rels` is left byte-invariant — the whole point
    (VERDICT r15 #2: full-table rewrites made fold cost scale with
    the bucket count instead of the retracted set). The journal is
    written ATOMICALLY (tmp + rename, ADVICE r16) and names this
    attempt's staging dir; on ANY failure the writer rolls its own
    attempt back (asides restored, staging + journal gone), so an
    abort never leaves a journal inviting healers into a future
    attempt's state."""
    import json
    import os
    import shutil
    # keep the marker's cached row count exact through the fold at
    # O(retracted) cost (VERDICT r17 #5): footer-count only the
    # affected partitions (pre-swap live vs staged), invalidate the
    # cache BEFORE any swap (a crash or a raced abort leaves no stale
    # number), and write the adjusted count back only on success.
    prior = _marker_rows(path)
    delta = 0
    if prior is not None:
        for rel in rels:
            new_n = _footer_rows(os.path.join(staging, rel))
            old_n = _footer_rows(os.path.join(path, rel))
            if new_n is None or old_n is None:
                prior = None  # unreadable footer: leave invalidated
                break
            delta += new_n - old_n
        _set_marker_rows(path, None)
    # snapshot each staged partition's file set BEFORE the journal
    # exists (until then no healer touches staging): a cross-process
    # heal_table_fold rolling this fold back rmtree's the staging
    # dir, and its in-flight deletion can GUT a staged partition's
    # files in the instants before our rename publishes it — an
    # isdir() check passes while the dir is already partial, and
    # swapping a partial partition in would be silent row loss, not
    # an abort. The post-swap verification below turns that
    # interleaving into the documented abort-then-converge
    # (tools/race_stress.py fold mode).
    staged_files = {
        rel: sorted(os.listdir(os.path.join(staging, rel)))
        for rel in rels
        if rel not in emptied
    }
    j = os.path.join(path, _FOLD_JOURNAL)
    with open(j + ".tmp", "w") as f:
        json.dump(
            {
                "dirs": rels,
                "emptied": sorted(emptied),
                "staging": os.path.basename(staging),
                # writer liveness (r18): healers WAIT out a live
                # fold's swap phase instead of rolling it back —
                # rollback is for dead/hung writers
                "pid": os.getpid(),
            },
            f,
        )
    os.rename(j + ".tmp", j)
    try:
        _fold_swap_loop(path, staging, rels, emptied, staged_files)
    except BaseException:
        # writer-side rollback: finish what a heal would do so NO
        # journal survives this abort — a stale journal is what let
        # a healer clean a FUTURE attempt's staging (the r18 stress
        # loss chain). Already-swapped rels stay folded (consistent:
        # sidecars are retired only after the whole fold succeeds);
        # everything else is restored to its pre-fold content.
        for rel in rels:
            parent, leaf = os.path.split(rel)
            _restore_aside(
                os.path.join(path, parent, _BFOLD_PREFIX + leaf),
                os.path.join(path, rel),
            )
            shutil.rmtree(
                os.path.join(path, parent, ".bpub-" + leaf),
                ignore_errors=True,
            )
        shutil.rmtree(staging, ignore_errors=True)
        _remove_quiet(j)
        raise
    shutil.rmtree(staging, ignore_errors=True)
    _remove_quiet(j)
    if prior is not None:
        _set_marker_rows(path, prior + delta)


def _fold_swap_loop(
    path: str,
    staging: str,
    rels: list[str],
    emptied: set[str],
    staged_files: dict[str, list[str]],
) -> None:
    import os
    import shutil

    for rel in rels:
        parent, leaf = os.path.split(rel)
        live = os.path.join(path, rel)
        aside = os.path.join(path, parent, _BFOLD_PREFIX + leaf)
        _claim_rmtree(aside)
        staged = os.path.join(staging, rel)
        if rel in emptied:
            # fold emptied this partition: retire it. A racing heal
            # can resurrect the aside into `live` before the rmtree
            # lands — re-check and re-retire (otherwise the fold
            # would REPORT success while the partition keeps its
            # unfolded rows: wrong answers, not an abort).
            for attempt in range(16):
                if os.path.isdir(live):
                    os.rename(live, aside)
                _claim_rmtree(aside)
                if not os.path.isdir(live):
                    break
            else:
                raise RuntimeError(
                    f"fold retire of {live!r} kept losing the rename "
                    "race — a second maintenance process is folding "
                    "the same table (the contract is ONE); re-run"
                )
            continue
        # PUBLISH HANDOFF (r18 stress finding, the partial-publish
        # loss chain): a racing heal's rollback rmtree's the staging
        # tree, and a staged dir can be HALF-deleted at the instant
        # we would publish it; the old spelling renamed it into
        # `live` and verified after — but a concurrent heal then saw
        # (aside ∧ live) and dropped the aside as a "completed swap
        # remnant", deleting the only pre-fold copy before our
        # rollback could use it. So: move the staged dir OUT of the
        # healer-deletable staging tree first (after the rename, an
        # in-flight rmtree holds only stale paths and can delete
        # nothing more), verify the PRIVATE copy against the
        # pre-journal snapshot, and only then touch `live`. A
        # published live dir is therefore ALWAYS complete — which is
        # exactly the invariant that makes the healer's
        # 'live present ⇒ aside is a remnant' rule safe.
        pub = os.path.join(path, parent, ".bpub-" + leaf)
        shutil.rmtree(pub, ignore_errors=True)
        try:
            os.rename(staged, pub)
        except OSError:
            if not os.path.isdir(staged):
                raise RuntimeError(
                    f"fold staging for {rel!r} vanished mid-fold — a "
                    "reader's heal_table_fold in another process "
                    "rolled this fold back. The table is intact "
                    "(pre-fold content + sidecars = the live view); "
                    "re-run the fold"
                )
            raise
        if sorted(os.listdir(pub)) != staged_files[rel]:
            shutil.rmtree(pub, ignore_errors=True)
            raise RuntimeError(
                f"fold staging for {rel!r} was gutted mid-fold by a "
                "reader's heal_table_fold in another process — the "
                "live partition was never touched; re-run the fold"
            )
        # rename-aside with the `_swap_aside` retry (ADVICE r17): a
        # reader's heal restoring the aside inside this window is
        # re-asided and retried; `pub` is writer-private and verified
        # complete, so the publish itself can no longer be gutted
        for attempt in range(16):
            if os.path.isdir(live):
                os.rename(live, aside)
            try:
                os.rename(pub, live)
            except OSError:
                if os.path.isdir(pub) and os.path.isdir(live):
                    continue
                raise
            _claim_rmtree(aside)
            break
        else:
            raise RuntimeError(
                f"fold swap of {live!r} kept losing the rename race — "
                "a second maintenance process is folding the same "
                "table (the contract is ONE); re-run the fold"
            )


def _fold_table_granular(
    spark: SparkSession,
    path: str,
    sig_path: str,
    gd_keys: DataFrame | None,
    tomb: DataFrame | None,
    aff_keys: DataFrame | None = None,
) -> int:
    """Granular fold of ONE bucketed table (flat sigs or members):
    find the rows the sidecars touch, rewrite only their partitions.
    Partition discovery is O(retracted) when the retraction recorded
    its bucket-key sidecar (`aff_keys` — the affected raw key values
    themselves, VERDICT r16 #5): the recorded keys name the
    CANDIDATE partitions with no table read, and the exact
    affected-key scan then runs over those partitions only — so the
    scan's convergence semantics are kept intact (a partition an
    earlier crashed attempt already folded matches nothing and drops
    back out; a recorded-keys superset from a keys-then-crash
    retraction re-run selects nothing extra) at O(retracted) cost
    end to end. Without recorded keys (a pre-schema-change sidecar)
    discovery falls back to the 2-column columnar scan of the whole
    RAW table (no shuffle — the sidecar side is O(retracted) and
    broadcast). Either way the WRITE is bounded by the affected
    partition set. Returns the number of partitions rewritten."""
    import os
    import shutil

    from pyspark.errors import AnalysisException

    # heal FIRST: a previous attempt's crash remnants (journal +
    # asides) must be resolved before this attempt reads partitions
    # or stages — most callers healed already; this is the fold's
    # own belt (tools/race_stress.py fold mode)
    heal_table_fold(path)
    lay = table_layout(path)
    key = lay["key"]

    def _pb_vals(df, col):
        pb = _tbl_pb_expr(df.schema[col].dataType, col, lay["buckets"], lay["pb"])
        return {
            r[0]
            for r in df.select(pb.alias(_TBL_PB)).distinct().collect()
            if r[0] is not None
        }

    def _to_rels(vals):
        return [
            rel
            for v in sorted(vals)
            if os.path.isdir(os.path.join(path, rel := f"{_TBL_PB}={v}"))
        ]

    def _read_rels(rels):
        if not rels:
            return None
        try:
            return spark.read.option("basePath", path).parquet(
                *[os.path.join(path, rel) for rel in rels]
            )
        except AnalysisException:
            # dirs exist but hold no parquet (crash remnants): no
            # rows there (same guard as pruned_table)
            return None

    vals = set()
    if gd_keys is not None:
        if aff_keys is not None:
            cand = _read_rels(_to_rels(_pb_vals(aff_keys.select(key), key)))
        else:
            cand = read_table(spark, path)  # legacy: full-table scan
        if cand is not None:
            vals |= _pb_vals(
                cand.select(key, "group_id").join(
                    F.broadcast(gd_keys), "group_id", "left_semi"
                ),
                key,
            )
    if tomb is not None:
        # tombstones are doc_ids — only the members table (bucket key
        # doc_id) ever passes them here; they are key VALUES already,
        # so no scan is needed (or ever was) for this term
        vals |= _pb_vals(tomb.select("doc_id"), "doc_id")
    rels = _to_rels(vals)
    if not rels:
        return 0
    src = _read_rels(rels)
    if src is None:
        return 0
    folded = src
    if tomb is not None:
        folded = folded.join(
            F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
        )
    folded = _apply_gdelta(spark, folded, sig_path, "group_id")
    # materialize ONCE (batch-bounded: the affected partitions'
    # folded rows) — the emptied-set distinct below and the staging
    # write would otherwise each evaluate the join+gdelta DAG
    folded = folded.localCheckpoint(eager=True)
    # SEMANTIC emptied-set, from the folded frame's own lineage: the
    # distinct read touches the writer-owned live partitions, never
    # the staging dir, so no staging tampering by a racing healer can
    # reclassify a non-empty partition as "fold emptied it" (the r18
    # stress's loss chain). O(affected partitions) rows — the bounded
    # fold-discovery collect family (tests/test_plans.py allowlist).
    present = {
        f"{_TBL_PB}={r[0]}"
        for r in folded.select(_TBL_PB).distinct().collect()
    }
    emptied = {rel for rel in rels if rel not in present}
    if os.environ.get("FOLD_TRACE"):  # tools/race_stress.py forensics
        print(
            f"FOLD_TRACE table rels={rels} present={sorted(present)} "
            f"emptied={sorted(emptied)}",
            flush=True,
        )
    _clear_orphan_fold_staging(path)
    staging = _fold_staging_path(path)
    (
        # carry the READ's own partition column through — bit-identical
        # layout by construction (the fold never changes a bucket key,
        # so no row can cross partitions)
        folded.repartition(F.col(_TBL_PB))
        .write.partitionBy(_TBL_PB)
        .mode("overwrite")
        .parquet(staging)
    )
    _granular_fold_rewrite(path, staging, rels, emptied)
    return len(rels)


def _fold_index_granular(
    spark: SparkSession,
    band_path: str,
    sig_path: str,
    gd_keys: DataFrame,
    aff_gh: DataFrame | None = None,
) -> int:
    """Granular fold of the banded index: same contract as
    `_fold_table_granular` over the index's own (band, kb) hive
    layout. Equivalent to the full rebuild it replaces: a relabeled
    group's sig row keeps the old rep's signature (so its band keys
    — and therefore its partitions — are unchanged), and a dropped
    group's rows are removed by the same gdelta composition the
    pruned reader applies; crash-leaked duplicate index rows remain
    tolerated by the reader's dropDuplicates and retired by
    compact_banded_index, exactly as before.

    Partition discovery is O(retracted) when the retraction recorded
    its gh keys (`aff_gh`, VERDICT r16 #5): the affected (band, kb)
    pairs are recomputed from the PRUNED sig-store read (band keys
    are content-derived, so any incarnation of a group's sig row —
    relabeled or not — yields the same pairs; this must run BEFORE
    the sig fold removes a dropped group's rows, which
    fold_retractions orders). Fallback to the full index scan when
    keys are absent OR when some recorded gh has no sig rows left —
    the one state a crashed earlier fold can produce (sig fold done,
    index fold not, dropped group's sig rows already gone), where
    deriving from sigs would silently leak the dropped group's index
    rows forever."""
    import os
    import shutil

    from pyspark.errors import AnalysisException

    heal_table_fold(band_path)  # same entry belt as the table fold
    pairs = None
    if aff_gh is not None:
        sig_rows = pruned_table(spark, sig_path, aff_gh, "gh").join(
            F.broadcast(aff_gh), "gh", "left_semi"
        )
        n_rec = aff_gh.count()
        n_found = sig_rows.select("gh").distinct().count()
        if n_found == n_rec:
            lay = banded_layout(band_path)
            pair_rows = banded_rows_frame(
                sig_rows, lay["buckets"], lay["key_cols"]
            ).select("band", "kb").distinct()
            pairs = [(r["band"], r["kb"]) for r in pair_rows.collect()]
    if pairs is None:
        try:
            idx = spark.read.parquet(band_path)
        except AnalysisException:
            return 0  # marker-only empty index: nothing to fold
        pair_rows = (
            idx.select("band", "kb", "group_id")
            .join(F.broadcast(gd_keys), "group_id", "left_semi")
            .select("band", "kb")
            .distinct()
        )
        pairs = [(r["band"], r["kb"]) for r in pair_rows.collect()]
    rels = [
        rel
        for b, kb in pairs
        if os.path.isdir(
            os.path.join(band_path, rel := f"band={b}/kb={kb}")
        )
    ]
    if not rels:
        return 0
    try:
        src = spark.read.option("basePath", band_path).parquet(
            *[os.path.join(band_path, rel) for rel in rels]
        )
    except AnalysisException:
        return 0  # selected dirs hold no parquet (crash remnants)
    folded = _apply_gdelta(spark, src, sig_path, "group_id")
    # materialize once for the distinct + the staging write — see
    # _fold_table_granular
    folded = folded.localCheckpoint(eager=True)
    # semantic emptied-set from lineage — see _fold_table_granular
    present = {
        f"band={r['band']}/kb={r['kb']}"
        for r in folded.select("band", "kb").distinct().collect()
    }
    emptied = {rel for rel in rels if rel not in present}
    _clear_orphan_fold_staging(band_path)
    staging = _fold_staging_path(band_path)
    (
        folded.repartition("band", "kb")
        .write.partitionBy("band", "kb")
        .mode("overwrite")
        .parquet(staging)
    )
    _granular_fold_rewrite(band_path, staging, rels, emptied)
    return len(rels)


def fold_retractions(
    spark: SparkSession, sig_path: str, band_path: str, mem_path: str
) -> dict:
    """Fold the retraction sidecars into the physical tables and
    retire them — the compaction-time companion to `retract_docs`
    (VERDICT r12 #3 'compaction retires tombstones'). Every step is
    idempotent (a gdelta keyed by ids an earlier crash already
    relabeled simply matches nothing; a tombstone for an already
    removed doc anti-joins nothing), so the recovery story is
    re-run; the sidecars are deleted LAST, only after all three
    tables are folded. No-op when no sidecars exist. SINGLE
    MAINTAINER (ADVICE r16): run folds from one maintenance process
    — a concurrent reader in ANOTHER process can heal an aside back
    into place mid-swap, failing this fold's rename (it converges
    on re-run, but aborts); see `heal_table_fold`.

    Tables in the key-bucketed layout (and the banded index) fold
    PARTITION-GRANULARLY (VERDICT r15 #2): only partitions holding
    tombstoned/relabeled rows are rewritten — the write cost tracks
    the retracted set, not the bucket count (the r15 soak's fold
    column grew 7.6 → 18.0 s when buckets went 256 → 1024 on the
    same store, pure per-partition overhead of the full-table swap).
    Legacy-flat tables keep the full `_swap_write_table` rewrite.
    Returns {"folded": True, "sig_parts": n, "index_parts": n,
    "mem_parts": n} with n = partitions rewritten, 0 = table
    untouched (e.g. a tombstone-only fold never rewrites the sig
    store or index), -1 = legacy full rewrite."""
    import os

    # heal crash-interrupted swaps FIRST: a prior fold (or sidecar
    # write) that died mid-rename leaves only path+'.old' (or a
    # granular fold's journal + aside dirs), and the live-view read
    # plans below would raise PATH_NOT_FOUND before _swap_write's
    # own healer ran (self-review r13 finding #2)
    for p in (sig_path, mem_path, band_path):
        heal_swap(p)
        heal_table_fold(p)
    gd_p, tomb_p = gdelta_path(sig_path), tombstones_path(mem_path)
    keys_p = gdelta_keys_path(sig_path)
    for p in (gd_p, tomb_p):
        heal_swap(p)
    gd = _read_sidecar(spark, gd_p)
    tomb = _read_sidecar(spark, tomb_p)
    keys = _read_sidecar(spark, keys_p)
    if gd is None and tomb is None:
        return {"folded": False}
    lay = banded_layout(band_path)
    if lay is None and os.path.isdir(band_path):
        # an index dir without a layout marker is a crashed overwrite
        # build — folding past it would retire the gdelta while stale
        # band rows keyed by retired/dropped group ids stay behind
        # with nothing left to filter them at pruned-read time
        # (ADVICE r13). Mirror write_banded_index's append rule: force
        # the rebuild instead. A MISSING index dir stays a no-op.
        raise RuntimeError(
            f"banded index at {band_path} has no layout marker "
            "(interrupted build?): rebuild it with write_banded_index "
            "mode='overwrite' before folding retractions"
        )
    # the gdelta KEY set drives the sig-store and index folds; an
    # empty one (possible: a retraction where every touched group
    # kept its rep writes only tombstones worth of change) means
    # both are already physically correct — skip them entirely
    gd_keys = None
    if gd is not None:
        gd_keys = gd.select("group_id").distinct().cache()
        if gd_keys.count() == 0:
            gd_keys.unpersist()
            gd_keys = None
    # the recorded bucket keys (VERDICT r16 #5): exists ⟺ covers the
    # whole gdelta (gdelta_keys_path's completeness rule), making
    # every discovery below O(retracted). localCheckpoint: the fold
    # consumes them AFTER sidecar-destroying swaps begin.
    aff_gh = aff_docs = None
    if keys is not None and gd_keys is not None:
        k = keys.localCheckpoint()
        aff_gh = k.select("gh").distinct()
        aff_docs = k.select("doc_id").distinct()
    stats = {"folded": True, "sig_parts": 0, "index_parts": 0, "mem_parts": 0}
    if gd_keys is not None:
        if table_layout(sig_path) is not None:
            # index discovery FIRST: it derives (band, kb) from the
            # sig rows, and the sig fold below removes a dropped
            # group's rows (_fold_index_granular's ordering note)
            if lay is not None:
                stats["index_parts"] = _fold_index_granular(
                    spark, band_path, sig_path, gd_keys, aff_gh
                )
            stats["sig_parts"] = _fold_table_granular(
                spark, sig_path, sig_path, gd_keys, None, aff_gh
            )
        else:
            _swap_write_table(live_store_sigs(spark, sig_path), sig_path)
            stats["sig_parts"] = -1
            if lay is not None:
                write_banded_index(
                    read_table(spark, sig_path),
                    band_path,
                    "overwrite",
                    key_cols=lay["key_cols"],
                    buckets=lay["buckets"],
                )
                stats["index_parts"] = -1
    if table_layout(mem_path) is not None:
        stats["mem_parts"] = _fold_table_granular(
            spark, mem_path, sig_path, gd_keys, tomb, aff_docs
        )
    else:
        _swap_write_table(live_members(spark, mem_path, sig_path), mem_path)
        stats["mem_parts"] = -1
    if gd_keys is not None:
        gd_keys.unpersist()
    for p in (gd_p, tomb_p, keys_p):
        retire_sidecar(p)
    return stats


def ivf_tombstones_path(lists_path: str) -> str:
    return lists_path.rstrip("/") + "_tombstones"


def _lists_id_col(lists: DataFrame) -> str:
    """The vector-id column of an inverted-lists table: ann_store
    writes (n_id, list_id); accept vec_id too for externally built
    tables (the CLI takes an arbitrary --lists path)."""
    return "n_id" if "n_id" in lists.columns else "vec_id"


def live_ivf_lists(spark: SparkSession, lists_path: str) -> DataFrame:
    """The inverted-lists table with retractions applied: tombstoned
    vec_ids removed. The sidecar is O(retracted) → broadcast — the
    same composition rule as `live_members`, so EVERY lists reader
    (search, probe-recall, refresh, split, compaction) sees the
    post-takedown index without a single physical rewrite."""
    heal_swap(lists_path)
    lists = spark.read.parquet(lists_path)
    tomb = _read_sidecar(spark, ivf_tombstones_path(lists_path))
    if tomb is None:
        return lists
    idc = _lists_id_col(lists)
    return lists.join(
        F.broadcast(tomb.select(F.col("vec_id").alias(idc))), idc, "left_anti"
    )


def retract_ivf_vectors(
    spark: SparkSession, lists_path: str, ids: DataFrame
) -> dict:
    """The IVF sibling of `retract_docs` — O(retracted), never
    O(index) (VERDICT r13 #2: the previous full read→anti-join→swap
    rewrite was a full-index write per takedown batch): merge the
    retracted vec_ids into a tombstone sidecar beside the lists
    table; the physical lists are untouched, readers compose the
    sidecar (`live_ivf_lists`), and `fold_ivf_retractions` (run by
    compact-store / refresh-ivf, which rewrite the lists anyway)
    retires it. The codebook keeps its centroids — vanished-list ids
    never drop, matching refresh_ivf_centroids' rule — and recall
    drift from the now-stale centroids is what `probe-recall` exists
    to catch. Same crash-safe swap as the text sidecars."""
    ids = ids.select(F.col("doc_id").alias("vec_id")).distinct()
    tomb_path = ivf_tombstones_path(lists_path)
    heal_swap(tomb_path)
    old_tomb = _read_sidecar(spark, tomb_path)
    new_tomb = ids
    if old_tomb is not None:
        new_tomb = new_tomb.unionByName(old_tomb.select("vec_id")).distinct()
    # localCheckpoint before the swap: new_tomb's lineage reads the
    # OLD sidecar, which the swap removes (same hazard retract_docs'
    # tombstone write had — ADVICE r13)
    new_tomb = new_tomb.localCheckpoint()
    n_total = new_tomb.count()
    _swap_write(new_tomb, tomb_path)
    return {"tombstoned": n_total}


def fold_ivf_retractions(spark: SparkSession, lists_path: str) -> dict:
    """Fold the IVF tombstone sidecar into the physical lists table
    and retire it — the compaction-time companion to
    `retract_ivf_vectors`, mirroring `fold_retractions`: one swap
    rewrite of the lists (the only O(index) write, amortized into the
    maintenance pass that rewrites them anyway), sidecar deleted
    LAST. A codes sibling (`<lists>_codes`,
    ann_store.ivf_codes_path's convention) is folded in the same
    pass — the takedown contract covers the taken-down vectors'
    DERIVED representations, not just their list membership
    (VERDICT r14). A crash between the steps leaves tombstones that
    match nothing — harmless, and the re-run retires them. No-op
    when no sidecar exists."""
    import os

    heal_swap(lists_path)
    tomb_path = ivf_tombstones_path(lists_path)
    tomb = _read_sidecar(spark, tomb_path)
    if tomb is None:
        return {"folded": False}
    _swap_write(live_ivf_lists(spark, lists_path), lists_path)
    codes_p = lists_path.rstrip("/") + "_codes"
    heal_swap(codes_p)
    if os.path.isdir(codes_p):
        _swap_write(
            spark.read.parquet(codes_p).join(
                tomb.select("vec_id"), "vec_id", "left_anti"
            ),
            codes_p,
        )
    retire_sidecar(tomb_path)
    return {"folded": True}


# ------------------------------ retraction invariance proof ops
#
# The oracle shape VERDICT r12 #3 prescribed: retract-then-admit must
# hash-match never-admitted — the same one-shot union SQL the
# admission ops use, over the SURVIVING corpus, restricted to pairs
# the post-retraction batch can emit. Lifecycle: build base store →
# admit the %10==5 slice → retract the doc_id % 7 == 4 slice of the
# admitted corpus (it hits base and first-batch docs, group reps and
# whole groups alike — and at sf0.01 it removes evidence on BOTH
# families, so a ghost row would hash-mismatch, not hide in an empty
# result) → admit the %10==0 slice → expand only that final batch's
# evidence through LIVE membership.

_RETRACT_MOD = 7
_RETRACT_REM = 4

# The VECTOR retraction proof runs its verify at a LOWER cosine bar
# than the admission ops: at the production _COSINE_THRESHOLD the
# sf0.01 embeddings corpus has only 4 hyperplane-verified pairs in
# total, so the driver row pinned a 1-row surface — too thin a hash
# to carry the ghost-row proof (VERDICT r13 #6). At 0.32 the same
# lifecycle pins 10 final-batch rows of which the retraction removes
# 3 (measured via the oracle sweep, r14); the op and its SQL use the
# identical bar everywhere, so retract-then-admit ≡ never-admitted
# is unchanged as an equivalence — just over a wider evidence set.
_RETRACT_COSINE_THRESHOLD = 0.32


def _retract_pred(col):
    return (F.pmod(col, F.lit(_RETRACT_MOD)) == _RETRACT_REM) & (
        ~_slice(col, _BATCH1_REM)
    )


def _retract_sql_pred(expr: str) -> str:
    pm7 = f"((({expr} % {_RETRACT_MOD}) + {_RETRACT_MOD}) % {_RETRACT_MOD})"
    return f"({pm7} = {_RETRACT_REM} AND {_pmod_sql(expr)} <> {_BATCH1_REM})"


def dedup_store_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction invariance, text family: after base + batch-1
    admission, a mid-lifecycle `retract_docs`, AND a
    partition-granular `fold_retractions` (round 16 — the tables are
    key-bucketed, so the driver row pins the granular fold
    end-to-end), batch 2's admission evidence (expanded through live
    membership) must be EXACTLY what a never-admitted one-shot
    scoring of batch 2 against the surviving corpus yields —
    takedowns leave no ghost evidence, re-elected groups keep
    verifying (the verify features come from the new rep's doc id,
    alive by construction), and folding is invisible to the
    oracle because it materializes exactly the live views."""
    from ..functions.text import shingles_expr
    from ..sources.tables import table
    from .sinkcheck import scratch_dir

    root = scratch_dir("rep_store_retract")
    sig_path = root + "/signatures"
    band_path = root + "/bands"
    mem_path = root + "/members"
    evidence = root + "/evidence"

    g_all = rep_group_frame(table(spark, sf_dir, "documents")).cache()

    g_base = g_all.where(_base_pred(F.col("doc_id")))
    reps_base = rep_reps(g_base)
    bootstrap_rep_store(
        spark,
        rep_signature_frame(reps_base),
        g_base.select("doc_id", "gh")
        .join(reps_base.select("gh", "group_id"), "gh")
        .select("doc_id", "gh", "group_id"),
        sig_path,
        band_path,
        mem_path,
    )

    def feats_for(cand_ids: DataFrame) -> DataFrame:
        return g_all.join(cand_ids, "doc_id", "left_semi").select(
            "doc_id",
            F.array_distinct(F.expr(shingles_expr("t", 3))).alias("fs"),
        )

    def step(rem: int) -> None:
        rep_admission_step(
            spark,
            g_all.where(_slice(F.col("doc_id"), rem)),
            sig_path,
            band_path,
            mem_path,
            feats_for,
            lambda verified: verified.write.mode("append").parquet(evidence),
        )

    step(_BATCH2_REM)
    retract_docs(
        spark,
        sig_path,
        mem_path,
        g_all.where(_retract_pred(F.col("doc_id"))).select("doc_id"),
    )
    # fold the sidecars mid-lifecycle (round 16): the tables are
    # key-bucketed, so this drives the PARTITION-GRANULAR fold — and
    # because a fold preserves live views exactly, the oracle is
    # unchanged, making this driver row the end-to-end pin that
    # retract → granular fold → admit ≡ never-admitted
    fold_retractions(spark, sig_path, band_path, mem_path)
    import shutil

    shutil.rmtree(evidence)  # pre-retraction evidence is history, not output
    step(_BATCH1_REM)

    expand_group_evidence(
        spark,
        evidence,
        mem_path,
        sig_path=sig_path,
        store_pred=lambda c: ~_slice(c, _BATCH1_REM),
    ).write.mode("overwrite").parquet(root + "/result")
    g_all.unpersist()
    return spark.read.parquet(root + "/result").select("da", "db", "jaccard")


_STORE_RETRACTION_SQL = f"""
WITH corpus AS (
  SELECT * FROM documents WHERE NOT {_retract_sql_pred('doc_id')}
),
{shingles_cte_sql('corpus', 'text', 3)},
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
    AND NOT ({_pmod_sql('a.doc_id')} <> {_BATCH1_REM}
         AND {_pmod_sql('b.doc_id')} <> {_BATCH1_REM})
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


def embedding_store_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction invariance, vector family: the same lifecycle over
    the hyperplane rep store (retraction itself is family-agnostic —
    it never reads a signature column), with the vector op's
    self-cosine expansion over LIVE membership."""
    from .sinkcheck import scratch_dir

    root = scratch_dir("hyperplane_store_retract")
    sig_path = root + "/signatures"
    band_path = root + "/bands"
    mem_path = root + "/members"
    evidence = root + "/evidence"

    g_all = emb_rep_group_frame(_quantized(spark, sf_dir)).cache()

    g_base = g_all.where(_base_pred(F.col("doc_id")))
    reps_base = emb_rep_reps(g_base)
    bootstrap_rep_store(
        spark,
        emb_rep_signature_frame(spark, reps_base),
        g_base.select("doc_id", "gh")
        .join(reps_base.select("gh", "group_id"), "gh")
        .select("doc_id", "gh", "group_id"),
        sig_path,
        band_path,
        mem_path,
        key_cols=_EMB_KEY_COLS,
    )

    def feats_for(cand_ids: DataFrame) -> DataFrame:
        return g_all.join(cand_ids, "doc_id", "left_semi").select(
            F.col("doc_id").alias("vec_id"), "q", "nq"
        )

    def verify(cand: DataFrame, feats: DataFrame) -> DataFrame:
        v = cosine_on_candidates_nullsafe(
            cand.select(F.col("da").alias("va"), F.col("db").alias("vb")),
            feats,
            _RETRACT_COSINE_THRESHOLD,
        )
        return v.select(
            F.col("va").alias("da"), F.col("vb").alias("db"), "cosine"
        )

    def step(rem: int) -> None:
        rep_admission_step(
            spark,
            g_all.where(_slice(F.col("doc_id"), rem)),
            sig_path,
            band_path,
            mem_path,
            feats_for,
            lambda verified: verified.write.mode("append").parquet(evidence),
            key_cols=_EMB_KEY_COLS,
            rep_builder=lambda g: emb_rep_signature_frame(spark, emb_rep_reps(g)),
            verify=verify,
        )

    step(_BATCH2_REM)
    retract_docs(
        spark,
        sig_path,
        mem_path,
        g_all.where(_retract_pred(F.col("doc_id"))).select("doc_id"),
    )
    # granular-fold mid-lifecycle — see dedup_store_retraction; the
    # vector family pins the same fold ≡ no-fold equivalence through
    # its own oracle hash
    fold_retractions(spark, sig_path, band_path, mem_path)
    import shutil

    shutil.rmtree(evidence)  # pre-retraction evidence is history, not output
    step(_BATCH1_REM)

    live_m = live_members(spark, mem_path, sig_path)
    multi = (
        live_m.groupBy("group_id")
        .count()
        .where(F.col("count") > 1)
        .select(F.col("group_id").alias("doc_id"))
    )
    reps_q = g_all.join(multi, "doc_id", "left_semi")
    self_vals = emb_self_cosines(
        reps_q.select(F.col("doc_id").alias("group_id")),
        reps_q.select(F.col("doc_id").alias("vec_id"), "q", "nq"),
    )
    expand_group_evidence(
        spark,
        evidence,
        mem_path,
        value_col="cosine",
        self_values=self_vals,
        sig_path=sig_path,
        store_pred=lambda c: ~_slice(c, _BATCH1_REM),
    ).write.mode("overwrite").parquet(root + "/result")
    g_all.unpersist()
    return spark.read.parquet(root + "/result").select(
        F.col("da").alias("va"), F.col("db").alias("vb"), "cosine"
    )


_EMB_STORE_RETRACTION_SQL = f"""
WITH corpus AS (
  SELECT * FROM embeddings WHERE NOT {_retract_sql_pred('vec_id')}
),
{_QUANT_CTE.replace("FROM embeddings", "FROM corpus")},
planes(p, i, w) AS (VALUES {_neardup_planes_values_sql()}),
{_hyperplane_bands_cte()},
cand AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id
  WHERE {_HYPERPLANE_GATE_SQL}
    AND NOT ({_pmod_sql('a.vec_id')} <> {_BATCH1_REM}
         AND {_pmod_sql('b.vec_id')} <> {_BATCH1_REM})
)
SELECT va, vb,
       {_NEARDUP_COS_SQL_BODY} AS cosine
FROM cand
JOIN qn a ON a.vec_id = va
JOIN qn b ON b.vec_id = vb
WHERE {_NEARDUP_COS_SQL_BODY} >= {_RETRACT_COSINE_THRESHOLD}
"""


QUERIES = {
    "dedup_store_admission": dedup_store_admission,
    "dedup_store_rep_admission": dedup_store_rep_admission,
    "embedding_store_admission": embedding_store_admission,
    "embedding_store_rep_admission": embedding_store_rep_admission,
    "dedup_store_retraction": dedup_store_retraction,
    "embedding_store_retraction": embedding_store_retraction,
}

ORACLE = {
    "dedup_store_admission": _STORE_ADMISSION_SQL,
    # the UNCHANGED one-shot union spelling: the rep-store lifecycle
    # must reproduce the uncapped op's output exactly (expansion
    # through membership), proving the pre-pass semantics-preserving.
    "dedup_store_rep_admission": _STORE_ADMISSION_SQL,
    "embedding_store_admission": _EMB_STORE_ADMISSION_SQL,
    # same trick on the vector side: the rep lifecycle vs the
    # uncapped op's own one-shot SQL, unchanged.
    "embedding_store_rep_admission": _EMB_STORE_ADMISSION_SQL,
    # retract-then-admit ≡ never-admitted: the one-shot spelling over
    # the SURVIVING corpus, restricted to batch-2-involving pairs.
    "dedup_store_retraction": _STORE_RETRACTION_SQL,
    "embedding_store_retraction": _EMB_STORE_RETRACTION_SQL,
}
