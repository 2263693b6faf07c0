"""STREAMING representative-store admission (SURVEY §2.7).

`streaming_store_admission` (queries.py) proves the ONLINE lifecycle
for the deliberately-uncapped doc-level kernel; this module is its
PRODUCTION sibling: the same growing-store-under-foreachBatch loop,
but every micro-batch runs the round-11 representative design
(operators/dedup_store.py) end to end —

  exact-dedup pre-pass (token-identical docs collapse to one group),
  gh classification against the flat store, banded-index PRUNED
  store-side read, new-group + touched-group scoring, and the
  banded → flat → members append order

— so the store grows O(distinct contents) under the stream and a
boilerplate-heavy rotation costs one group row, exactly like the
batch CLI path (`admit`). The returned frame is the group evidence
expanded through membership, and the oracle is the batch ops'
one-shot union SQL unchanged: the hash match proves that micro-batch
slicing, the rep collapse, and the pruned reads are all
semantics-preserving at once.

Why slicing-invariance still holds with the rep pre-pass: a group's
FIRST arrival scores it against everything in the store at that
moment; every later arrival of the same content rescores the touched
group (pairs re-emitted deterministically, collapsed by the
expansion's DISTINCT). The union over any slicing is therefore the
same group-pair set the one-shot run produces — the dedup_store.py
block comment's argument, unchanged, because it never depended on
batch granularity.

Reference parity: the reference's whole contract is
ingest-then-query (README.md:139-141); this is that contract applied
to the production dedup index under its real arrival mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup_store import (
    _JACCARD_THRESHOLD,
    _N_BANDS,
    _STORE_ADMISSION_SQL,
    _base_pred,
    candidates_from_rows,
    expand_group_evidence,
    pruned_store_rows,
    rep_admission_frames,
    rep_group_frame,
    rep_reps,
    rep_signature_frame,
    store_band_rows,
    write_banded_index,
)
from ..operators.dedup import jaccard_on_candidates
from ..sources.tables import table


def streaming_rep_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four JSON rotations → four micro-batches
    (maxFilesPerTrigger=1), each admitting against the persisted rep
    store (flat + banded index + members) and growing all three —
    then the membership expansion, identical to
    `dedup_store_rep_admission`'s. Output: (da, db, jaccard),
    hash-equal to the one-shot union oracle."""
    from ..operators.sinkcheck import scratch_dir

    root = scratch_dir("rep_admission_stream")
    base_dir = root + "/rotations"
    sig_path = root + "/signatures"
    band_path = root + "/bands"
    mem_path = root + "/members"
    evidence = root + "/evidence"

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    d.where(~_base_pred(F.col("doc_id"))).coalesce(4).write.mode(
        "overwrite"
    ).json(base_dir)

    # corpus group frame, cached: the store bootstrap, every
    # micro-batch's verify features, and the expansion all draw on it
    # (a production verifier recomputes features for candidate reps —
    # the store persists signatures only).
    g_all = rep_group_frame(d).cache()

    g_base = g_all.where(_base_pred(F.col("doc_id")))
    reps_base = rep_reps(g_base)
    rep_signature_frame(reps_base).write.mode("overwrite").parquet(sig_path)
    write_banded_index(spark.read.parquet(sig_path), band_path, "overwrite")
    g_base.select("doc_id", "gh").join(
        reps_base.select("gh", "group_id"), "gh"
    ).select("doc_id", "gh", "group_id").write.mode("overwrite").parquet(
        mem_path
    )

    from ..functions.text import shingles_expr

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        g_batch = rep_group_frame(batch_df)
        store_sigs = s.read.parquet(sig_path)
        group_map, new_sigs, batch_side = rep_admission_frames(
            store_sigs, g_batch
        )
        group_map, new_sigs = group_map.cache(), new_sigs.cache()
        store_rows = pruned_store_rows(s, band_path, batch_side).join(
            batch_side.select(F.col("group_id").alias("id")),
            "id",
            "left_anti",
        )
        cand = candidates_from_rows(
            store_rows,
            store_band_rows(batch_side, id_col="group_id"),
            _N_BANDS,
        ).cache()
        group_map.count()  # pre-append materialization (see batch op)
        cand_ids = (
            cand.select(F.col("da").alias("doc_id"))
            .unionByName(cand.select(F.col("db").alias("doc_id")))
            .distinct()
        )
        feats = g_all.join(cand_ids, "doc_id", "left_semi").select(
            "doc_id",
            F.array_distinct(F.expr(shingles_expr("t", 3))).alias("fs"),
        )
        jaccard_on_candidates(cand, feats, _JACCARD_THRESHOLD).write.mode(
            "append"
        ).parquet(evidence)
        write_banded_index(new_sigs, band_path, "append")
        new_sigs.write.mode("append").parquet(sig_path)
        g_batch.select("doc_id", "gh").join(group_map, "gh").select(
            "doc_id", "gh", "group_id"
        ).write.mode("append").parquet(mem_path)
        for c in (group_map, new_sigs, cand):
            c.unpersist()

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(base_dir)
    q = (
        stream.writeStream.foreachBatch(admit)
        .option("checkpointLocation", base_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    expand_group_evidence(spark, evidence, mem_path).write.mode(
        "overwrite"
    ).parquet(root + "/result")
    g_all.unpersist()
    return spark.read.parquet(root + "/result").select("da", "db", "jaccard")


QUERIES = {
    "streaming_rep_admission": streaming_rep_admission,
}

ORACLE = {
    # the batch lifecycle ops' one-shot union SQL, unchanged — one
    # hash match pins slicing-invariance, the rep collapse, and the
    # pruned reads together.
    "streaming_rep_admission": _STORE_ADMISSION_SQL,
}
