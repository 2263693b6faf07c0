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
    _STORE_ADMISSION_SQL,
    _base_pred,
    expand_group_evidence,
    rep_admission_step,
    rep_group_frame,
    rep_reps,
    rep_signature_frame,
    write_banded_index,
)
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

    def feats_for(cand_ids: DataFrame) -> DataFrame:
        return g_all.join(cand_ids, "doc_id", "left_semi").select(
            "doc_id",
            F.array_distinct(F.expr(shingles_expr("t", 3))).alias("fs"),
        )

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        # the SHARED step (operators/dedup_store.py) — including the
        # members anti-join that makes a RETRIED micro-batch
        # idempotent under foreachBatch's at-least-once contract
        # (skip_when_no_new_docs: a fully-committed batch replayed
        # after a checkpoint-less restart is a no-op).
        rep_admission_step(
            batch_df.sparkSession,
            rep_group_frame(batch_df),
            sig_path,
            band_path,
            mem_path,
            feats_for,
            lambda verified: verified.write.mode("append").parquet(evidence),
            skip_when_no_new_docs=True,
        )

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
