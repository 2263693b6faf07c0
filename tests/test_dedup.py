"""Oracle-parity + semantics tests for dedup operators (SURVEY §2.3)."""

from __future__ import annotations

import pytest

from fdblog2clickhouse_spark.operators import dedup

from .oracle import compare


@pytest.mark.parametrize("name", sorted(dedup.QUERIES))
def test_dedup_oracle_parity(spark, sf_oracle, name):
    df = dedup.QUERIES[name](spark, sf_oracle)
    compare(df, dedup.ORACLE[name], sf_oracle)


def test_minhash_finds_planted_neardups(spark, sf_oracle):
    rows = dedup.dedup_minhash_lsh(spark, sf_oracle).collect()
    assert len(rows) > 0, "testdata has planted near-dups; LSH must find them"
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in rows)


def test_simhash_agrees_with_minhash(spark, sf_oracle):
    mh = {(r["da"], r["db"]) for r in dedup.dedup_minhash_lsh(spark, sf_oracle).collect()}
    sh = {(r["da"], r["db"]) for r in dedup.dedup_simhash(spark, sf_oracle).collect()}
    # the highly-similar planted pairs should be found by both methods
    assert mh & sh, f"no overlap between minhash ({len(mh)}) and simhash ({len(sh)}) pairs"


def test_minhash_capped_buckets_match_oracle(spark, sf_oracle):
    """Force the LSH bucket cap low enough to actually drop buckets
    (max bucket at sf0.001 is 4) and assert Spark still matches the
    oracle — proving the first-shared-band gate and the cap interact
    identically in both engines (a pair whose first shared band is
    dropped stays dropped)."""
    old = dedup._LSH_BUCKET_CAP
    sql = dedup.ORACLE["dedup_minhash_lsh"].replace(
        f"bsz <= {old}", "bsz <= 2"
    )
    assert sql != dedup.ORACLE["dedup_minhash_lsh"], "cap constant not found"
    dedup._LSH_BUCKET_CAP = 2
    try:
        df = dedup.dedup_minhash_lsh(spark, sf_oracle)
        compare(df, sql, sf_oracle)
    finally:
        dedup._LSH_BUCKET_CAP = old


def test_cluster_labels_distributed_path_matches_oracle(spark, sf_oracle):
    """Force the contraction-CC loop (gate=0 disables both the
    pairs-count short-circuit and the driver union-find tail) and
    assert values are UNCHANGED vs the recursive-CTE oracle — the
    distributed path is what runs at 100 TB, so it must stay proven
    at test scale even though small corpora short-circuit."""
    old = dedup._DRIVER_CC_EDGES
    dedup._DRIVER_CC_EDGES = 0
    try:
        df = dedup.dedup_cluster_labels(spark, sf_oracle)
        compare(df, dedup.ORACLE["dedup_cluster_labels"], sf_oracle)
    finally:
        dedup._DRIVER_CC_EDGES = old


def test_cluster_labels_tail_cutover_matches_oracle(spark, sf_oracle):
    """Middle configuration: distributed initial labeling +
    contraction, then the union-find TAIL fires on the first
    contracted class graph (gate=1 forces past the pairs
    short-circuit; the class graph at sf0.001 is tiny but ≥ 1, so
    set the gate just under the pair count instead)."""
    pairs_n = dedup._simhash_candidates(spark, sf_oracle).count()
    old = dedup._DRIVER_CC_EDGES
    # below the raw pair count (skip the short-circuit) but far above
    # the contracted class-edge count (tail fires round 0)
    dedup._DRIVER_CC_EDGES = max(1, pairs_n - 1)
    try:
        df = dedup.dedup_cluster_labels(spark, sf_oracle)
        compare(df, dedup.ORACLE["dedup_cluster_labels"], sf_oracle)
    finally:
        dedup._DRIVER_CC_EDGES = old


def test_cluster_labels_reliable_checkpoint_mode(spark, sf_oracle, tmp_path):
    """SPARK_GRAFT_CHECKPOINT=reliable swaps localCheckpoint for
    reliable checkpoint() (dynamic-allocation clusters — see
    SCALE.md). Force the distributed loop so every _ckpt site runs in
    reliable mode, and assert oracle-identical results."""
    import os as _os

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    old_env = _os.environ.get("SPARK_GRAFT_CHECKPOINT")
    old_gate = dedup._DRIVER_CC_EDGES
    _os.environ["SPARK_GRAFT_CHECKPOINT"] = "reliable"
    dedup._DRIVER_CC_EDGES = 0
    try:
        df = dedup.dedup_cluster_labels(spark, sf_oracle)
        compare(df, dedup.ORACLE["dedup_cluster_labels"], sf_oracle)
    finally:
        if old_env is None:
            del _os.environ["SPARK_GRAFT_CHECKPOINT"]
        else:
            _os.environ["SPARK_GRAFT_CHECKPOINT"] = old_env
        dedup._DRIVER_CC_EDGES = old_gate


def test_checkpoint_mode_rejects_typos(monkeypatch):
    """Any value outside {'local','reliable'} must raise — a typo
    ('Reliable') silently falling back to localCheckpoint is the
    exact failure the knob exists to avoid."""
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT", "Reliable")
    with pytest.raises(ValueError, match="SPARK_GRAFT_CHECKPOINT"):
        dedup._checkpoint_mode()
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT", "reliable")
    assert dedup._checkpoint_mode() == "reliable"
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT")
    assert dedup._checkpoint_mode() == "local"


def test_keep_best_one_per_cluster(spark, sf_oracle):
    """Exactly one kept doc per cluster, and it is the best-quality
    member (doc_id breaks ties)."""
    from fdblog2clickhouse_spark.operators.dedup import neardup_keep_best

    rows = neardup_keep_best(spark, sf_oracle).collect()
    assert rows
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cluster, members in by_cluster.items():
        kept = [r for r in members if r["keep"] == 1]
        assert len(kept) == 1, (cluster, members)
        best = max(members, key=lambda r: (r["quality_score"], -r["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"]


def test_incremental_minhash_consistent_with_full_dedup(spark, sf_oracle):
    """The incremental op must agree with the full corpus op on the
    pairs both can see: dedup_incremental_minhash results == the
    dedup_minhash_lsh pairs with EXACTLY one side in the batch slice
    (same bands, same cap over the combined corpus, same first-band
    gate, same exact-Jaccard verify)."""
    full = {
        (min(r["da"], r["db"]), max(r["da"], r["db"]), round(r["jaccard"], 12))
        for r in dedup.dedup_minhash_lsh(spark, sf_oracle).collect()
        if (r["da"] % dedup._INCR_BATCH_MOD == 0)
        != (r["db"] % dedup._INCR_BATCH_MOD == 0)
    }
    incr = {
        (
            min(r["new_doc_id"], r["base_doc_id"]),
            max(r["new_doc_id"], r["base_doc_id"]),
            round(r["jaccard"], 12),
        )
        for r in dedup.dedup_incremental_minhash(spark, sf_oracle).collect()
    }
    assert incr == full
    assert all(
        r["new_doc_id"] % dedup._INCR_BATCH_MOD == 0
        and r["base_doc_id"] % dedup._INCR_BATCH_MOD != 0
        for r in dedup.dedup_incremental_minhash(spark, sf_oracle).collect()
    )


def test_minhash_sig_inrow_equals_exploded(spark, sf_oracle):
    """The in-row signature (array_min over transform) is value-
    identical to the exploded hash-aggregate form on the same
    feature arrays — the char-gram composed op relies on it."""
    from pyspark.sql import functions as F

    from fdblog2clickhouse_spark.functions.hashing import h32_spark_sql
    from fdblog2clickhouse_spark.functions.text import char_ngrams_expr, norm_text

    from fdblog2clickhouse_spark.sources.tables import table

    d = table(spark, sf_oracle, "documents")
    nt = d.select("doc_id", norm_text(F.col("text")).alias("nt")).where(
        F.length("nt") >= 5
    )
    grams = nt.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                f"transform({char_ngrams_expr('nt', 5)}, g -> {h32_spark_sql('g')})"
            )
        ).alias("fs"),
    )
    hv = grams.select("doc_id", F.explode("fs").alias("h"))
    a = dedup._minhash_sig(hv)
    b = dedup._minhash_sig_inrow(grams)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _zero_vec_sf_dir(spark, tmp_path) -> str:
    """A crafted sf_dir whose embeddings table contains a ZERO vector
    (vec_id 0 — also in the incremental 'new batch' slice and the ANN
    query slice) plus planted near-dup pairs, exercising the x/0
    cosine path (VERDICT r12 'What's wrong' #1: Spark ANSI raised
    where the DuckDB oracle yields NULL)."""
    rows = []
    dim = 64
    rows.append((0, [0.0] * dim, 0))  # the zero vector
    for i in range(1, 30):
        base = [float((i * 7 + j) % 13) / 13.0 for j in range(dim)]
        rows.append((i, base, i % 3))
    # planted near-dups of vec 1 (ids 30/31: one in the incremental
    # batch slice via id 30 % 10 == 0, one in base)
    v1 = rows[1][1]
    rows.append((30, [x * 1.001 for x in v1], 1))
    rows.append((31, [x * 0.999 for x in v1], 1))
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf = str(tmp_path / "sfzero")
    spark.createDataFrame(pdf).selectExpr(
        "CAST(vec_id AS BIGINT) vec_id",
        "CAST(embedding AS ARRAY<FLOAT>) embedding",
        "CAST(label AS INT) label",
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")
    return sf


def test_zero_vector_cosine_does_not_crash(spark, tmp_path):
    """Regression: a zero embedding (empty doc / padding row) must be
    threshold-excluded like the oracle's NULL, not raise
    DIVIDE_BY_ZERO under Spark 4 ANSI (VERDICT r12 item #1)."""
    sf = _zero_vec_sf_dir(spark, tmp_path)

    out = dedup.embedding_neardup(spark, sf).collect()
    ids = {r["va"] for r in out} | {r["vb"] for r in out}
    assert 0 not in ids  # zero vector pairs excluded, not crashed
    assert any({r["va"], r["vb"]} == {1, 31} for r in out)  # planted pair found

    out = dedup.embedding_neardup_lsh_verified(spark, sf).collect()
    ids = {r["va"] for r in out} | {r["vb"] for r in out}
    assert 0 not in ids

    out = dedup.embedding_incremental_neardup(spark, sf).collect()
    ids = {r["new_vec_id"] for r in out} | {r["base_vec_id"] for r in out}
    assert 0 not in ids  # vec 0 IS in the new-batch slice (0 % 10 == 0)


def test_zero_vector_similarity_topk_matches_null_order(spark, tmp_path):
    """similarity._cosine_cols consumers: a zero QUERY vector emits
    NULL cosines that sort last (Spark desc ≡ DuckDB DESC NULLS
    LAST), so top-k stays deterministic instead of crashing."""
    from fdblog2clickhouse_spark.operators import similarity

    sf = _zero_vec_sf_dir(spark, tmp_path)
    out = similarity.ann_topk_bruteforce(spark, sf).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    # query 0 is the zero vector: all its cosines NULL, ranked by n_id
    z = sorted(by_q[0], key=lambda r: r["rank"])
    assert all(r["cosine"] is None for r in z)
    assert [r["n_id"] for r in z] == sorted(r["n_id"] for r in z)
    # a nonzero query still gets real cosines
    assert all(r["cosine"] is not None for r in by_q[1])
