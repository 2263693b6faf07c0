"""Persisted IVF index lifecycle tests (operators/ann_store.py)."""

from __future__ import annotations

from fdblog2clickhouse_spark.operators import ann_store, similarity
from tests.oracle import compare


def test_store_search_matches_oracle(spark, sf_oracle):
    compare(
        ann_store.ann_ivf_store_search(spark, sf_oracle),
        ann_store.ORACLE["ann_ivf_store_search"],
        sf_oracle,
    )


def test_store_search_equals_in_memory_ivf(spark, sf_oracle):
    """The disk-roundtripped, incrementally-inserted index must
    produce byte-identical search results to the one-shot in-memory
    plan (`ann_ivf_topk`) — the insert ≡ rebuild equivalence at the
    DataFrame level, independent of the DuckDB oracle."""
    via_store = sorted(
        map(tuple, ann_store.ann_ivf_store_search(spark, sf_oracle).collect())
    )
    in_memory = sorted(
        map(tuple, similarity.ann_ivf_topk(spark, sf_oracle).collect())
    )
    assert via_store == in_memory


def test_lists_table_covers_every_vector(spark, sf_oracle):
    """After build + insert the lists table holds exactly one
    assignment row per corpus vector."""
    import os

    from fdblog2clickhouse_spark.operators.sinkcheck import scratch_path

    ann_store.ann_ivf_store_search(spark, sf_oracle)
    from fdblog2clickhouse_spark.sources.tables import table

    lists = spark.read.parquet(os.path.join(scratch_path("ivf_store"), "lists"))
    n = table(spark, sf_oracle, "embeddings").count()
    assert lists.count() == n
    assert lists.select("n_id").distinct().count() == n


def test_ivf_lists_compaction_preserves_search(spark, sf_oracle):
    """`compact_ivf_lists` is OPTIMIZE FINAL for the inverted lists:
    after build + incremental insert leave multiple file groups,
    compaction must shrink the table to one list_id-sorted file
    without changing a single assignment row — so re-running the
    query-node search plan against the compacted table returns
    byte-identical results. This is the invariance pin
    `ivf_store_search_plan`'s docstring promises."""
    import glob
    import os

    from fdblog2clickhouse_spark.operators.dedup import _quantized
    from fdblog2clickhouse_spark.operators.sinkcheck import scratch_path

    before = sorted(
        map(tuple, ann_store.ann_ivf_store_search(spark, sf_oracle).collect())
    )
    root = scratch_path("ivf_store")
    lists_path = os.path.join(root, "lists")
    n_before = len(glob.glob(os.path.join(lists_path, "*.parquet")))
    assert n_before > 1, "expected one file group per insert batch"
    rows_before = sorted(map(tuple, spark.read.parquet(lists_path).collect()))

    assert ann_store.compact_ivf_lists(spark, lists_path) == n_before
    assert len(glob.glob(os.path.join(lists_path, "*.parquet"))) == 1
    assert sorted(map(tuple, spark.read.parquet(lists_path).collect())) == rows_before

    after = sorted(
        map(
            tuple,
            ann_store.ivf_store_search_plan(
                spark,
                _quantized(spark, sf_oracle),
                os.path.join(root, "codebook"),
                lists_path,
            ).collect(),
        )
    )
    assert after == before


def test_ivfpq_matches_oracle_and_restricts_to_probed_lists(spark, sf_oracle):
    """Composition correctness: every IVF-PQ result's list_id is one
    of its query's probed lists (the pruning actually happened), and
    the full result hash-matches the composed oracle."""
    from pyspark.sql import functions as F
    from fdblog2clickhouse_spark.operators.dedup import _quantized
    from fdblog2clickhouse_spark.operators.similarity import _CENTROID_IDS, _N_PROBE, _N_QUERIES

    df = ann_store.ann_ivfpq_topk(spark, sf_oracle)
    compare(df, ann_store.ORACLE["ann_ivfpq_topk"], sf_oracle)

    qn = _quantized(spark, sf_oracle)
    cent = qn.where(F.col("vec_id").isin(_CENTROID_IDS)).select(
        F.col("vec_id").alias("c_id"), "q", "nq"
    )
    probes = {
        (r["v_id"], r["c_id"])
        for r in ann_store._assign(
            qn.where(F.col("vec_id") < _N_QUERIES), cent, _N_PROBE
        ).collect()
    }
    for r in df.collect():
        assert (r["q_id"], r["list_id"]) in probes


def test_ivfpq_plan_broadcasts_and_no_cartesian(spark, sf_smoke):
    """Asserted on the LAZY plan (_ivfpq_plan): the public operator
    materializes its result to scratch so it can release the corpus
    cache (ADVICE r9), which leaves only a parquet scan in the
    returned frame's plan."""
    from fdblog2clickhouse_spark.operators.dedup import _quantized
    from fdblog2clickhouse_spark.plans import formatted_plan

    plan = formatted_plan(
        ann_store._ivfpq_plan(spark, _quantized(spark, sf_smoke))
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
