"""Signature-store lifecycle tests (operators/dedup_store.py).

The driver oracle proves sequential-two-batch ≡ one-shot-union on
the real corpus; these tests pin the lifecycle MECHANICS the oracle
can't see — that batch 2's matches really come from signatures
batch 1 APPENDED to the on-disk store, that store×store pairs are
never emitted, and that the store ends holding every doc seen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdblog2clickhouse_spark.operators import dedup_store
from tests.oracle import compare


def test_store_admission_matches_oracle(spark, sf_oracle):
    df = dedup_store.dedup_store_admission(spark, sf_oracle)
    compare(df, dedup_store._STORE_ADMISSION_SQL, sf_oracle)


_DOCS = [
    # base (doc_id % 10 not in {0, 5})
    (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (2, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (3, "kilo lima mike november oscar papa quebec romeo sierra tango"),
    # batch 1 (doc_id % 10 == 0)
    (40, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (50, "uniform victor whiskey xray yankee zulu gamma beta epsilon theta"),
    # batch 2 (doc_id % 10 == 5): 45 duplicates a BATCH-1 doc only —
    # its pair can exist only if batch 2 read batch 1's appended
    # signatures from the store.
    (45, "uniform victor whiskey xray yankee zulu gamma beta epsilon theta"),
    (25, "solo document with no duplicate partner anywhere in corpus"),
]


@pytest.fixture()
def tiny_sf(spark, tmp_path):
    d = spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in _DOCS],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    d.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_lifecycle_mechanics(spark, tiny_sf):
    out = dedup_store.dedup_store_admission(spark, tiny_sf)
    pairs = {(r["da"], r["db"]) for r in out.collect()}
    # batch1 doc 40 vs both base copies; batch2 doc 45 vs batch1 doc
    # 50 — the store-append evidence.
    assert (45, 50) in pairs, "batch 2 did not see batch 1's appended signatures"
    assert (1, 40) in pairs and (2, 40) in pairs
    # base×base dup (1, 2) must NOT be admission evidence
    assert (1, 2) not in pairs
    # nothing matches the solo docs
    assert not any(25 in p or 3 in p for p in pairs)
    # canonical ordering
    assert all(da < db for da, db in pairs)


def test_store_holds_every_doc_seen(spark, tiny_sf):
    dedup_store.dedup_store_admission(spark, tiny_sf)
    import os
    import tempfile

    store = spark.read.parquet(
        os.path.join(
            tempfile.gettempdir(),
            f"sinkcheck_minhash_store_{os.getpid()}",
            "signatures",
        )
    )
    assert sorted(r["doc_id"] for r in store.select("doc_id").collect()) == [
        1, 2, 3, 25, 40, 45, 50,
    ]
    # the persisted schema is the doc_minhash_signatures schema
    assert store.columns == (
        ["doc_id"] + [f"s{i}" for i in range(16)] + [f"bk{b}" for b in range(4)]
    )


def test_rerun_overwrites_scratch(spark, tiny_sf):
    """Two runs must not double-append (the scratch wipe): identical
    results both times."""
    a = sorted(map(tuple, dedup_store.dedup_store_admission(spark, tiny_sf).collect()))
    b = sorted(map(tuple, dedup_store.dedup_store_admission(spark, tiny_sf).collect()))
    assert a == b


def test_embedding_store_admission_matches_oracle(spark, sf_oracle):
    df = dedup_store.embedding_store_admission(spark, sf_oracle)
    compare(df, dedup_store._EMB_STORE_ADMISSION_SQL, sf_oracle)


def test_embedding_store_rerun_and_store_contents(spark, sf_oracle):
    """Rerun idempotence (scratch wipe) + the persisted vector store
    ends holding every vector's sign-band signature row."""
    import os
    import tempfile

    a = sorted(
        map(tuple, dedup_store.embedding_store_admission(spark, sf_oracle).collect())
    )
    b = sorted(
        map(tuple, dedup_store.embedding_store_admission(spark, sf_oracle).collect())
    )
    assert a == b
    store = spark.read.parquet(
        os.path.join(
            tempfile.gettempdir(),
            f"sinkcheck_hyperplane_store_{os.getpid()}",
            "signatures",
        )
    )
    from fdblog2clickhouse_spark.sources.tables import table

    assert store.count() == table(spark, sf_oracle, "embeddings").count()
    assert store.columns == ["vec_id"] + [f"bv{b}" for b in range(6)]


def test_streaming_store_admission_equals_batch_lifecycle(spark, sf_oracle):
    """Slicing-invariance made real: the 4-micro-batch streaming
    admission (store growing under the stream) must produce exactly
    the evidence the two-batch lifecycle op produces — and both
    must match the one-shot union oracle."""
    from fdblog2clickhouse_spark.streaming.queries import streaming_store_admission

    streamed = sorted(
        map(tuple, streaming_store_admission(spark, sf_oracle).collect())
    )
    batch = sorted(
        map(tuple, dedup_store.dedup_store_admission(spark, sf_oracle).collect())
    )
    assert streamed == batch
    # cross-slice evidence on the crafted corpus: 45 (arrives in a
    # later or same rotation) duplicates 50 — present regardless of
    # how the file stream sliced the arrivals.


def test_streaming_store_admission_tiny_pairs(spark, tiny_sf):
    from fdblog2clickhouse_spark.streaming.queries import streaming_store_admission

    pairs = {
        (r["da"], r["db"]) for r in streaming_store_admission(spark, tiny_sf).collect()
    }
    assert (45, 50) in pairs and (1, 40) in pairs and (2, 40) in pairs
    assert (1, 2) not in pairs


def test_store_compaction_preserves_admission(spark, sf_oracle):
    """OPTIMIZE FINAL on the signature store: after the streaming
    admission loop leaves one file group per micro-batch, compaction
    must shrink the file count without changing a single store row —
    so a batch scored against the compacted store produces identical
    evidence."""
    import glob
    import os
    import tempfile

    from pyspark.sql import functions as F
    from fdblog2clickhouse_spark.streaming.queries import streaming_store_admission

    streaming_store_admission(spark, sf_oracle).collect()
    # the streaming op's deterministic per-run store path (scratch_dir)
    store_path = os.path.join(
        tempfile.gettempdir(),
        f"sinkcheck_store_admission_stream_{os.getpid()}",
        "signatures",
    )
    before_rows = sorted(map(tuple, spark.read.parquet(store_path).collect()))
    n_before = len(glob.glob(os.path.join(store_path, "*.parquet")))
    assert n_before > 1, "expected one file group per micro-batch append"

    compacted = dedup_store.compact_signature_store(spark, store_path)
    assert compacted == n_before
    n_after = len(glob.glob(os.path.join(store_path, "*.parquet")))
    assert n_after == 1
    after_rows = sorted(map(tuple, spark.read.parquet(store_path).collect()))
    assert after_rows == before_rows


def test_compaction_crash_recovery(spark, tmp_path):
    """ADVICE r9: at every instant of the compaction swap either the
    store path or the .old copy holds the complete store. Simulate
    the crash window (store renamed aside, new copy not yet in
    place): the next compact call must restore the .old copy."""
    import os
    import shutil

    p = str(tmp_path / "store")
    spark.range(10).selectExpr("id AS doc_id", "id AS bk0").repartition(
        4
    ).write.parquet(p)
    rows = sorted(r["doc_id"] for r in spark.read.parquet(p).collect())
    # simulate: crash after `os.rename(path, old)` — path missing
    os.rename(p, p + ".old")
    assert not os.path.exists(p)
    dedup_store.compact_signature_store(spark, p, sort_col="bk0")
    assert sorted(r["doc_id"] for r in spark.read.parquet(p).collect()) == rows
    assert not os.path.exists(p + ".old")
    # and a stale staging dir from an earlier crash is inert
    shutil.copytree(p, p + ".compact")
    dedup_store.compact_signature_store(spark, p, sort_col="bk0")
    assert sorted(r["doc_id"] for r in spark.read.parquet(p).collect()) == rows


def test_admission_mega_bucket_contract(spark, tmp_path):
    """The admission kernel is deliberately UNCAPPED (the cap's
    population would be mode-dependent and break the sequential ≡
    one-shot proof — dedup_store.py module docstring). This pins the
    honest consequence: a degenerate bucket of B identical docs
    split across store and batches yields exactly the all-qualifying-
    pairs output (minus store-internal pairs), i.e. quadratic BY
    CONTRACT, matching the oracle — and the op still completes fine
    at bucket sizes well past the bulk ops' cap."""
    import numpy as np
    import pandas as pd

    text = "mega bucket boilerplate sentence repeated verbatim in every copy"
    n = 90  # > _LSH_BUCKET_CAP (64) — the bulk ops would drop this bucket
    ids = list(range(1, n + 1))  # mods spread over base/batch1/batch2
    pd.DataFrame(
        {
            "doc_id": np.array(ids, dtype=np.int64),
            "text": [text] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": np.array([len(text)] * n, dtype=np.int64),
        }
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)

    pairs = {
        (r["da"], r["db"])
        for r in dedup_store.dedup_store_admission(spark, str(tmp_path)).collect()
    }
    base = [i for i in ids if i % 10 not in (0, 5)]
    batch = [i for i in ids if i % 10 in (0, 5)]
    expect = {
        (min(a, b), max(a, b))
        for a in ids
        for b in ids
        if a < b and not (a in base and b in base)
    }
    assert pairs == expect
    # sanity on the magnitude: all-pairs minus base-internal
    n_base = len(base)
    assert len(pairs) == n * (n - 1) // 2 - n_base * (n_base - 1) // 2
    assert len(batch) == n - n_base
