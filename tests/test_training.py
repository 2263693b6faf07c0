"""Oracle-parity + semantics tests for training-data assembly
operators (SURVEY.md §2.9 extension, operators/training.py)."""

from __future__ import annotations

import pytest

from fdblog2clickhouse_spark.operators import training

from .oracle import compare


@pytest.mark.parametrize("name", sorted(training.QUERIES))
def test_training_oracle_parity(spark, sf_oracle, name):
    df = training.QUERIES[name](spark, sf_oracle)
    compare(df, training.ORACLE[name], sf_oracle)


def test_packing_is_gapless(spark, sf_oracle):
    """Offsets tile the token stream exactly: sorted by doc_id, each
    doc starts where the previous ended, pack ids are monotone, and
    packs_spanned matches the offsets arithmetic."""
    rows = sorted(
        training.sequence_packing(spark, sf_oracle).collect(),
        key=lambda r: r["doc_id"],
    )
    assert rows
    expect = 0
    b = training._PACK_BUDGET
    prev_pack = 0
    for r in rows:
        assert r["start_off"] == expect
        expect += r["n_tok"]
        assert r["pack_id"] == r["start_off"] // b
        assert r["pack_id"] >= prev_pack
        prev_pack = r["pack_id"]
        last_tok = r["start_off"] + r["n_tok"] - 1
        assert r["packs_spanned"] == last_tok // b - r["pack_id"] + 1
        assert r["packs_spanned"] >= 1


def test_quantize_codes_in_range(spark, sf_oracle):
    """Quantized codes stay in int8 symmetric range and the
    reconstruction error is below one quantization step (scale/254
    would be half a step; use a loose ms bound instead since scales
    vary per dimension)."""
    rows = training.embedding_int8_quantize(spark, sf_oracle).collect()
    assert len(rows) == 500
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        assert r["max_err_milli"] >= 0


def test_skyline_is_pareto_frontier(spark, sf_oracle):
    """No selected doc is dominated by ANY doc (checked against the
    full per-doc stats recomputed via the oracle CTE)."""
    import duckdb

    sel = training.doc_skyline_select(spark, sf_oracle).collect()
    assert sel, "frontier is never empty on a non-empty corpus"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_oracle}/documents.parquet')"
    )
    all_stats = con.sql(
        """
        WITH st AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
                   '\\s+'), x -> x <> '') AS tk
          FROM documents
        )
        SELECT CAST(len(tk) AS INT) x, CAST(len(list_distinct(tk)) AS INT) y
        FROM st WHERE len(tk) >= 1
        """
    ).fetchall()
    con.close()
    for r in sel:
        x, y = r["n_tokens"], r["n_distinct"]
        for (ox, oy) in all_stats:
            dominated = ox >= x and oy >= y and (ox > x or oy > y)
            assert not dominated, (r, (ox, oy))


def test_quantize_zero_dimension_guard(spark, tmp_path):
    """A dimension that is 0.0 across the whole store (pruned/padded
    dims) must quantize to code 0 with zero error in BOTH engines —
    0/0 NaN semantics are engine-divergent without the guard."""
    import os

    from .oracle import compare
    from fdblog2clickhouse_spark.sources.tables import TABLE_NAMES

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    for name in TABLE_NAMES:
        if name != "embeddings":
            os.symlink(
                f"/root/testdata/sf0.001/{name}.parquet",
                f"{sf_dir}/{name}.parquet",
            )
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(6, dtype=np.int64),
            "embedding": [
                np.array([0.0, 0.5 + 0.25 * i, -1.0 * i, 0.0], dtype=np.float32)
                for i in range(6)
            ],
            "label": np.arange(6, dtype=np.int32) % 2,
        }
    )
    # single parquet FILE (like the driver's tables; Spark dirs don't
    # match the oracle harness's read_parquet path)
    pdf.to_parquet(f"{sf_dir}/embeddings.parquet", index=False)

    df = training.embedding_int8_quantize(spark, sf_dir)
    got = {r["vec_id"]: r for r in df.collect()}
    assert len(got) == 6
    # dims 0 and 3 have m=0 corpus-wide → both quantize to exactly 0;
    # vec_id 0 is zero in EVERY dim except dim 1 (0.5 → q=127·0.5/m)
    assert got[0]["max_err_milli"] >= 0 and got[0]["q_min"] == 0
    compare(df, training.ORACLE["embedding_int8_quantize"], sf_dir)


def test_packing_sparse_doc_ids(spark, tmp_path):
    """doc_id-range bucketing must tile correctly when ids are sparse
    and straddle bucket boundaries unevenly (the carry join's edge
    case: empty buckets between populated ones)."""
    import os

    import numpy as np
    import pandas as pd

    from .oracle import compare
    from fdblog2clickhouse_spark.sources.tables import TABLE_NAMES

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    for name in TABLE_NAMES:
        if name != "documents":
            os.symlink(
                f"/root/testdata/sf0.001/{name}.parquet",
                f"{sf_dir}/{name}.parquet",
            )
    ids = [0, 1, 63, 64, 129, 4096, 1_000_000, 1_000_001]
    pd.DataFrame(
        {
            "doc_id": np.array(ids, dtype=np.int64),
            "text": [("tok " * (7 * (k + 1))).strip() for k in range(len(ids))],
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": np.array([1] * len(ids), dtype=np.int64),
        }
    ).to_parquet(f"{sf_dir}/documents.parquet", index=False)

    rows = sorted(
        training.sequence_packing(spark, sf_dir).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["doc_id"] for r in rows] == ids
    expect = 0
    for r in rows:
        assert r["start_off"] == expect, (r, expect)
        expect += r["n_tok"]
    compare(
        training.sequence_packing(spark, sf_dir),
        training.ORACLE["sequence_packing"],
        sf_dir,
    )


def test_packing_independent_of_bucket_width(spark, sf_oracle, monkeypatch):
    """The hierarchical scan's output must not depend on
    _PACK_BUCKET: odd widths (3, 7) force multi-superbucket,
    boundary-straddling layouts where a wrong carry (level-2/level-3
    composition) would shift every downstream offset."""
    from fdblog2clickhouse_spark.operators import training

    baseline = sorted(
        map(tuple, training.sequence_packing(spark, sf_oracle).collect())
    )
    for width in (3, 7):
        monkeypatch.setattr(training, "_PACK_BUCKET", width)
        got = sorted(
            map(tuple, training.sequence_packing(spark, sf_oracle).collect())
        )
        assert got == baseline, f"width={width} changed results"


def test_pack_manifest_conservation(spark, sf_oracle):
    """Per doc, the manifest slices sum to the doc's token count and
    tile contiguously from doc_off 0; per pack, slices sum to the
    budget (except the final pack) and tile from pos_in_pack 0."""
    from collections import defaultdict

    from fdblog2clickhouse_spark.operators import training

    rows = training.pack_manifest(spark, sf_oracle).collect()
    toks = {
        r["doc_id"]: r["n_tok"]
        for r in training.sequence_packing(spark, sf_oracle).collect()
    }
    by_doc = defaultdict(list)
    by_pack = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
        by_pack[r["pack_id"]].append(r)
    for doc, segs in by_doc.items():
        segs.sort(key=lambda r: r["doc_off"])
        assert sum(s["n_from_doc"] for s in segs) == toks[doc]
        pos = 0
        for s in segs:
            assert s["doc_off"] == pos
            pos += s["n_from_doc"]
    last_pack = max(by_pack)
    for pack, segs in by_pack.items():
        segs.sort(key=lambda r: r["pos_in_pack"])
        total = sum(s["n_from_doc"] for s in segs)
        if pack != last_pack:
            assert total == training._PACK_BUDGET, (pack, total)
        pos = 0
        for s in segs:
            assert s["pos_in_pack"] == pos
            pos += s["n_from_doc"]
