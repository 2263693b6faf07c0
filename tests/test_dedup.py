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
