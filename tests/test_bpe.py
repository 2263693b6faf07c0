"""BPE merge-loop trainer tests (operators/bpe.py)."""

from __future__ import annotations

import pytest

from fdblog2clickhouse_spark.operators import bpe
from tests.oracle import compare


def test_bpe_train_matches_oracle(spark, sf_oracle):
    compare(
        bpe.bpe_train_merges(spark, sf_oracle),
        bpe.ORACLE["bpe_train_merges"],
        sf_oracle,
    )


@pytest.fixture()
def aaaa_sf(spark, tmp_path):
    d = spark.createDataFrame(
        [(1, "aaaa aaaa b", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    d.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_greedy_overlap_and_termination(spark, aaaa_sf):
    """The merge rewrite must be GREEDY left-to-right with no
    delimiter consumption across adjacent matches: 'a a a a' + pair
    (a,a) → 'aa aa' (a wrong rewrite leaves 'aa a a' and the rank-2
    merge becomes (aa,a)). Also: the loop stops when no pairs
    remain (rank 3 would need a 2-symbol word)."""
    rows = sorted(
        bpe.bpe_train_merges(spark, aaaa_sf).collect(), key=lambda r: r["rank"]
    )
    assert [(r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"]) for r in rows] == [
        (1, "a", "a", "aa", 6),
        (2, "aa", "aa", "aaaa", 2),
    ]


def test_tokenize_conservation_and_fixture(spark, aaaa_sf, sf_oracle):
    """Tokenize invariants: per doc, n_words <= n_bpe_tokens <=
    n_chars (merges only ever shrink the symbol count toward 1 per
    word, never below). On the aaaa fixture the counts are exact:
    'aaaa aaaa b' -> words [aaaa, aaaa, b]; after (a,a)->(aa,aa)->
    aaaa merges each 'aaaa' is ONE token."""
    rows = bpe.bpe_tokenize(spark, aaaa_sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_words"], r["n_bpe_tokens"], r["n_chars"]) == (3, 3, 9)
    for row in bpe.bpe_tokenize(spark, sf_oracle).collect():
        assert row["n_words"] <= row["n_bpe_tokens"] <= row["n_chars"]
    compare(
        bpe.bpe_tokenize(spark, sf_oracle),
        bpe.ORACLE["bpe_tokenize"],
        sf_oracle,
    )
