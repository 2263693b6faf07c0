"""Bigram fluency tests (operators/lm.py)."""

from __future__ import annotations

from fdblog2clickhouse_spark.operators import lm
from tests.oracle import compare


def test_fluency_matches_oracle(spark, sf_oracle):
    compare(lm.doc_bigram_fluency(spark, sf_oracle), lm._FLUENCY_SQL, sf_oracle)


def test_fluency_ranks_repetition_above_noise(spark, tmp_path):
    """Sanity on the signal itself: a document of corpus-typical
    repeated transitions must outscore a document of one-off
    transitions (that is the filtering direction)."""
    common = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (1, common), (2, common), (3, common),          # typical docs
        (10, common),                                   # another typical doc
        (20, "zx qv pl mn rt uy wo ek sj dh fg bc"),    # one-off junk
    ]
    d = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    d.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r["mean_p_nano"]
        for r in lm.doc_bigram_fluency(spark, str(tmp_path)).collect()
    }
    assert got[10] > got[20], got
