"""Oracle-parity + semantics tests for corpus-curation operators
(SURVEY.md §2.9)."""

from __future__ import annotations

import pytest

from fdblog2clickhouse_spark.operators import curation

from .oracle import compare


@pytest.mark.parametrize("name", sorted(curation.QUERIES))
def test_curation_oracle_parity(spark, sf_oracle, name):
    df = curation.QUERIES[name](spark, sf_oracle)
    compare(df, curation.ORACLE[name], sf_oracle)


def test_decontam_excludes_eval_docs(spark, sf_oracle):
    """Contaminated rows are train docs only, each with ≥1 shared gram."""
    rows = curation.benchmark_decontam(spark, sf_oracle).collect()
    assert rows, "synthetic corpus has dup clusters; expect contamination"
    for r in rows:
        assert r["doc_id"] % curation._EVAL_MOD != 0
        assert r["n_shared_grams"] >= 1


def test_mixture_sample_quotas(spark, sf_oracle):
    """Per-language sample size never exceeds its quota, and the hash
    ranking makes the sample a deterministic subset."""
    s = sum(curation._MIX_WEIGHTS.values())
    quotas = {
        lang: (curation._MIX_TOTAL * w) // s
        for lang, w in curation._MIX_WEIGHTS.items()
    }
    rows = curation.domain_mixture_sample(spark, sf_oracle).collect()
    assert rows
    by_lang: dict[str, int] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    for lang, n in by_lang.items():
        assert n <= quotas[lang], (lang, n, quotas[lang])
    again = curation.domain_mixture_sample(spark, sf_oracle).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in again
    )


def test_collocations_support_and_order(spark, sf_oracle):
    rows = sorted(
        curation.token_collocations(spark, sf_oracle).collect(),
        key=lambda r: r["rnk"],
    )
    assert rows
    assert rows[0]["rnk"] == 1
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["n_ab"] >= curation._COLL_MIN_SUPPORT
        assert r["n_a"] >= r["n_ab"] and r["n_b"] >= r["n_ab"]
