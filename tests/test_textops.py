"""Oracle-parity tests for text analysis (SURVEY §2.5)."""

from __future__ import annotations

import pytest

from fdblog2clickhouse_spark.operators import textops

from .oracle import compare


@pytest.mark.parametrize("name", sorted(textops.QUERIES))
def test_textops_oracle_parity(spark, sf_oracle, name):
    df = textops.QUERIES[name](spark, sf_oracle)
    compare(df, textops.ORACLE[name], sf_oracle)


def test_quality_score_bounds(spark, sf_oracle):
    rows = textops.text_quality_score(spark, sf_oracle).collect()
    assert len(rows) == 500
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
