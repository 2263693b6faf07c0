"""Oracle-parity tests for the TPC-H query surface (SURVEY.md §2.2)."""

from __future__ import annotations

import pytest

from fdblog2clickhouse_spark.operators import tpch

from .oracle import compare


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_oracle_parity(spark, sf_oracle, name):
    df = tpch.QUERIES[name](spark, sf_oracle)
    compare(df, tpch.ORACLE[name], sf_oracle)


def test_q1_shape(spark, sf_smoke):
    rows = tpch.tpch_q1(spark, sf_smoke).collect()
    assert len(rows) > 0
    assert rows[0]["count_order"] > 0
