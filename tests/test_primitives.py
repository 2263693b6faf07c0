"""Cross-engine determinism primitives: direct parity tests.

Every oracle match in this repo rests on three primitives producing
BIT-IDENTICAL results in Spark, DuckDB, and (for generated constants)
Python: the md5-derived h32 hash, integer-scaled money (cents), and
whitespace normalization. These tests attack them directly with
adversarial values — rounding halves, negative zero, unicode,
whitespace runs — plus hypothesis-generated strings for the pure
Python↔DuckDB pair (no JVM in the loop, so hundreds of examples are
cheap).
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fdblog2clickhouse_spark.functions.hashing import (
    cents_sql,
    h32_sql,
)


def _h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8", exclude_characters="'\x00"), max_size=64))
def test_h32_python_duckdb_agree(s: str):
    got = duckdb.sql(f"SELECT {h32_sql('?')}", params=[s]).fetchone()[0]
    assert got == _h32_py(s)


@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ).map(lambda x: round(x, 2))
)
def test_cents_roundtrip_duckdb(x: float):
    """Any 2-decimal double survives the cents round trip exactly."""
    c = duckdb.sql(f"SELECT {cents_sql('?')}", params=[x]).fetchone()[0]
    assert c / 100.0 == pytest.approx(x, abs=0)  # exact: c/100 == x bit-wise
    assert c == round(x * 100)


TRICKY_STRINGS = [
    "",
    " ",
    "  a  b  ",
    "a\tb\nc",
    "UPPER lower MiXeD",
    "héllo wörld",
    "日本語 テスト",
    "tab\t\ttab",
    "trailing space ",
    " leading",
    "a" * 200,
    "1.5|2.5|pipe",
]

TRICKY_DOUBLES = [0.0, 0.005, 0.015, 0.025, -0.005, 1.005, -1.015, 0.1, 0.2, 0.3,
                  123456789.99, -123456789.99, 0.01, -0.01, 49.999, 50.001]


def test_primitives_spark_duckdb_parity(spark):
    """One batched Spark↔DuckDB comparison over the adversarial value
    sets for h32, cents, and norm_text."""
    from pyspark.sql import functions as F

    from fdblog2clickhouse_spark.functions.hashing import cents, h32
    from fdblog2clickhouse_spark.functions.text import norm_text, norm_text_sql

    sdf = spark.createDataFrame([(s,) for s in TRICKY_STRINGS], "s string")
    srows = (
        sdf.select(h32(F.col("s")).alias("h"), norm_text(F.col("s")).alias("n"))
        .collect()
    )
    con = duckdb.connect()
    for (s, row) in zip(TRICKY_STRINGS, srows):
        h, n = con.execute(
            f"SELECT {h32_sql('?')}, {norm_text_sql('?')}", [s, s]
        ).fetchone()
        assert row["h"] == h, f"h32 mismatch for {s!r}"
        assert row["n"] == n, f"norm_text mismatch for {s!r}"

    ddf = spark.createDataFrame([(x,) for x in TRICKY_DOUBLES], "x double")
    crows = ddf.select(cents(F.col("x")).alias("c")).collect()
    for (x, row) in zip(TRICKY_DOUBLES, crows):
        c = con.execute(f"SELECT {cents_sql('?')}", [x]).fetchone()[0]
        assert row["c"] == c, f"cents mismatch for {x!r}: spark {row['c']} duckdb {c}"
    con.close()
