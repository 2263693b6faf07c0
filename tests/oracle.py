"""DuckDB-oracle comparison harness — mirrors the driver's check.

Runs the Spark query and the oracle SQL on the same parquet tables,
sorts columns by name and rows by value, and requires EXACT equality
(floats bit-identical, the strictness a value-hash implies). Used by
tests so oracle drift is caught locally before the driver sees it.
"""

from __future__ import annotations

import math

import duckdb

from fdblog2clickhouse_spark.sources.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    res = con.sql(sql)
    cols = list(res.columns)
    rows = res.fetchall()
    con.close()
    return cols, rows


def _norm_cell(v):
    # canonicalize types that differ in representation but not value
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return v
    if isinstance(v, int):
        return float(v) if -(2**52) < v < 2**52 else v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sorted_table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((str(type(c)), str(c)) for c in t))
    return [cols[i] for i in order], out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert the Spark result and the oracle result match exactly."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count differs: {len(s_rows)} vs {len(o_rows)}"

    sc, s_norm = _sorted_table(s_cols, s_rows)
    oc, o_norm = _sorted_table(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
        assert a == b, f"row {i} differs (cols {sc}):\n  spark : {a}\n  oracle: {b}"
