"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``fdblog2clickhouse_spark``; this module is
a thin aggregator over the SURVEY.md §2 operator registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fdblog2clickhouse_spark import operators
from fdblog2clickhouse_spark.session import tune


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q1 pricing summary) on sf0.001."""
    tune(spark)
    return operators.all_queries()["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2. Every
    callable tunes the caller's session first (UTC session timezone,
    AQE, Arrow) — timestamp-bucketing queries must not depend on the
    driver session's default timezone."""

    def _tuned(f: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return f(tune(spark), sf_dir)

        return run

    return {name: _tuned(f) for name, f in operators.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return operators.all_oracle_sql()
