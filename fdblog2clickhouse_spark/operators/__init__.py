"""Operator registry.

Each submodule defines two module-level dicts:
  QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
  ORACLE : dict[str, str]   # DuckDB-equivalent ANSI SQL (subset of QUERIES keys)

This package aggregates them for __spark_entry__.py. Keys are the
SURVEY.md §2 inventory names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _collect() -> tuple[dict, dict]:
    from . import curation, dedup, multimodal, sequence, similarity, sketches, textops, tpch, trace_ops
    from ..sources import trace_json
    from ..streaming import queries as streaming_queries

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle: dict[str, str] = {}
    for mod in (
        trace_ops,
        tpch,
        dedup,
        similarity,
        textops,
        multimodal,
        streaming_queries,
        trace_json,
        sketches,
        sequence,
        curation,
    ):
        for k, v in mod.QUERIES.items():
            if k in queries:
                raise ValueError(f"duplicate query key {k!r}")
            queries[k] = v
        oracle.update(mod.ORACLE)
    unknown = set(oracle) - set(queries)
    if unknown:
        raise ValueError(f"oracle keys without queries: {unknown}")
    return queries, oracle


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def all_oracle_sql() -> dict[str, str]:
    return _collect()[1]
