"""Salted aggregation must be result-identical to the direct groupBy
(integer aggregates: bit-exact regardless of how rows split)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdblog2clickhouse_spark.functions.hashing import cents
from fdblog2clickhouse_spark.functions.skew import salted_sum_count
from fdblog2clickhouse_spark.sources.tables import table


def test_salted_equals_direct(spark, sf_smoke):
    e = table(spark, sf_smoke, "events")
    direct = (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("value"))).alias("total"),
        )
    )
    salted = salted_sum_count(
        e, ["event_type"], cents(F.col("value")), salt_col="event_id", n_salts=8
    )
    d = {r["event_type"]: (r["n"], r["total"]) for r in direct.collect()}
    s = {r["event_type"]: (r["n"], r["total"]) for r in salted.collect()}
    assert d == s


def test_salt_is_deterministic(spark, sf_smoke):
    e = table(spark, sf_smoke, "events")
    a = salted_sum_count(
        e, ["event_type"], cents(F.col("value")), salt_col="event_id"
    ).collect()
    b = salted_sum_count(
        e, ["event_type"], cents(F.col("value")), salt_col="event_id"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
