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


def test_salted_join_equals_plain_join(spark, sf_smoke):
    """Salting must be result-transparent: same rows as the plain
    join, for inner and left joins, under forced shuffle joins."""
    from fdblog2clickhouse_spark.functions.skew import salted_join

    orders = table(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_smoke, "customer").select("c_custkey", "c_name").withColumnRenamed("c_custkey", "o_custkey")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = orders.join(cust, "o_custkey").collect()
        salted = salted_join(
            orders, cust, "o_custkey", salt_col="o_orderkey", n_salts=8
        ).collect()
        key = lambda r: (r["o_custkey"], r["o_orderkey"], r["c_name"])  # noqa: E731
        assert sorted(map(key, salted)) == sorted(map(key, plain))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
