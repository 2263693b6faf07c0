"""Oracle-parity + semantics tests for sketch and sequence operators
(SURVEY.md §2.1 extensions)."""

from __future__ import annotations

import pytest

from fdblog2clickhouse_spark.operators import sequence, sketches

from .oracle import compare


@pytest.mark.parametrize("name", sorted(sketches.QUERIES))
def test_sketch_oracle_parity(spark, sf_oracle, name):
    df = sketches.QUERIES[name](spark, sf_oracle)
    compare(df, sketches.ORACLE[name], sf_oracle)


@pytest.mark.parametrize("name", sorted(sequence.QUERIES))
def test_sequence_oracle_parity(spark, sf_oracle, name):
    df = sequence.QUERIES[name](spark, sf_oracle)
    compare(df, sequence.ORACLE[name], sf_oracle)


def test_hll_estimate_close(spark, sf_oracle):
    """HLL with 64 registers has ~13% standard error; the synthetic
    uniques (hundreds per type) must land well within 3σ."""
    rows = sketches.hll_distinct_users(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r["hll_est"] > 0
        rel = abs(r["hll_est"] - r["exact_uniques"]) / r["exact_uniques"]
        assert rel < 0.4, (r["event_type"], r["exact_uniques"], r["hll_est"])


def test_cms_overestimates(spark, sf_oracle):
    """Count-min estimates are lower-bounded by the exact count."""
    for r in sketches.cms_heavy_hitters(spark, sf_oracle).collect():
        assert r["cms_est"] >= r["exact_count"]


def test_funnel_monotone(spark, sf_oracle):
    """Each funnel stage can only lose users."""
    rows = sorted(
        sequence.funnel_conversion(spark, sf_oracle).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage"] for r in rows] == [1, 2, 3]
    assert rows[0]["users"] >= rows[1]["users"] >= rows[2]["users"]
    assert rows[0]["users"] > 0


def test_transitions_conserve_events(spark, sf_oracle):
    """Sum of transition counts == total events - users with ≥1 event
    (each user's stream of k events yields k-1 bigrams)."""
    from fdblog2clickhouse_spark.sources.tables import table

    e = table(spark, sf_oracle, "events")
    total = e.count()
    users = e.select("user_id").distinct().count()
    bigrams = (
        sequence.user_path_transitions(spark, sf_oracle)
        .groupBy()
        .sum("n")
        .collect()[0][0]
    )
    assert bigrams == total - users


def test_max_concurrent_two_phase_equals_naive(spark, sf_oracle):
    """The bucketed parallel prefix sum must equal the naive global
    running-sum spelling (computed here in Spark, independent of the
    DuckDB oracle)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fdblog2clickhouse_spark.operators.sequence import _ACTIVE_US
    from fdblog2clickhouse_spark.sources.tables import table

    e = table(spark, sf_oracle, "events").select(
        "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    ep = e.select("event_type", F.col("us").alias("t"), F.lit(1).alias("delta"),
                  "event_id").unionAll(
        e.select("event_type", (F.col("us") + _ACTIVE_US).alias("t"),
                 F.lit(-1).alias("delta"), "event_id")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("t"), F.asc("delta"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {
        r["event_type"]: r["mc"]
        for r in ep.withColumn("c", F.sum("delta").over(w))
        .groupBy("event_type")
        .agg(F.max("c").alias("mc"))
        .collect()
    }
    fast = {
        r["event_type"]: r["max_concurrent"]
        for r in sequence.max_concurrent_events(spark, sf_oracle).collect()
    }
    assert naive == fast
    assert all(v >= 1 for v in fast.values())


def test_moving_avg_frame_bounds(spark, sf_oracle):
    """Moving count is bounded by the frame width × per-bucket max and
    equals n on each partition's first row."""
    rows = sequence.events_moving_avg(spark, sf_oracle).collect()
    assert rows
    first_by_type = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["minute_us"])):
        if r["event_type"] not in first_by_type:
            first_by_type[r["event_type"]] = r
            assert r["mov_events"] == r["n"]
            assert r["mov_avg_events"] == float(r["n"])
        assert r["mov_events"] >= r["n"]


def test_windowed_funnel_bounded_by_unbounded(spark, sf_oracle):
    """The 1h-bounded funnel can only lose users vs the unbounded
    funnel, and stays monotone across stages."""
    unb = {
        r["stage"]: r["users"]
        for r in sequence.funnel_conversion(spark, sf_oracle).collect()
    }
    win = {
        r["stage"]: r["users"]
        for r in sequence.funnel_windowed(spark, sf_oracle).collect()
    }
    assert win[1] == unb[1]  # stage 1 has no window constraint
    assert win[2] <= unb[2] and win[3] <= unb[3]
    assert win[1] >= win[2] >= win[3]
