"""Event-sequence analysis over `events` (SURVEY §2.1 ext).

ClickHouse ships funnel/sequence aggregates (`windowFunnel`,
`sequenceMatch`) as part of the OLAP surface the reference promises
over its trace table (reference README.md:10 — "traditional OLAP SQL
queries"); these are their Spark-first equivalents:

- `funnel_conversion`: ordered view → click → purchase funnel. Each
  stage is a conditional-min aggregate over the PREVIOUS stage's
  timestamp — three narrow per-user aggregates (map-side combined),
  never a per-user sort or a cross join. The final output is one row
  per stage with the user count that reached it, so the shuffle
  output is O(users) and the result is O(stages).
- `user_path_transitions`: Markov transition counts between
  consecutive events per user (lag over a total order — ties broken
  by the unique event_id so the order is deterministic under any
  partitioning).
- `events_pivot_usertype`: per-user event-type count matrix via the
  DataFrame pivot operator with EXPLICIT pivot values (no
  driver-side distinct scan to discover columns — at 100 TB that
  discovery pass is a full shuffle you don't need when the domain is
  known). Oracle: conditional aggregation, the portable spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import cents, cents_sql
from ..sources.tables import table

_FUNNEL_STEPS = ["view", "click", "purchase"]
_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


# -------------------------------------------------- funnel_conversion

def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users reaching each ordered funnel stage. Stage k counts users
    with an event of type k strictly after their stage-(k-1) time."""
    e = table(spark, sf_dir, "events")
    s1 = (
        e.where(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        s1.agg(F.lit(1).alias("stage"), F.lit(_FUNNEL_STEPS[0]).alias("step"),
               F.count(F.lit(1)).alias("users")),
        s2.agg(F.lit(2).alias("stage"), F.lit(_FUNNEL_STEPS[1]).alias("step"),
               F.count(F.lit(1)).alias("users")),
        s3.agg(F.lit(3).alias("stage"), F.lit(_FUNNEL_STEPS[2]).alias("step"),
               F.count(F.lit(1)).alias("users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


_FUNNEL_SQL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
  JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > s1.t1 GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
  JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > s2.t2 GROUP BY 1
)
SELECT 1 AS stage, '{_FUNNEL_STEPS[0]}' AS step, COUNT(*) AS users FROM s1
UNION ALL
SELECT 2, '{_FUNNEL_STEPS[1]}', COUNT(*) FROM s2
UNION ALL
SELECT 3, '{_FUNNEL_STEPS[2]}', COUNT(*) FROM s3
"""


# ---------------------------------------------- user_path_transitions

def user_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts of consecutive (prev_type → next_type) transitions per
    user stream. One window shuffle partitioned by user, one count
    aggregate — the bigram model of the event stream."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
)
SELECT prev_type, next_type, COUNT(*) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


# --------------------------------------------- events_pivot_usertype

def events_pivot_usertype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type count matrix (pivot with explicit values —
    a single map-side-combined shuffle; no discovery pass)."""
    e = table(spark, sf_dir, "events")
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _PIVOT_TYPES
        ],
    )


_PIVOT_SQL = f"""
SELECT user_id,
       {', '.join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in _PIVOT_TYPES)}
FROM events GROUP BY 1
"""


# ------------------------------------------- events_sliding_windows

_SLIDE_MIN = 15
_WIN_MIN = 60


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (overlapping
    materialized-view rollup). Spark's window() expands each event to
    its 4 covering windows BEFORE the aggregate, so map-side combine
    still reduces the shuffle to one row per (window) per partition —
    the overlap factor multiplies compute, not network, and the
    output is O(time-range), independent of event volume."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", f"{_WIN_MIN} minutes", f"{_SLIDE_MIN} minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_c"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n",
            (F.col("value_c").cast("double") / 100.0).alias("total_value"),
        )
    )


_SLIDE_US = _SLIDE_MIN * 60 * 1_000_000
_N_COVER = _WIN_MIN // _SLIDE_MIN

_SLIDING_SQL = f"""
WITH ev AS (
  SELECT epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS value_c
  FROM events
), expanded AS (
  SELECT (us // {_SLIDE_US}) * {_SLIDE_US} - k * {_SLIDE_US} AS window_start_us,
         value_c
  FROM ev, (SELECT unnest(generate_series(0, {_N_COVER - 1})) AS k)
)
SELECT window_start_us, COUNT(*) AS n,
       CAST(SUM(value_c) AS DOUBLE) / 100.0 AS total_value
FROM expanded GROUP BY 1
"""


# --------------------------------------------- max_concurrent_events

_ACTIVE_US = 5 * 60 * 1_000_000  # each event holds a 5-min active interval
_SWEEP_BUCKET_US = 3_600_000_000  # 1h carry buckets for the parallel prefix sum


def max_concurrent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``maxIntersections`` analog: peak number of
    simultaneously-active events per type, where each event is active
    for 5 minutes ([ts, ts+5min), half-open — an interval ending
    exactly when another starts does not overlap).

    Sweep-line with a PARALLEL prefix sum: a naive running
    SUM(±1) OVER (PARTITION BY type ORDER BY t) puts each type's
    whole timeline in one sort partition — at 100 TB that single
    ordered partition is the bottleneck. Instead endpoints are
    bucketed by hour; each (type, hour) bucket computes its local
    running sum and local max independently, then a tiny
    O(hours)-row carry window adds the sum of all earlier buckets.
    ``offset + local_max`` equals the global running-sum max exactly
    (the bucket key is monotone in the sweep order), so this is the
    textbook two-pass parallel scan — shuffle keyed on (type, hour),
    no global ordering anywhere. The DuckDB oracle uses the naive
    single-window spelling: same semantics, different physical plan.
    """
    e = table(spark, sf_dir, "events")
    ep = (
        e.select(
            "event_type",
            F.unix_micros(F.col("ts")).alias("us"),
            "event_id",
        )
        .select(
            "event_type",
            F.explode(
                F.array(
                    F.struct(
                        F.col("us").alias("t"),
                        F.lit(1).alias("delta"),
                        F.col("event_id").alias("event_id"),
                    ),
                    F.struct(
                        (F.col("us") + F.lit(_ACTIVE_US)).alias("t"),
                        F.lit(-1).alias("delta"),
                        F.col("event_id").alias("event_id"),
                    ),
                )
            ).alias("p"),
        )
        .select("event_type", "p.t", "p.delta", "p.event_id")
        .withColumn("bucket", (F.col("t") / F.lit(_SWEEP_BUCKET_US)).cast("long"))
    )
    w_in = (
        Window.partitionBy("event_type", "bucket")
        .orderBy(F.asc("t"), F.asc("delta"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ep.withColumn("rs", F.sum("delta").over(w_in))
    per_bucket = local.groupBy("event_type", "bucket").agg(
        F.sum("delta").alias("tot"), F.max("rs").alias("mx")
    )
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = per_bucket.withColumn(
        "offset", F.coalesce(F.sum("tot").over(w_carry), F.lit(0))
    )
    return carried.groupBy("event_type").agg(
        F.max(F.col("offset") + F.col("mx")).alias("max_concurrent")
    )


_MAX_CONCURRENT_SQL = f"""
WITH ep AS (
  SELECT event_type, epoch_us(ts) AS t, 1 AS delta, event_id FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + {_ACTIVE_US}, -1, event_id FROM events
), rs AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type
                          ORDER BY t ASC, delta ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS c
  FROM ep
)
SELECT event_type, CAST(MAX(c) AS BIGINT) AS max_concurrent FROM rs GROUP BY 1
"""


# ------------------------------------------------ user_value_deltas

def user_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum`` / ``runningDifference`` analog: per
    user, the sum of positive step-to-step value deltas, the count of
    increases/drops, and the net change (telescoping sum of deltas =
    last - first, no first/last aggregate needed). Ordered by the
    total order (ts, event_id); all arithmetic in integer cents with
    one final division, so results are shuffle-order-independent."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    t = (
        e.select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts")).alias("us"),
            cents(F.col("value")).alias("v_c"),
        )
        .withColumn("delta", F.col("v_c") - F.lag("v_c").over(w))
        .where(F.col("delta").isNotNull())
    )
    return t.groupBy("user_id").agg(
        (
            F.coalesce(
                F.sum(F.when(F.col("delta") > 0, F.col("delta"))), F.lit(0)
            ).cast("double")
            / F.lit(100.0)
        ).alias("delta_sum"),
        F.count(F.when(F.col("delta") > 0, F.lit(1))).alias("n_increases"),
        F.count(F.when(F.col("delta") < 0, F.lit(1))).alias("n_drops"),
        (F.sum("delta").cast("double") / F.lit(100.0)).alias("net_change"),
    )


_VALUE_DELTAS_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {cents_sql('value')} AS v_c
  FROM events
), d AS (
  SELECT user_id,
         v_c - LAG(v_c) OVER (PARTITION BY user_id
                              ORDER BY us ASC, event_id ASC) AS delta
  FROM t
)
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN delta > 0 THEN delta END), 0) AS DOUBLE)
         / 100.0 AS delta_sum,
       COUNT(CASE WHEN delta > 0 THEN 1 END) AS n_increases,
       COUNT(CASE WHEN delta < 0 THEN 1 END) AS n_drops,
       CAST(SUM(delta) AS DOUBLE) / 100.0 AS net_change
FROM d WHERE delta IS NOT NULL GROUP BY 1
"""


# ------------------------------------------------- events_moving_avg

_MOV_BUCKETS = 5  # trailing frame width in minute buckets


def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayMovingAvg`` analog: per event type, the
    trailing 5-minute-bucket moving event count / value sum over the
    per-minute rollup. The window runs AFTER the minute-grain
    pre-aggregate, so the ordered partition is O(minutes) per type
    (bounded by wall-clock time), never O(events) — the rollup
    absorbs data growth and the window cost is scale-invariant.
    Integer sums; the moving average is one final division by the
    frame's actual row count (ramp-up frames divide by 1..5)."""
    e = table(spark, sf_dir, "events")
    m = e.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("minute", F.col("ts"))).alias("minute_us"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("value"))).alias("v_c"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("minute_us"))
        .rowsBetween(-(_MOV_BUCKETS - 1), Window.currentRow)
    )
    return m.select(
        "event_type",
        "minute_us",
        "n",
        F.sum("n").over(w).alias("mov_events"),
        (
            F.sum("n").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("mov_avg_events"),
        (F.sum("v_c").over(w).cast("double") / F.lit(100.0)).alias("mov_value"),
    )


_MOVING_AVG_SQL = f"""
WITH m AS (
  SELECT event_type,
         epoch_us(date_trunc('minute', ts)) AS minute_us,
         COUNT(*) AS n,
         SUM({cents_sql('value')}) AS v_c
  FROM events GROUP BY 1, 2
)
SELECT event_type, minute_us, n,
       CAST(SUM(n) OVER w AS BIGINT) AS mov_events,
       CAST(SUM(n) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE)
         AS mov_avg_events,
       CAST(SUM(v_c) OVER w AS DOUBLE) / 100.0 AS mov_value
FROM m
WINDOW w AS (PARTITION BY event_type ORDER BY minute_us ASC
             ROWS BETWEEN {_MOV_BUCKETS - 1} PRECEDING AND CURRENT ROW)
"""


# -------------------------------------------------- funnel_windowed

_FUNNEL_WINDOW_US = 3_600_000_000  # the whole chain must fit in 1h


def funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel — ClickHouse ``windowFunnel(3600)``: the
    ordered view → click → purchase chain only counts if every later
    stage lands within 1 hour of the user's FIRST view. Same
    conditional-min cascade as the unbounded funnel (three narrow
    per-user aggregates, map-side combined, O(users) shuffle) with
    the window bound carried as a plain filter against the anchored
    stage-1 time."""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    s1 = (
        e.where(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .where((us > F.col("t1")) & (us <= F.col("t1") + _FUNNEL_WINDOW_US))
        .groupBy("user_id")
        .agg(F.min(us).alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        e.where(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .where((us > F.col("t2")) & (us <= F.col("t1") + _FUNNEL_WINDOW_US))
        .groupBy("user_id")
        .agg(F.min(us).alias("t3"))
    )
    rows = [
        s1.agg(F.lit(1).alias("stage"), F.lit(_FUNNEL_STEPS[0]).alias("step"),
               F.count(F.lit(1)).alias("users")),
        s2.agg(F.lit(2).alias("stage"), F.lit(_FUNNEL_STEPS[1]).alias("step"),
               F.count(F.lit(1)).alias("users")),
        s3.agg(F.lit(3).alias("stage"), F.lit(_FUNNEL_STEPS[2]).alias("step"),
               F.count(F.lit(1)).alias("users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


_FUNNEL_WINDOWED_SQL = f"""
WITH s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2, MIN(s1.t1) AS t1
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}'
    AND epoch_us(e.ts) > s1.t1
    AND epoch_us(e.ts) <= s1.t1 + {_FUNNEL_WINDOW_US}
  GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}'
    AND epoch_us(e.ts) > s2.t2
    AND epoch_us(e.ts) <= s2.t1 + {_FUNNEL_WINDOW_US}
  GROUP BY 1
)
SELECT 1 AS stage, '{_FUNNEL_STEPS[0]}' AS step, COUNT(*) AS users FROM s1
UNION ALL
SELECT 2, '{_FUNNEL_STEPS[1]}', COUNT(*) FROM s2
UNION ALL
SELECT 3, '{_FUNNEL_STEPS[2]}', COUNT(*) FROM s3
"""


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "user_path_transitions": user_path_transitions,
    "events_pivot_usertype": events_pivot_usertype,
    "events_sliding_windows": events_sliding_windows,
    "max_concurrent_events": max_concurrent_events,
    "user_value_deltas": user_value_deltas,
    "events_moving_avg": events_moving_avg,
    "funnel_windowed": funnel_windowed,
}

ORACLE = {
    "funnel_conversion": _FUNNEL_SQL,
    "user_path_transitions": _TRANSITIONS_SQL,
    "events_pivot_usertype": _PIVOT_SQL,
    "events_sliding_windows": _SLIDING_SQL,
    "max_concurrent_events": _MAX_CONCURRENT_SQL,
    "user_value_deltas": _VALUE_DELTAS_SQL,
    "events_moving_avg": _MOVING_AVG_SQL,
    "funnel_windowed": _FUNNEL_WINDOWED_SQL,
}
