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


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "user_path_transitions": user_path_transitions,
    "events_pivot_usertype": events_pivot_usertype,
    "events_sliding_windows": events_sliding_windows,
}

ORACLE = {
    "funnel_conversion": _FUNNEL_SQL,
    "user_path_transitions": _TRANSITIONS_SQL,
    "events_pivot_usertype": _PIVOT_SQL,
    "events_sliding_windows": _SLIDING_SQL,
}
