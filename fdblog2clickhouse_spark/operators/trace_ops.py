"""Trace-log pipeline semantics over the `events` table (SURVEY §2.1).

`events` plays the FDB trace-log table the reference ingests
(trace-converter.py:85-93): event_id≙ID, ts≙Time, user_id≙Machine,
event_type≙Type, with severity derived the way FDB severity codes
work (errors are Severity 40, routine events 10). The queries are the
OLAP surface the reference promises over ingested traces
(README.md:10,139,230-236): normalization, partition stats (its
PARTITION BY toYYYYMM law), rollups, time buckets, top-k, CDC-latest
dedup, sessionization, JSON payload extraction, gap diagnostics.

Determinism rules (see functions/hashing.py): money via integer
cents; timestamps exported as epoch-µs BIGINT (`unix_micros` ≡
DuckDB `epoch_us`) because raw timestamp dtypes (ns vs µs) hash
differently across engines; every tie-broken window orders by a
unique key so row_number/rank are total orders.

Scale notes: all aggregations are partial-agg friendly (map-side
combine); window functions partition by user_id/event keys, which at
100 TB distributes by key hash — no global windows except the final
top-k rank over an already-aggregated handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import cents, cents_sql
from ..sources.tables import table

# Derived severity: reference severity codes (error→40, else 10).
# (A function, not a module constant: Column construction needs an
# active SparkContext.)
def _sev():
    return F.when(F.col("event_type") == "error", F.lit(40)).otherwise(F.lit(10))


_SEV_SQL = "CASE WHEN event_type = 'error' THEN 40 ELSE 10 END"

_US = lambda c: F.unix_micros(F.col(c))  # noqa: E731
_US_SQL = lambda e: f"epoch_us({e})"  # noqa: E731


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events")


# ------------------------------------------------- trace_normalize

def trace_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's column trim + type coercion
    (trace-converter.py:114-119) as a declarative projection."""
    e = _events(spark, sf_dir)
    return e.select(
        F.col("event_id").alias("id"),
        _US("ts").alias("time_us"),
        F.concat(F.lit("machine-"), F.col("user_id").cast("string")).alias("machine"),
        _sev().cast("int").alias("severity"),
        F.col("event_type").alias("type"),
        F.lit("default").alias("log_group"),
    )


_TRACE_NORMALIZE_SQL = f"""
SELECT event_id AS id,
       {_US_SQL('ts')} AS time_us,
       'machine-' || CAST(user_id AS VARCHAR) AS machine,
       CAST({_SEV_SQL} AS INT) AS severity,
       event_type AS type,
       'default' AS log_group
FROM events
"""


# -------------------------------------------- trace_partition_stats

def trace_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row/machine/time stats per toYYYYMM(Time) partition — the
    MergeTree partitioning law (trace-converter.py:23,49-52)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy((F.year("ts") * 100 + F.month("ts")).cast("int").alias("yyyymm"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_machines"),
            F.min(_US("ts")).alias("min_time_us"),
            F.max(_US("ts")).alias("max_time_us"),
        )
        .orderBy("yyyymm")
    )


_TRACE_PARTITION_STATS_SQL = f"""
SELECT CAST(year(ts) * 100 + month(ts) AS INT) AS yyyymm,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT user_id) AS n_machines,
       MIN({_US_SQL('ts')}) AS min_time_us,
       MAX({_US_SQL('ts')}) AS max_time_us
FROM events GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------- severity_rollup

def severity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree-style rollup by severity × type
    (reference README.md:233-235)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(_sev().cast("int").alias("severity"), F.col("event_type").alias("type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("value"))).alias("value_c"),
        )
        .select(
            "severity",
            "type",
            "n",
            (F.col("value_c") / F.lit(100.0)).alias("total_value"),
        )
    )


_SEVERITY_ROLLUP_SQL = f"""
SELECT CAST({_SEV_SQL} AS INT) AS severity,
       event_type AS type,
       COUNT(*) AS n,
       SUM({cents_sql('value')}) / 100.0 AS total_value
FROM events GROUP BY 1, 2
"""


# ------------------------------------------------ events_per_minute

def events_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling per-minute rollup (the materialized-view use case)."""
    e = _events(spark, sf_dir)
    agg = e.groupBy(
        F.unix_micros(F.date_trunc("minute", F.col("ts"))).alias("minute_us")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("value"))).alias("value_c"),
    )
    return agg.select(
        "minute_us",
        "n",
        (F.col("value_c") / F.lit(100.0)).alias("total_value"),
        (F.col("value_c") / F.col("n") / F.lit(100.0)).alias("avg_value"),
    )


_EVENTS_PER_MINUTE_SQL = f"""
WITH agg AS (
  SELECT epoch_us(date_trunc('minute', ts)) AS minute_us,
         COUNT(*) AS n,
         SUM({cents_sql('value')}) AS value_c
  FROM events GROUP BY 1
)
SELECT minute_us, n, value_c / 100.0 AS total_value,
       value_c / n / 100.0 AS avg_value
FROM agg
"""


# -------------------------------------------------- top_event_types

def top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k types. rank() over a fully-aggregated (tiny)
    relation — the only global window in the module, applied after
    map-side-combinable aggregation so it never sees raw rows."""
    e = _events(spark, sf_dir)
    counts = e.groupBy(F.col("event_type").alias("type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy(F.desc("n"), F.asc("type"))
    return counts.select(
        "type", "n", F.rank().over(w).cast("long").alias("rnk")
    ).where(F.col("rnk") <= 3)


_TOP_EVENT_TYPES_SQL = """
WITH counts AS (
  SELECT event_type AS type, COUNT(*) AS n FROM events GROUP BY 1
), ranked AS (
  SELECT type, n, RANK() OVER (ORDER BY n DESC, type ASC) AS rnk FROM counts
)
SELECT type, n, rnk FROM ranked WHERE rnk <= 3
"""


# ----------------------------------------------- error_rate_by_user

def error_rate_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        )
        .select(
            "user_id",
            "n_events",
            "n_errors",
            (F.col("n_errors") / F.col("n_events")).alias("error_rate"),
        )
    )


_ERROR_RATE_SQL = """
WITH agg AS (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
  FROM events GROUP BY 1
)
SELECT user_id, n_events, CAST(n_errors AS BIGINT) AS n_errors,
       n_errors / n_events AS error_rate
FROM agg
"""


# --------------------------------------------- events_dedup_latest

def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert semantics: latest record per (machine, type) key —
    what a ReplacingMergeTree would keep. Window partitions by the
    key, so at scale this is a key-distributed shuffle, no global
    sort."""
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy(F.desc(_US("ts")), F.desc("event_id"))
    )
    return (
        e.select(
            "user_id",
            "event_type",
            "event_id",
            _US("ts").alias("time_us"),
            cents(F.col("value")).alias("value_c"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("time_us").alias("last_time_us"),
            (F.col("value_c") / F.lit(100.0)).alias("last_value"),
        )
    )


_EVENTS_DEDUP_LATEST_SQL = f"""
WITH t AS (
  SELECT user_id, event_type, event_id,
         {_US_SQL('ts')} AS time_us,
         {cents_sql('value')} AS value_c,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type
           ORDER BY {_US_SQL('ts')} DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id, event_type, event_id AS last_event_id,
       time_us AS last_time_us, value_c / 100.0 AS last_value
FROM t WHERE rn = 1
"""


# -------------------------------------------- event_sessionization

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after a >30min
    silence. lag + running sum over per-user windows (key-distributed
    at scale; ROWS frame stated explicitly so engines agree)."""
    e = _events(spark, sf_dir)
    order = [F.asc("us"), F.asc("event_id")]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_sum = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = e.select("user_id", "event_id", _US("ts").alias("us"))
    flagged = t.withColumn(
        "new_sess",
        F.when(
            F.lag("us").over(w_lag).isNull()
            | ((F.col("us") - F.lag("us").over(w_lag)) > _SESSION_GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_sess").over(w_sum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
    )


_EVENT_SESSIONIZATION_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, {_US_SQL('ts')} AS us FROM events
), l AS (
  SELECT *, LAG(us) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS prev_us
  FROM t
), f AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {_SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM l
), s AS (
  SELECT *, SUM(new_sess) OVER (
    PARTITION BY user_id ORDER BY us ASC, event_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM f
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(us) AS session_start_us,
       MAX(us) AS session_end_us
FROM s GROUP BY 1, 2
"""


# -------------------------------------------- json_extract_props

def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trace payload parsing: extract the numeric `k` field from the
    JSON `props` column, bucket it, aggregate. Regex extraction is
    used (identical semantics in both engines); NULLIF guards ANSI
    cast of non-matches."""
    e = _events(spark, sf_dir)
    k = F.nullif(F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1), F.lit("")).cast(
        "int"
    )
    t = e.select(k.alias("k"), cents(F.col("value")).alias("value_c")).where(
        F.col("k").isNotNull()
    )
    return (
        t.groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.sum("value_c").alias("value_c"),
        )
        .select(
            "k_bucket",
            "n",
            "n_distinct_k",
            (F.col("value_c") / F.lit(100.0)).alias("total_value"),
        )
    )


_JSON_EXTRACT_PROPS_SQL = f"""
WITH t AS (
  SELECT CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS INT) AS k,
         {cents_sql('value')} AS value_c
  FROM events
)
SELECT k % 10 AS k_bucket,
       COUNT(*) AS n,
       COUNT(DISTINCT k) AS n_distinct_k,
       SUM(value_c) / 100.0 AS total_value
FROM t WHERE k IS NOT NULL GROUP BY 1
"""


# --------------------------------------------- user_activity_gap

def user_activity_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-machine inter-event gap diagnostics (ops health view)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    t = e.select("user_id", "event_id", _US("ts").alias("us"))
    gaps = t.withColumn("gap_us", F.col("us") - F.lag("us").over(w))
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("gap_us").alias("n_gaps"),
            F.max("gap_us").alias("max_gap_us"),
            F.sum("gap_us").alias("sum_gap_us"),
        )
        .where(F.col("n_gaps") >= 1)
        .select(
            "user_id",
            "n_events",
            (F.col("max_gap_us") / F.lit(1_000_000.0)).alias("max_gap_s"),
            (F.col("sum_gap_us") / F.col("n_gaps") / F.lit(1_000_000.0)).alias(
                "avg_gap_s"
            ),
        )
    )


_USER_ACTIVITY_GAP_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, {_US_SQL('ts')} AS us FROM events
), g AS (
  SELECT user_id,
         us - LAG(us) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS gap_us
  FROM t
), agg AS (
  SELECT user_id, COUNT(*) AS n_events, COUNT(gap_us) AS n_gaps,
         MAX(gap_us) AS max_gap_us, SUM(gap_us) AS sum_gap_us
  FROM g GROUP BY 1
)
SELECT user_id, n_events,
       max_gap_us / 1000000.0 AS max_gap_s,
       sum_gap_us / n_gaps / 1000000.0 AS avg_gap_s
FROM agg WHERE n_gaps >= 1
"""


# --------------------------------------------- events_rollup_cube

def events_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP over severity × event_type — the
    materialized-view rollup-table surface ClickHouse serves with
    SummingMergeTree + WITH ROLLUP (reference README.md:230-236).
    Subtotal levels are disambiguated by grouping_id so NULL group
    keys hash identically across engines."""
    e = _events(spark, sf_dir)
    sev = (
        F.when(F.col("event_type") == "error", F.lit(40)).otherwise(F.lit(10))
    ).alias("severity")
    return (
        e.select(sev, "event_type", "value")
        .rollup("severity", "event_type")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents(F.col("value"))) / F.lit(100.0)).alias("total_value"),
        )
        .orderBy("gid", "severity", "event_type")
    )


_EVENTS_ROLLUP_SQL = f"""
WITH base AS (
  SELECT CASE WHEN event_type = 'error' THEN 40 ELSE 10 END AS severity,
         event_type, value
  FROM events
)
SELECT severity, event_type,
       CAST(GROUPING(severity, event_type) AS BIGINT) AS gid,
       COUNT(*) AS n,
       SUM({cents_sql('value')}) / 100.0 AS total_value
FROM base
GROUP BY ROLLUP (severity, event_type)
ORDER BY gid, severity, event_type
"""


# ----------------------------------------------- events_asof_join

def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks the latest view by the
    same user at or before its timestamp. Spark has no ASOF JOIN
    operator, so it is expressed as a union + last(ignorenulls) over
    a user-partitioned window — ONE shuffle on user_id, no range
    self-join blow-up; this is the composition that scales (a range
    join would be quadratic per user). Oracle uses DuckDB's native
    ASOF JOIN."""
    e = _events(spark, sf_dir)
    logins = e.where(F.col("event_type") == "view").select(
        "user_id",
        _US("ts").alias("us"),
        F.lit(0).alias("kind"),
        _US("ts").alias("login_us"),
        F.lit(None).cast("long").alias("event_id"),
    )
    targets = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        _US("ts").alias("us"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("login_us"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("us"), F.asc("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = logins.unionByName(targets).withColumn(
        "last_login_us", F.last("login_us", ignorenulls=True).over(w)
    )
    return joined.where(
        (F.col("kind") == 1) & F.col("last_login_us").isNotNull()
    ).select(
        "event_id",
        "user_id",
        F.col("us").alias("purchase_us"),
        "last_login_us",
        ((F.col("us") - F.col("last_login_us")) / F.lit(1000000.0)).alias(
            "secs_since_login"
        ),
    )


_EVENTS_ASOF_SQL = f"""
WITH p AS (
  SELECT event_id, user_id, {_US_SQL('ts')} AS purchase_us FROM events
  WHERE event_type = 'purchase'
), l AS (
  SELECT user_id, {_US_SQL('ts')} AS login_us FROM events
  WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id, p.purchase_us,
       l.login_us AS last_login_us,
       (p.purchase_us - l.login_us) / 1000000.0 AS secs_since_login
FROM p ASOF JOIN l
  ON p.user_id = l.user_id AND p.purchase_us >= l.login_us
"""


# ------------------------------------------ value_percentiles_by_type

_PCTS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))


def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linearly-interpolated percentiles of value per event
    type (ClickHouse quantile() surface). Interpolation is written
    out manually — rank window + conditional aggregation — with the
    identical operation order in both engines, because built-in
    percentile functions don't promise bit-identical float paths.
    Values are integer cents, so ranks and the lo/hi picks are
    exact; only the final interpolation is float."""
    e = _events(spark, sf_dir)
    t = e.select(F.col("event_type").alias("type"), cents(F.col("value")).alias("v"))
    wr = Window.partitionBy("type").orderBy("v")
    wn = Window.partitionBy("type")
    r = t.select(
        "type",
        "v",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    aggs, posts = [], []
    for label, p in _PCTS:
        lo_rn = F.expr(_pct_lo_rn(p))
        aggs.append(F.max(F.when(F.col("rn") == lo_rn, F.col("v"))).alias(f"{label}_lo"))
        aggs.append(
            F.max(F.when(F.col("rn") == lo_rn + 1, F.col("v"))).alias(f"{label}_hi")
        )
        posts.append(F.expr(_pct_interp(label, p)).alias(label))
    agg = r.groupBy("type", "n").agg(*aggs)
    return agg.select("type", F.col("n").alias("n_events"), *posts).orderBy("type")


# The interpolation expressions are the SAME SQL text in Spark and
# DuckDB, with every float operand cast to DOUBLE explicitly — both
# engines parse bare `0.5`/`100.0` literals as DECIMAL, and decimal
# vs double arithmetic rounds differently.

def _pct_idx(p: float) -> str:
    return f"(CAST(n - 1 AS DOUBLE) * CAST({p} AS DOUBLE))"


def _pct_lo_rn(p: float) -> str:
    return f"CAST(floor({_pct_idx(p)}) AS BIGINT) + 1"


def _pct_interp(label: str, p: float) -> str:
    idx = _pct_idx(p)
    hi = f"COALESCE({label}_hi, {label}_lo)"
    return (
        f"(CAST({label}_lo AS DOUBLE) + ({idx} - floor({idx}))"
        f" * CAST({hi} - {label}_lo AS DOUBLE)) / CAST(100 AS DOUBLE)"
    )


def _pct_sql() -> str:
    sel_agg, sel_post = [], []
    for label, p in _PCTS:
        lo_rn = _pct_lo_rn(p)
        sel_agg.append(f"MAX(CASE WHEN rn = {lo_rn} THEN v END) AS {label}_lo")
        sel_agg.append(f"MAX(CASE WHEN rn = {lo_rn} + 1 THEN v END) AS {label}_hi")
        sel_post.append(f"{_pct_interp(label, p)} AS {label}")
    return f"""
WITH t AS (
  SELECT event_type AS type, {cents_sql('value')} AS v FROM events
), r AS (
  SELECT type, v,
         ROW_NUMBER() OVER (PARTITION BY type ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY type) AS n
  FROM t
), agg AS (
  SELECT type, n, {', '.join(sel_agg)}
  FROM r GROUP BY type, n
)
SELECT type, n AS n_events, {', '.join(sel_post)}
FROM agg ORDER BY type
"""


_VALUE_PCT_SQL = _pct_sql()


# ------------------------------------------------ topk_events_by_value

def topk_events_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per event type — the per-group top-N
    window. row_number (not rank) with a unique-key tiebreak gives a
    total order, so the result set is engine-deterministic; the
    window partitions by type and distributes by key hash."""
    e = _events(spark, sf_dir)
    t = e.select(
        F.col("event_type").alias("type"),
        "event_id",
        cents(F.col("value")).alias("v_c"),
    )
    w = Window.partitionBy("type").orderBy(F.desc("v_c"), F.asc("event_id"))
    return (
        t.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
        .select("type", "event_id", (F.col("v_c") / F.lit(100.0)).alias("value"), "rnk")
        .orderBy("type", "rnk")
    )


_TOPK_BY_VALUE_SQL = f"""
WITH t AS (
  SELECT event_type AS type, event_id, {cents_sql('value')} AS v_c FROM events
), ranked AS (
  SELECT type, event_id, v_c,
         CAST(ROW_NUMBER() OVER (PARTITION BY type ORDER BY v_c DESC, event_id ASC) AS INT) AS rnk
  FROM t
)
SELECT type, event_id, v_c / 100.0 AS value, rnk
FROM ranked WHERE rnk <= 3 ORDER BY type, rnk
"""


# -------------------------------------------------- events_range_join

_RANGE_US = 300_000_000  # ±5 minutes


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: for each error event, count same-user events
    within ±5 minutes. Spark has no native interval join, so the
    distributed pattern is TIME-BUCKETING: the probe side explodes to
    its 3 covering buckets (width = the range), the build side maps
    to 1 bucket, the join runs as a plain equi-join on
    (user_id, bucket), and an exact |Δt| filter finishes. Each
    qualifying pair lands in exactly one bucket (width ≥ range ⇒ no
    dedup needed), and the shuffle is keyed on (user, bucket) — never
    the per-user cartesian a naive non-equi join degenerates to."""
    e = _events(spark, sf_dir)
    ev = e.select("user_id", "event_id", _US("ts").alias("us"))
    bucket = (F.col("us") / F.lit(_RANGE_US)).cast("long")
    probe = (
        e.where(F.col("event_type") == "error")
        .select("user_id", F.col("event_id").alias("err_id"), _US("ts").alias("err_us"))
        .withColumn("off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("bucket", (F.col("err_us") / F.lit(_RANGE_US)).cast("long") + F.col("off"))
    )
    build = ev.withColumn("bucket", bucket)
    pairs = probe.join(build, ["user_id", "bucket"]).where(
        (F.col("event_id") != F.col("err_id"))
        & (F.abs(F.col("us") - F.col("err_us")) <= _RANGE_US)
    )
    return (
        pairs.groupBy(F.col("err_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_nearby"))
        .orderBy("event_id")
    )


_RANGE_JOIN_SQL = f"""
SELECT e.event_id, COUNT(*) AS n_nearby
FROM events e
JOIN events x
  ON e.user_id = x.user_id
 AND x.event_id <> e.event_id
 AND abs(epoch_us(x.ts) - epoch_us(e.ts)) <= {_RANGE_US}
WHERE e.event_type = 'error'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------- user_retention_cohorts

def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen DAY, counted in
    each subsequent activity day (the events table spans ~a month).
    Two aggregations — first-seen (min per user) then cohort x day
    distinct counts — both map-side combinable; the cohort join
    broadcasts the tiny first-seen table at this SF and shuffles on
    user_id at 100 TB."""
    e = _events(spark, sf_dir)
    ymd = (F.year("ts") * 10000 + F.month("ts") * 100 + F.dayofmonth("ts")).cast("int")
    acts = e.select("user_id", ymd.alias("act_day"))
    first = acts.groupBy("user_id").agg(F.min("act_day").alias("cohort_day"))
    return (
        acts.distinct()
        .join(first, "user_id")
        .groupBy("cohort_day", "act_day")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "act_day")
    )


_RETENTION_SQL = """
WITH acts AS (
  SELECT user_id,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS INT) AS act_day
  FROM events
), first AS (
  SELECT user_id, MIN(act_day) AS cohort_day FROM acts GROUP BY 1
)
SELECT cohort_day, act_day, COUNT(DISTINCT a.user_id) AS n_users
FROM (SELECT DISTINCT user_id, act_day FROM acts) a
JOIN first USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------- events_running_windows

def events_running_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total and trailing-1h range-frame windows per user:
    cumulative value sum (rows frame) and event count in the
    preceding hour (range frame on epoch-µs). Both partition by
    user_id — at scale these distribute by key hash with no global
    ordering anywhere."""
    e = _events(spark, sf_dir)
    t = e.select(
        "user_id",
        "event_id",
        _US("ts").alias("us"),
        cents(F.col("value")).alias("v_c"),
    )
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("us"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("us"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return t.select(
        "user_id",
        "event_id",
        "us",
        (F.sum("v_c").over(w_rows) / F.lit(100.0)).alias("running_total"),
        F.count(F.lit(1)).over(w_range).alias("events_last_hour"),
    )


_EVENTS_RUNNING_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, {_US_SQL('ts')} AS us,
         {cents_sql('value')} AS v_c
  FROM events
)
SELECT user_id, event_id, us,
       SUM(v_c) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
                      ROWS UNBOUNDED PRECEDING) / 100.0 AS running_total,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY us ASC
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         AS events_last_hour
FROM t
"""


# ------------------------------------------------------ events_cube

def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over severity × event_type — all four grouping sets
    in one pass (Spark expands to a single expand+aggregate, not four
    scans)."""
    e = _events(spark, sf_dir)
    return (
        e.select(_sev().cast("int").alias("severity"), "event_type", "value")
        .cube("severity", "event_type")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents(F.col("value"))) / F.lit(100.0)).alias("total_value"),
        )
        .orderBy("gid", "severity", "event_type")
    )


_EVENTS_CUBE_SQL = f"""
WITH base AS (
  SELECT CAST({_SEV_SQL} AS INT) AS severity, event_type, value FROM events
)
SELECT severity, event_type,
       CAST(GROUPING(severity, event_type) AS BIGINT) AS gid,
       COUNT(*) AS n,
       SUM({cents_sql('value')}) / 100.0 AS total_value
FROM base
GROUP BY CUBE (severity, event_type)
ORDER BY gid, severity, event_type
"""


# --------------------------------------------- events_decay_score

_DECAY_WINDOW_DAYS = 7  # halving per day; weight 2^(W-delta) exact


def events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-decayed activity score (halflife = 1
    day, 7-day horizon) — the `exponentialMovingAverage` /
    `exponentialTimeDecayedSum` analog, ClickHouse's freshness-
    weighted engagement metric.

    Determinism: weights are powers of two (2^(7-Δd)) applied to
    integer counts/cents, summed in BIGINT, divided ONCE by 128 at
    the end — no float accumulation anywhere, so shuffle order can't
    flip bits. Scale shape: instead of a per-row variable-weight
    window frame (which Spark's range frames can't weight), each
    user-day aggregate is exploded to its ≤8 future contribution
    days (bounded 8× fan-out, in-row), then re-aggregated with
    map-side combine — two shuffles on (user, day), no window at all.
    """
    e = _events(spark, sf_dir)
    W = _DECAY_WINDOW_DAYS
    day = F.floor(_US("ts") / F.lit(86_400_000_000.0)).cast("long")
    per_day = (
        e.select(F.col("user_id"), day.alias("daynum"), cents(F.col("value")).alias("vc"))
        .groupBy("user_id", "daynum")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("vc").alias("vsum_c"))
    )
    bounds = per_day.agg(F.max("daynum").alias("max_day"))
    contrib = (
        per_day.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.expr(f"sequence(0, {W})")).alias("off"),
            "daynum", "cnt", "vsum_c", "max_day",
        )
        .select(
            "user_id",
            (F.col("daynum") + F.col("off")).alias("day"),
            (F.col("cnt") * F.expr(f"CAST(shiftleft(1, {W} - off) AS BIGINT)")).alias("wcnt"),
            (F.col("vsum_c") * F.expr(f"CAST(shiftleft(1, {W} - off) AS BIGINT)")).alias("wval"),
            "max_day",
        )
        .where(F.col("day") <= F.col("max_day"))
    )
    scale = float(1 << W)
    return contrib.groupBy("user_id", "day").agg(
        (F.sum("wcnt") / F.lit(scale)).alias("decayed_events"),
        (F.sum("wval") / F.lit(scale * 100.0)).alias("decayed_value"),
    )


_DECAY_SQL = f"""
WITH per_day AS (
  SELECT user_id,
         CAST(FLOOR({_US_SQL('ts')} / 86400000000.0) AS BIGINT) AS daynum,
         COUNT(*) AS cnt,
         SUM({cents_sql('value')}) AS vsum_c
  FROM events GROUP BY 1, 2
), bounds AS (SELECT MAX(daynum) AS max_day FROM per_day),
contrib AS (
  SELECT user_id,
         daynum + off AS day,
         cnt * CAST(1 << ({_DECAY_WINDOW_DAYS} - off) AS BIGINT) AS wcnt,
         vsum_c * CAST(1 << ({_DECAY_WINDOW_DAYS} - off) AS BIGINT) AS wval
  FROM per_day, bounds,
       (SELECT unnest(generate_series(0, {_DECAY_WINDOW_DAYS})) AS off) offs
  WHERE daynum + off <= max_day
)
SELECT user_id, day,
       SUM(wcnt) / {float(1 << _DECAY_WINDOW_DAYS)} AS decayed_events,
       SUM(wval) / {float((1 << _DECAY_WINDOW_DAYS) * 100)} AS decayed_value
FROM contrib GROUP BY 1, 2
"""


# -------------------------------------------- user_recent_events

_RECENT_N = 5


def user_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-history array (most recent 5) — the
    `groupArray(5)` / `argMax`-list analog ClickHouse dashboards use
    for "last actions" panels.

    Determinism: the order is (ts DESC, event_id DESC) — a total
    order — and the array is rebuilt from a sorted struct collect, so
    shuffle arrival order can't permute it. Scale shape: one shuffle
    on user_id; the per-user top-N is a row_number window (bounded
    state per key), then the array build is in-group."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _RECENT_N)
    )
    # The history is emitted as a '|'-joined STRING, not an array:
    # the driver's canonicalizer sorts result rows with pandas, and a
    # numpy-array cell is unhashable there — same information, hashable.
    return recent.groupBy("user_id").agg(
        F.concat_ws(
            "|",
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s.event_type,
            ),
        ).alias("recent_types"),
        F.max(_US("ts")).alias("last_ts_us"),
        F.count(F.lit(1)).alias("n_recent"),
    )


_RECENT_SQL = f"""
WITH ranked AS (
  SELECT user_id, event_type, {_US_SQL('ts')} AS ts_us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       string_agg(event_type, '|' ORDER BY rn ASC) AS recent_types,
       MAX(ts_us) AS last_ts_us,
       COUNT(*) AS n_recent
FROM ranked WHERE rn <= {_RECENT_N}
GROUP BY 1
"""


# ----------------------------------------------- churned_users

def churned_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active in the FIRST week of the data window with no
    activity in the LAST week — the churn cut, expressed as a set
    EXCEPT (ClickHouse `IN`/`NOT IN` subquery surface).

    The week bounds derive from the global max day so the operator is
    data-driven, not calendar-hardcoded. Scale shape: two filtered
    distinct projections (map-side combinable) and one left-anti
    join keyed on user_id — Catalyst turns EXCEPT DISTINCT into
    exactly that; no window, no sort."""
    e = _events(spark, sf_dir)
    day = F.floor(_US("ts") / F.lit(86_400_000_000.0)).cast("long")
    d = e.select("user_id", day.alias("daynum"))
    bounds = d.agg(
        F.min("daynum").alias("min_day"), F.max("daynum").alias("max_day")
    )
    withb = d.crossJoin(F.broadcast(bounds))
    first_week = (
        withb.where(F.col("daynum") < F.col("min_day") + 7)
        .select("user_id").distinct()
    )
    last_week = (
        withb.where(F.col("daynum") > F.col("max_day") - 7)
        .select("user_id").distinct()
    )
    # subtract == EXCEPT DISTINCT: both inputs are already distinct,
    # and it compiles to a left-anti join (exceptAll would build the
    # union + signed-count + replicaterows plan — strictly worse here).
    return first_week.subtract(last_week).select("user_id")


_CHURN_SQL = """
WITH d AS (
  SELECT user_id,
         CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS daynum
  FROM events
), bounds AS (SELECT MIN(daynum) AS min_day, MAX(daynum) AS max_day FROM d)
SELECT DISTINCT user_id FROM d, bounds WHERE daynum < min_day + 7
EXCEPT
SELECT DISTINCT user_id FROM d, bounds WHERE daynum > max_day - 7
"""


# ------------------------------------------ events_unpivot_measures

def events_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-type aggregate melted to long (metric, value) form —
    the UNPIVOT surface, the shape metric stores and plotting layers
    want. The melt is an in-row `stack` generator (no shuffle beyond
    the aggregate's own); value semantics stay exact-integer until
    one final /100.0."""
    e = _events(spark, sf_dir)
    wide = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        F.max(cents(F.col("value"))).cast("double").alias("max_value_c"),
    )
    return wide.selectExpr(
        "event_type",
        "stack(3, 'n_events', n_events, 'total_value', total_value, "
        "'max_value_c', max_value_c) AS (metric, value)",
    )


_UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n_events,
         SUM({cents_sql('value')}) / 100.0 AS total_value,
         CAST(MAX({cents_sql('value')}) AS DOUBLE) AS max_value_c
  FROM events GROUP BY 1
)
SELECT event_type, 'n_events' AS metric, n_events AS value FROM wide
UNION ALL
SELECT event_type, 'total_value', total_value FROM wide
UNION ALL
SELECT event_type, 'max_value_c', max_value_c FROM wide
"""


# -------------------------------------------- events_dow_hour_heatmap

def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap — the standard ops
    dashboard rollup. Day-of-week comes from pure epoch arithmetic
    ((epoch_days + 4) % 7, 0 = Sunday; 1970-01-01 was a Thursday)
    instead of engine dayofweek() functions, whose numbering
    conventions differ between engines. One map-side-combined
    aggregate to a ≤168-row result."""
    e = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    day_us = 86_400_000_000
    return (
        e.select(
            (((us / F.lit(day_us)).cast("long") + 4) % 7).alias("dow"),
            ((us % day_us) / F.lit(3_600_000_000)).cast("long").alias("hour"),
            cents(F.col("value")).alias("v_c"),
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("v_c").cast("double") / F.lit(100.0)).alias("total_value"),
        )
    )


_DOW_HEATMAP_SQL = f"""
WITH t AS (
  SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
         (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
         {cents_sql('value')} AS v_c
  FROM events
)
SELECT dow, hour, COUNT(*) AS n,
       CAST(SUM(v_c) AS DOUBLE) / 100.0 AS total_value
FROM t GROUP BY 1, 2
"""


# ---------------------------------------------- error_run_lengths

def error_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-error runs per user (the
    'how long did the machine stay broken' diagnostic). Island key =
    rn_all − rn_errors over the same (us, event_id) total order — the
    classic two-window difference trick; both windows partition by
    user, so nothing orders globally. Output per user: run count,
    longest run, total errors (longest ≤ total conservation is
    pytest-asserted)."""
    e = _events(spark, sf_dir)
    t = e.select(
        "user_id",
        "event_id",
        _US("ts").alias("us"),
        (F.col("event_type") == "error").alias("is_err"),
    )
    w_all = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    w_err = Window.partitionBy("user_id", "is_err").orderBy(
        F.asc("us"), F.asc("event_id")
    )
    runs = (
        t.withColumn("grp", F.row_number().over(w_all) - F.row_number().over(w_err))
        .where(F.col("is_err"))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_error_runs"),
        F.max("run_len").alias("max_run_len"),
        F.sum("run_len").alias("total_errors"),
    )


_ERROR_RUNS_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, {_US_SQL('ts')} AS us,
         event_type = 'error' AS is_err
  FROM events
), g AS (
  SELECT user_id, is_err,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY us ASC, event_id ASC)
         - ROW_NUMBER() OVER (PARTITION BY user_id, is_err
                              ORDER BY us ASC, event_id ASC) AS grp
  FROM t
), runs AS (
  SELECT user_id, grp, COUNT(*) AS run_len
  FROM g WHERE is_err GROUP BY 1, 2
)
SELECT user_id, COUNT(*) AS n_error_runs, MAX(run_len) AS max_run_len,
       CAST(SUM(run_len) AS BIGINT) AS total_errors
FROM runs GROUP BY 1
"""


# -------------------------------------------- user_first_last_event

def user_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE surface: each user's first and last
    event type plus activity span — the session-bookend projection.
    Both bookends come from one ascending row_number window (last =
    conditional max on the reversed rank), so one keyed sort serves
    both; the aggregate is one row per user."""
    e = _events(spark, sf_dir)
    t = e.select("user_id", "event_id", _US("ts").alias("us"), "event_type")
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    ranked = t.select(
        "user_id",
        "us",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    return ranked.groupBy("user_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("first_type"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("event_type"))).alias(
            "last_type"
        ),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
        F.max("n").alias("n_events"),
        (F.max("us") - F.min("us")).alias("span_us"),
    )


_FIRST_LAST_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, {_US_SQL('ts')} AS us, event_type FROM events
), ranked AS (
  SELECT user_id, us, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY us ASC, event_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM t
)
SELECT user_id,
       MAX(CASE WHEN rn = 1 THEN event_type END) AS first_type,
       MAX(CASE WHEN rn = n THEN event_type END) AS last_type,
       MIN(us) AS first_us, MAX(us) AS last_us,
       MAX(n) AS n_events, MAX(us) - MIN(us) AS span_us
FROM ranked GROUP BY 1
"""


QUERIES = {
    "trace_normalize": trace_normalize,
    "trace_partition_stats": trace_partition_stats,
    "severity_rollup": severity_rollup,
    "events_per_minute": events_per_minute,
    "top_event_types": top_event_types,
    "error_rate_by_user": error_rate_by_user,
    "events_dedup_latest": events_dedup_latest,
    "event_sessionization": event_sessionization,
    "json_extract_props": json_extract_props,
    "user_activity_gap": user_activity_gap,
    "events_rollup_cube": events_rollup_cube,
    "events_asof_join": events_asof_join,
    "value_percentiles_by_type": value_percentiles_by_type,
    "events_cube": events_cube,
    "events_running_windows": events_running_windows,
    "user_retention_cohorts": user_retention_cohorts,
    "events_range_join": events_range_join,
    "topk_events_by_value": topk_events_by_value,
    "events_decay_score": events_decay_score,
    "user_recent_events": user_recent_events,
    "churned_users": churned_users,
    "events_unpivot_measures": events_unpivot_measures,
    "events_dow_hour_heatmap": events_dow_hour_heatmap,
    "error_run_lengths": error_run_lengths,
    "user_first_last_event": user_first_last_event,
}

ORACLE = {
    "trace_normalize": _TRACE_NORMALIZE_SQL,
    "trace_partition_stats": _TRACE_PARTITION_STATS_SQL,
    "severity_rollup": _SEVERITY_ROLLUP_SQL,
    "events_per_minute": _EVENTS_PER_MINUTE_SQL,
    "top_event_types": _TOP_EVENT_TYPES_SQL,
    "error_rate_by_user": _ERROR_RATE_SQL,
    "events_dedup_latest": _EVENTS_DEDUP_LATEST_SQL,
    "event_sessionization": _EVENT_SESSIONIZATION_SQL,
    "json_extract_props": _JSON_EXTRACT_PROPS_SQL,
    "user_activity_gap": _USER_ACTIVITY_GAP_SQL,
    "events_rollup_cube": _EVENTS_ROLLUP_SQL,
    "events_asof_join": _EVENTS_ASOF_SQL,
    "value_percentiles_by_type": _VALUE_PCT_SQL,
    "events_cube": _EVENTS_CUBE_SQL,
    "events_running_windows": _EVENTS_RUNNING_SQL,
    "user_retention_cohorts": _RETENTION_SQL,
    "events_range_join": _RANGE_JOIN_SQL,
    "topk_events_by_value": _TOPK_BY_VALUE_SQL,
    "events_decay_score": _DECAY_SQL,
    "user_recent_events": _RECENT_SQL,
    "churned_users": _CHURN_SQL,
    "events_unpivot_measures": _UNPIVOT_SQL,
    "events_dow_hour_heatmap": _DOW_HEATMAP_SQL,
    "error_run_lengths": _ERROR_RUNS_SQL,
    "user_first_last_event": _FIRST_LAST_SQL,
}
