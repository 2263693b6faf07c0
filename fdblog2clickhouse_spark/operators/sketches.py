"""Sketch / approximate aggregates over `events` (SURVEY §2.1 ext).

ClickHouse exposes `uniq`/`topK`/`histogram` sketch aggregates as
first-class OLAP surface (the reference's README promises "traditional
OLAP SQL queries" over the ingested trace table — reference
README.md:10); at 100 TB these sketches are how distinct counts and
heavy hitters stay one-pass and bounded-memory. Spark has
approx_count_distinct (HLL++) built in, but its register layout is
engine-private and cannot be oracle-checked, so these operators build
the sketches from the md5-derived `h32` hash primitive
(functions/hashing.py) — bit-identical in Spark and DuckDB:

- `hll_distinct_users`: classic HyperLogLog, m=64 registers. The
  register table is ONE hash-aggregate (max per bucket) — map-side
  combine reduces the shuffle to ≤64 rows per type per partition, so
  at 100 TB the shuffle carries registers, not users. The harmonic
  sum is kept EXACT by scaling 2^-rho to the integer 2^(27-rho)
  (rho ≤ 27), so no floating summation order exists; only the final
  single division is floating point (IEEE-deterministic).
- `cms_heavy_hitters`: count-min sketch, d=4 rows × w=256 buckets of
  exact integer counts (4 cells per item via one posexplode; the
  sketch build is a single group-by whose output is ≤1024 rows
  regardless of input size). Point-estimate = min over the item's 4
  cells, overestimate by construction; reported next to the exact
  count so the error is visible.
- `value_histogram`: fixed-width binning (floor(value/width)) —
  ClickHouse `histogram()` analog with deterministic bin edges;
  count + exact-integer value sums per bin.
- `minute_anomaly_zscore`: per-minute event counts scored against
  their type's mean/stddev. Moments are exact BIGINT sums (n, Σc,
  Σc²); z = (c·n − Σc) / sqrt(n·Σc² − (Σc)²) — integer numerator and
  radicand, ONE division and ONE sqrt, both IEEE-exact, so the score
  hash-matches DuckDB bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import h32, h32_sql
from ..sources.tables import table

# ------------------------------------------------ hll_distinct_users

_HLL_P = 6  # 64 registers
_HLL_M = 1 << _HLL_P
_HLL_W = 32 - _HLL_P  # 26 remaining hash bits
_HLL_RHO_MAX = _HLL_W + 1  # 27: all-zero remainder
_HLL_SCALE = 1 << _HLL_RHO_MAX  # integer image of 2^-0 = 1
# alpha_64 * m^2 * 2^27 == 0.709 * 4096 * 134217728; the two integer
# factors are pre-multiplied so both engines evaluate the identical
# (0.709 * 549755813888) double product.
_HLL_NUM = "0.709 * 549755813888"


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL distinct-user estimate next to the exact
    count. Registers: bucket = h & 63, rho = leading-zeros+1 of the
    remaining 26 bits (via bit-width: rho = 27 - length(bin(rem)))."""
    e = table(spark, sf_dir, "events")
    hashed = e.select(
        "event_type", h32(F.col("user_id").cast("string")).alias("h")
    )
    regs = (
        hashed.select(
            "event_type",
            (F.col("h") % _HLL_M).alias("bucket"),
            F.shiftright("h", _HLL_P).alias("rem"),
        )
        .select(
            "event_type",
            "bucket",
            F.when(F.col("rem") == 0, F.lit(_HLL_RHO_MAX))
            .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin("rem")))
            .alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    per_type = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - m)")).alias(
            "s_present"
        ),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_uniques")
    )
    est = per_type.select(
        "event_type",
        (F.lit(_HLL_M) - F.col("present")).alias("zero_registers"),
        F.round(
            F.expr(
                f"({_HLL_NUM}) / CAST(s_present + ({_HLL_M} - present) * {_HLL_SCALE} AS DOUBLE)"
            ),
            3,
        ).alias("hll_est"),
    )
    return exact.join(est, "event_type").select(
        "event_type", "exact_uniques", "hll_est", "zero_registers"
    )


_HLL_SQL = f"""
WITH hashed AS (
  SELECT event_type, {h32_sql("CAST(user_id AS VARCHAR)")} AS h FROM events
), regs AS (
  SELECT event_type, h % {_HLL_M} AS bucket,
         MAX(CASE WHEN (h >> {_HLL_P}) = 0 THEN {_HLL_RHO_MAX}
                  ELSE {_HLL_RHO_MAX} - length(bin(h >> {_HLL_P})) END) AS m
  FROM hashed GROUP BY 1, 2
), per_type AS (
  SELECT event_type, COUNT(*) AS present,
         SUM((1::BIGINT << ({_HLL_RHO_MAX} - m))) AS s_present
  FROM regs GROUP BY 1
), exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_uniques FROM events GROUP BY 1
)
SELECT e.event_type, e.exact_uniques,
       ROUND(({_HLL_NUM}) / CAST(s_present + ({_HLL_M} - present) * {_HLL_SCALE} AS DOUBLE), 3) AS hll_est,
       {_HLL_M} - present AS zero_registers
FROM exact e JOIN per_type p USING (event_type)
"""


# ------------------------------------------------ cms_heavy_hitters

_CMS_D = 4
_CMS_W = 256


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point estimates for every event type, next to
    the exact counts. The sketch is ≤ d·w = 1024 exact-integer cells
    built in one group-by — at 100 TB the shuffle moves the sketch,
    never the stream. AQE broadcasts the tiny cell table into the
    lookup join."""
    e = table(spark, sf_dir, "events")
    rows = F.array(*[F.lit(r) for r in range(_CMS_D)])
    cells = (
        e.select("event_type")
        .select("event_type", F.explode(rows).alias("r"))
        .select(
            "r",
            (h32(F.concat(F.col("r").cast("string"), F.lit("|"), F.col("event_type"))) % _CMS_W).alias("bucket"),
        )
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    items = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .select("event_type", "exact_count", F.explode(rows).alias("r"))
        .select(
            "event_type",
            "exact_count",
            "r",
            (h32(F.concat(F.col("r").cast("string"), F.lit("|"), F.col("event_type"))) % _CMS_W).alias("bucket"),
        )
    )
    return (
        items.join(cells, ["r", "bucket"])
        .groupBy("event_type", "exact_count")
        .agg(F.min("c").alias("cms_est"))
        .select("event_type", "exact_count", "cms_est")
    )


_CMS_SQL = f"""
WITH ks AS (
  SELECT event_type, r, {h32_sql("CAST(r AS VARCHAR) || '|' || event_type")} % {_CMS_W} AS bucket
  FROM events, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS r)
), cells AS (
  SELECT r, bucket, COUNT(*) AS c FROM ks GROUP BY 1, 2
), items AS (
  SELECT event_type, COUNT(*) AS exact_count FROM events GROUP BY 1
), lookup AS (
  SELECT i.event_type, i.exact_count, r,
         {h32_sql("CAST(r AS VARCHAR) || '|' || i.event_type")} % {_CMS_W} AS bucket
  FROM items i, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS r)
)
SELECT l.event_type, l.exact_count, MIN(c.c) AS cms_est
FROM lookup l JOIN cells c USING (r, bucket)
GROUP BY 1, 2
"""


# -------------------------------------------------- value_histogram

_BIN_WIDTH = 10


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (ClickHouse
    histogram() with deterministic edges). Bin sums are exact integer
    cents divided back to DOUBLE at the end."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.floor(F.col("value") / _BIN_WIDTH).cast("long").alias("bin"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("cents").cast("double") / 100.0).alias("sum_value"),
        )
        .select(
            "event_type",
            (F.col("bin") * _BIN_WIDTH).cast("double").alias("bin_lo"),
            "n",
            "sum_value",
        )
    )


_HISTOGRAM_SQL = f"""
SELECT event_type,
       CAST(CAST(FLOOR(value / {_BIN_WIDTH}) AS BIGINT) * {_BIN_WIDTH} AS DOUBLE) AS bin_lo,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------- minute_anomaly_zscore

_Z_MIN = 2.0


def minute_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag minutes whose event count is ≥ 2σ from the type's mean.
    Population moments are exact BIGINT sums; the z-score is a single
    integer-ratio division plus one sqrt, so the doubles are
    bit-identical across engines. Two narrow shuffles: minute counts
    (map-side combined), then ≤|types| stat rows broadcast back."""
    e = table(spark, sf_dir, "events")
    mc = (
        e.select(
            "event_type",
            F.unix_micros(F.date_trunc("minute", F.col("ts"))).alias("minute_us"),
        )
        .groupBy("event_type", "minute_us")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = mc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    joined = mc.join(stats, "event_type").where(
        (F.col("n") > 1) & (F.col("s2") * F.col("n") - F.col("s") * F.col("s") > 0)
    )
    z = F.expr("CAST(c * n - s AS DOUBLE) / sqrt(CAST(s2 * n - s * s AS DOUBLE))")
    return (
        joined.select(
            "event_type", "minute_us", "c", F.round(z, 4).alias("zscore")
        )
        .where(F.abs(F.col("zscore")) >= _Z_MIN)
    )


_ANOMALY_SQL = f"""
WITH mc AS (
  SELECT event_type, epoch_us(date_trunc('minute', ts)) AS minute_us, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS s2
  FROM mc GROUP BY 1
)
SELECT event_type, minute_us, c,
       ROUND(CAST(c * n - s AS DOUBLE) / sqrt(CAST(s2 * n - s * s AS DOUBLE)), 4) AS zscore
FROM mc JOIN stats USING (event_type)
WHERE n > 1 AND s2 * n - s * s > 0
  AND abs(CAST(c * n - s AS DOUBLE) / sqrt(CAST(s2 * n - s * s AS DOUBLE))) >= {_Z_MIN}
"""


# ------------------------------------------------ value_quantile_hist

_QH_WIDTH = 2.0  # bin width; value domain is ~[0, 500]
_QH_QS = (0.5, 0.9, 0.99)


def value_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles per event type: p50/p90/p99
    estimated by linear interpolation inside a fixed-width bin
    histogram — the one-pass bounded-memory quantile path (ClickHouse
    `quantile*`-sketch analog; the exact-rank operator
    `value_percentiles_by_type` is the slow-exact sibling).

    Scale shape: ONE map-side-combined aggregate to bin counts
    (shuffle is O(types × bins), independent of row count), then
    windows over the tiny bin table. Compare: exact percentiles
    need a full sort-shuffle of the data. Estimate arithmetic is a
    fixed double expression evaluated identically in both engines."""
    e = table(spark, sf_dir, "events")
    bins = (
        e.select(
            "event_type",
            F.floor(F.col("value") / _QH_WIDTH).cast("long").alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    cum = bins.select(
        "event_type",
        "b",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_tot).alias("tot"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in _QH_QS])).alias("q")
    hit = cum.select("*", qs).where(
        F.col("cum") >= F.col("q") * F.col("tot").cast("double")
    )
    w_first = Window.partitionBy("event_type", "q").orderBy("b")
    est = F.expr(
        f"round(b * {_QH_WIDTH} + {_QH_WIDTH} * "
        "((q * CAST(tot AS DOUBLE)) - CAST(cum - c AS DOUBLE)) / CAST(c AS DOUBLE), 4)"
    )
    return (
        hit.withColumn("rn", F.row_number().over(w_first))
        .where(F.col("rn") == 1)
        .select("event_type", "q", est.alias("est_quantile"))
    )


_QUANTILE_HIST_SQL = f"""
WITH bins AS (
  SELECT event_type, CAST(FLOOR(value / {_QH_WIDTH}) AS BIGINT) AS b, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, b, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY b
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS tot
  FROM bins
), hit AS (
  SELECT cum.*, q
  FROM cum, (SELECT unnest([{', '.join(f"CAST({q} AS DOUBLE)" for q in _QH_QS)}]) AS q)
  WHERE cum >= q * CAST(tot AS DOUBLE)
), first_hit AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, q ORDER BY b) AS rn
  FROM hit
)
SELECT event_type, q,
       round(b * {_QH_WIDTH} + {_QH_WIDTH} *
             ((q * CAST(tot AS DOUBLE)) - CAST(cum - c AS DOUBLE)) / CAST(c AS DOUBLE), 4)
         AS est_quantile
FROM first_hit WHERE rn = 1
"""


QUERIES = {
    "hll_distinct_users": hll_distinct_users,
    "cms_heavy_hitters": cms_heavy_hitters,
    "value_histogram": value_histogram,
    "minute_anomaly_zscore": minute_anomaly_zscore,
    "value_quantile_hist": value_quantile_hist,
}

ORACLE = {
    "hll_distinct_users": _HLL_SQL,
    "cms_heavy_hitters": _CMS_SQL,
    "value_histogram": _HISTOGRAM_SQL,
    "minute_anomaly_zscore": _ANOMALY_SQL,
    "value_quantile_hist": _QUANTILE_HIST_SQL,
}
