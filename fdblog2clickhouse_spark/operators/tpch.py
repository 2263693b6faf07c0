"""OLAP SQL query surface over the star schema — adapted TPC-H.

The reference's end goal is querying ingested operational data "using
traditional OLAP SQL queries" (reference README.md:10,139); this
module is that query surface, exercised on the TPC-H-ish testdata.
Queries are adapted to the available schema (no partsupp table; date
range 1995-01..2001-11) and written DataFrame-first so Catalyst
handles pushdown/pruning; every dimension join is explicitly
broadcast, fact-fact joins shuffle on key under AQE.

Money arithmetic uses exact integer scaling (functions/hashing.py)
so Spark and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.hashing import cents, cents_sql
from ..sources.tables import table


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


# ------------------------------------------------------------------ q1

def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    pre = l.where(F.col("l_shipdate") <= _ts("2001-09-02")).select(
        "l_returnflag",
        "l_linestatus",
        cents(F.col("l_quantity")).alias("qty_c"),
        cents(F.col("l_extendedprice")).alias("ep_c"),
        cents(F.col("l_discount")).alias("disc_c"),
        cents(F.col("l_tax")).alias("tax_c"),
    )
    agg = pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty_c").alias("sum_qty_c"),
        F.sum("ep_c").alias("sum_ep_c"),
        F.sum(F.col("ep_c") * (F.lit(100) - F.col("disc_c"))).alias("sum_disc_c"),
        F.sum(
            F.col("ep_c")
            * (F.lit(100) - F.col("disc_c"))
            * (F.lit(100) + F.col("tax_c"))
        ).alias("sum_charge_c"),
        F.sum("disc_c").alias("sum_do_c"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("sum_qty_c") / F.lit(100.0)).alias("sum_qty"),
        (F.col("sum_ep_c") / F.lit(100.0)).alias("sum_base_price"),
        (F.col("sum_disc_c") / F.lit(10000.0)).alias("sum_disc_price"),
        (F.col("sum_charge_c") / F.lit(1000000.0)).alias("sum_charge"),
        (F.col("sum_qty_c") / F.col("count_order") / F.lit(100.0)).alias("avg_qty"),
        (F.col("sum_ep_c") / F.col("count_order") / F.lit(100.0)).alias("avg_price"),
        (F.col("sum_do_c") / F.col("count_order") / F.lit(100.0)).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


_Q1_SQL = f"""
WITH pre AS (
  SELECT l_returnflag, l_linestatus,
         {cents_sql('l_quantity')} AS qty_c,
         {cents_sql('l_extendedprice')} AS ep_c,
         {cents_sql('l_discount')} AS disc_c,
         {cents_sql('l_tax')} AS tax_c
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2001-09-02'
), agg AS (
  SELECT l_returnflag, l_linestatus,
         SUM(qty_c) AS sum_qty_c,
         SUM(ep_c) AS sum_ep_c,
         SUM(ep_c * (100 - disc_c)) AS sum_disc_c,
         SUM(ep_c * (100 - disc_c) * (100 + tax_c)) AS sum_charge_c,
         SUM(disc_c) AS sum_do_c,
         COUNT(*) AS count_order
  FROM pre GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       sum_qty_c / 100.0 AS sum_qty,
       sum_ep_c / 100.0 AS sum_base_price,
       sum_disc_c / 10000.0 AS sum_disc_price,
       sum_charge_c / 1000000.0 AS sum_charge,
       sum_qty_c / count_order / 100.0 AS avg_qty,
       sum_ep_c / count_order / 100.0 AS avg_price,
       sum_do_c / count_order / 100.0 AS avg_disc,
       count_order
FROM agg ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------------ q6

def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scan+filter+agg: the pushdown showcase. All three predicates and
    # the 3-column projection reach the parquet scan.
    l = table(spark, sf_dir, "lineitem")
    revenue_c = F.sum(
        cents(F.col("l_extendedprice")) * cents(F.col("l_discount"))
    ).alias("revenue_c")
    return (
        l.where(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(revenue_c)
        .select((F.coalesce(F.col("revenue_c"), F.lit(0)) / F.lit(10000.0)).alias("revenue"))
    )


_Q6_SQL = f"""
SELECT COALESCE(SUM({cents_sql('l_extendedprice')} * {cents_sql('l_discount')}), 0) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


QUERIES = {
    "tpch_q1": tpch_q1,
    "tpch_q6": tpch_q6,
}

ORACLE = {
    "tpch_q1": _Q1_SQL,
    "tpch_q6": _Q6_SQL,
}
