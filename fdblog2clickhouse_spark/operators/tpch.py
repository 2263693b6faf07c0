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

from pyspark.sql import DataFrame, SparkSession, Window
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


# ------------------------------------------------------------------ q3

def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority. customer is a dim → broadcast; orders⋈lineitem
    is the fact-fact shuffle join (AQE handles skew). Top-10 with a
    total-order tiebreak so the result set is engine-deterministic."""
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < _ts("1998-06-15"))
    l = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > _ts("1998-06-15"))
    joined = l.join(o, l.l_orderkey == o.o_orderkey).join(
        broadcast(c), o.o_custkey == c.c_custkey
    )
    agg = joined.groupBy(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    ).agg(
        F.sum(
            cents(F.col("l_extendedprice")) * (F.lit(100) - cents(F.col("l_discount")))
        ).alias("rev_c")
    )
    return (
        agg.select(
            "l_orderkey",
            (F.col("rev_c") / F.lit(10000.0)).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = f"""
WITH agg AS (
  SELECT l_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         o_orderpriority,
         SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS rev_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-06-15'
    AND l_shipdate > TIMESTAMP '1998-06-15'
  GROUP BY 1, 2, 3
)
SELECT l_orderkey, rev_c / 10000.0 AS revenue, o_orderdate, o_orderpriority
FROM agg ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
"""


# ------------------------------------------------------------------ q4

def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority checking. The reference data model has no
    commit/receipt dates, so "late" ≙ a lineitem shipped >60 days
    after the order date. LEFT SEMI join keeps the probe side lean."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    l = table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------------------ q5

def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join. All four dims broadcast;
    the only shuffle is orders⋈lineitem."""
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    l = table(spark, sf_dir, "lineitem")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    agg = joined.groupBy("n_name").agg(
        F.sum(
            cents(F.col("l_extendedprice")) * (F.lit(100) - cents(F.col("l_discount")))
        ).alias("rev_c")
    )
    return agg.select("n_name", (F.col("rev_c") / F.lit(10000.0)).alias("revenue")).orderBy(
        F.desc("revenue"), F.asc("n_name")
    )


_Q5_SQL = f"""
WITH agg AS (
  SELECT n_name,
         SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS rev_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY 1
)
SELECT n_name, rev_c / 10000.0 AS revenue
FROM agg ORDER BY revenue DESC, n_name ASC
"""


# ------------------------------------------------------------------ q9

def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit by nation and year, adapted: no partsupp,
    so cost = 60% of p_retailprice (exact integer cents: rev_c -
    qty_c*cost_c terms stay in BIGINT). part/supplier/nation
    broadcast; the only shuffle is lineitem⋈orders + the final
    group-by."""
    p = table(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    s = table(spark, sf_dir, "supplier")
    nn = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    joined = (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(nn), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
    )
    # amount in 1e-6 units — PURE BIGINT so the sum is order-free:
    # rev_c (1e-4 scale) * 100  -  qty_c*cost_c (1e-4 scale) * 60
    amount = (
        cents(F.col("l_extendedprice"))
        * (F.lit(100) - cents(F.col("l_discount")))
        * F.lit(100)
        - cents(F.col("l_quantity")) * cents(F.col("p_retailprice")) * F.lit(60)
    )
    agg = joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(F.sum(amount).alias("profit_c"))
    return agg.select(
        "nation", "o_year", (F.col("profit_c") / F.lit(1000000.0)).alias("sum_profit")
    ).orderBy("nation", F.desc("o_year"))


_Q9_SQL = f"""
WITH agg AS (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')}) * 100
             - {cents_sql('l_quantity')} * {cents_sql('p_retailprice')} * 60) AS profit_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_name LIKE '%red%'
  GROUP BY 1, 2
)
SELECT nation, o_year, profit_c / 1000000.0 AS sum_profit
FROM agg ORDER BY nation ASC, o_year DESC
"""


# ----------------------------------------------------------------- q10

def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1998-01-01"))
        & (F.col("o_orderdate") < _ts("1998-07-01"))
    )
    l = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum(
            cents(F.col("l_extendedprice")) * (F.lit(100) - cents(F.col("l_discount")))
        ).alias("rev_c")
    )
    return (
        agg.select(
            "c_custkey",
            "c_name",
            (F.col("rev_c") / F.lit(10000.0)).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = f"""
WITH agg AS (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS rev_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1998-01-01'
    AND o_orderdate < TIMESTAMP '1998-07-01'
  GROUP BY 1, 2, 3, 4
)
SELECT c_custkey, c_name, rev_c / 10000.0 AS revenue, c_acctbal, n_name
FROM agg ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


# ----------------------------------------------------------------- q12

def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipmode priority classes, adapted: no l_shipmode column, so
    lines are classed slow/fast by ship lag (>45 days after order).
    Dates are midnight-aligned so datediff ≡ DuckDB date_diff."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    joined = l.join(o, l.l_orderkey == o.o_orderkey)
    classed = joined.select(
        F.when(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 45, F.lit("slow")
        )
        .otherwise(F.lit("fast"))
        .alias("ship_class"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_high"),
    )
    return (
        classed.groupBy("ship_class")
        .agg(
            F.sum("is_high").cast("long").alias("high_line_count"),
            F.sum(F.lit(1) - F.col("is_high")).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


_Q12_SQL = """
WITH classed AS (
  SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 45
              THEN 'slow' ELSE 'fast' END AS ship_class,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_high
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
)
SELECT ship_class,
       CAST(SUM(is_high) AS BIGINT) AS high_line_count,
       CAST(SUM(1 - is_high) AS BIGINT) AS low_line_count
FROM classed GROUP BY 1 ORDER BY 1
"""


# ----------------------------------------------------------------- q13

def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution: left outer join (keeps
    zero-order customers) then a second aggregation over counts."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY 1 ORDER BY custdist DESC, c_count DESC
"""


# ----------------------------------------------------------------- q14

def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share. part is a dim → broadcast. The ratio is
    exact-int sums combined with fixed double ops (deterministic)."""
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    joined = l.join(broadcast(p), l.l_partkey == p.p_partkey)
    rev = cents(F.col("l_extendedprice")) * (F.lit(100) - cents(F.col("l_discount")))
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
            "promo_c"
        ),
        F.sum(rev).alias("total_c"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_c") / F.col("total_c")).alias("promo_revenue_pct")
    )


_Q14_SQL = f"""
WITH agg AS (
  SELECT
    SUM(CASE WHEN p_type = 'PROMO'
             THEN {cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})
             ELSE 0 END) AS promo_c,
    SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS total_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
    AND l_shipdate < TIMESTAMP '1997-10-01'
)
SELECT 100.0 * promo_c / total_c AS promo_revenue_pct FROM agg
"""


# ----------------------------------------------------------------- q18

_Q18_QTY_THRESHOLD = 300


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: group-having over lineitem feeds a
    semi-join back into the fact join (two shuffles on l_orderkey,
    co-partitioned so AQE can reuse the exchange)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("qty_c"))
        .where(F.col("qty_c") > _Q18_QTY_THRESHOLD * 100)
        .select("l_orderkey")
    )
    joined = (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
    )
    agg = joined.groupBy(
        "c_name",
        "c_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_totalprice",
    ).agg((F.sum(cents(F.col("l_quantity"))) / F.lit(100.0)).alias("sum_qty"))
    return agg.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100)


_Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice,
       SUM({cents_sql('l_quantity')}) / 100.0 AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY 1 HAVING SUM({cents_sql('l_quantity')}) > {_Q18_QTY_THRESHOLD * 100}
)
GROUP BY 1, 2, 3, 4, 5
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


# ------------------------------------------------------------------ q7

def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations, both directions. supplier,
    customer, nation are broadcast dims; the only shuffle is
    lineitem⋈orders plus the final small group-by."""
    n1, n2 = "NATION_1", "NATION_2"
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    nn = table(spark, sf_dir, "nation")
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    ns = nn.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nn.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(ns), F.col("s_nationkey") == F.col("sn_key"))
        .join(broadcast(nc), F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    agg = joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(
        F.sum(
            cents(F.col("l_extendedprice")) * (F.lit(100) - cents(F.col("l_discount")))
        ).alias("rev_c")
    )
    return agg.select(
        "supp_nation",
        "cust_nation",
        "l_year",
        (F.col("rev_c") / F.lit(10000.0)).alias("revenue"),
    ).orderBy("supp_nation", "cust_nation", "l_year")


_Q7_SQL = f"""
WITH agg AS (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS rev_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
  GROUP BY 1, 2, 3
)
SELECT supp_nation, cust_nation, l_year, rev_c / 10000.0 AS revenue
FROM agg ORDER BY 1, 2, 3
"""


# ------------------------------------------------------------------ q8

def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: fraction of a region's revenue for one
    part type supplied by one nation, per year. Exact integer sums on
    both numerator and denominator keep the ratio bit-stable."""
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nn = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    l = table(spark, sf_dir, "lineitem")
    ns = nn.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nn.select("n_nationkey", "n_regionkey")
    joined = (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(nc), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(ns), F.col("s_nationkey") == F.col("sn_key"))
    )
    rev = cents(F.col("l_extendedprice")) * (F.lit(100) - cents(F.col("l_discount")))
    agg = joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))).alias(
            "nation_c"
        ),
        F.sum(rev).alias("total_c"),
    )
    return agg.select(
        "o_year", (F.col("nation_c") / F.col("total_c")).alias("mkt_share")
    ).orderBy("o_year")


_Q8_SQL = f"""
WITH agg AS (
  SELECT year(o_orderdate) AS o_year,
         SUM(CASE WHEN ns.n_name = 'NATION_3'
              THEN {cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})
              ELSE 0 END) AS nation_c,
         SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS total_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY 1
)
SELECT o_year, nation_c / total_c AS mkt_share FROM agg ORDER BY 1
"""


# ----------------------------------------------------------------- q15

def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by quarterly revenue: the revenue 'view' is one
    shuffle-agg; its scalar MAX is broadcast back (no second pass over
    lineitem)."""
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            cents(F.col("l_extendedprice")) * (F.lit(100) - cents(F.col("l_discount")))
        ).alias("rev_c")
    )
    top = rev.join(broadcast(rev.agg(F.max("rev_c").alias("max_c"))), F.col("rev_c") == F.col("max_c"))
    return (
        top.join(broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c") / F.lit(10000.0)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, rev_c / 10000.0 AS total_revenue
FROM rev JOIN supplier ON supplier_no = s_suppkey
WHERE rev_c = (SELECT MAX(rev_c) FROM rev)
ORDER BY s_suppkey
"""


# ----------------------------------------------------------------- q17

def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue for one brand (avg-yearly lost
    revenue). The correlated avg subquery becomes a per-part
    aggregate joined back on l_partkey. The 0.2*avg threshold is
    compared in exact integers (qty_c * 5 * n < sum_c) so both
    engines agree bit-for-bit."""
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12")
    l = table(spark, sf_dir, "lineitem")
    per_part = l.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
        F.count(F.lit(1)).alias("n_li"),
    )
    joined = (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(per_part, l.l_partkey == F.col("pp_key"))
        .where(cents(F.col("l_quantity")) * F.lit(5) * F.col("n_li") < F.col("sum_qty_c"))
    )
    agg = joined.agg(F.sum(cents(F.col("l_extendedprice"))).alias("ep_c"))
    return agg.select((F.col("ep_c") / F.lit(100.0) / F.lit(7.0)).alias("avg_yearly"))


_Q17_SQL = f"""
WITH per_part AS (
  SELECT l_partkey AS pp_key,
         SUM({cents_sql('l_quantity')}) AS sum_qty_c,
         COUNT(*) AS n_li
  FROM lineitem GROUP BY 1
)
SELECT SUM({cents_sql('l_extendedprice')}) / 100.0 / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pp_key
WHERE p_brand = 'Brand#12'
  AND {cents_sql('l_quantity')} * 5 * n_li < sum_qty_c
"""


# ----------------------------------------------------------------- q19

def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under a disjunction of brand/size/quantity
    ranges (adapted: no p_container/l_shipmode in schema). One
    broadcast join; the OR-of-ANDs predicate stays in the scan-side
    filter so Catalyst can prune part early."""
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem")
    joined = l.join(broadcast(p), l.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    agg = joined.where(cond).agg(
        F.sum(
            cents(F.col("l_extendedprice")) * (F.lit(100) - cents(F.col("l_discount")))
        ).alias("rev_c")
    )
    return agg.select((F.col("rev_c") / F.lit(10000.0)).alias("revenue"))


_Q19_SQL = f"""
SELECT SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ----------------------------------------------------------------- q21

def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting, adapted: 'late' means
    shipped > 60 days after order date (schema has no commit/receipt
    dates). The spec's EXISTS / NOT EXISTS pair over lineitem
    self-joins is re-expressed as ONE per-order aggregate (distinct
    suppliers vs distinct late suppliers) — same result, one shuffle
    instead of three fact-fact self-joins; this is the formulation
    that survives 100 TB."""
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = table(spark, sf_dir, "lineitem")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    per_order = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(late, F.col("l_suppkey")).alias("late_suppkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("late_suppkey").alias("n_late"),
            F.min("late_suppkey").alias("late_supp"),
        )
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        per_order.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


_Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
                             THEN l_suppkey END) AS n_late,
         MIN(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
                  THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1
)
SELECT s_name, COUNT(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY 1 ORDER BY numwait DESC, s_name ASC LIMIT 100
"""


# ----------------------------------------------------------------- q22

def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity, adapted: country code is
    c_nationkey (schema has no c_phone) and 'dormant' means no
    orders since 1999 (every synthetic customer has some order).
    Customers with above-average positive balance and no recent
    orders: scalar-avg broadcast + left_anti join on filtered
    orders. The avg compare is exact integers (bal_c * n > sum_c)."""
    nations = [1, 2, 3, 4, 5, 6, 7]
    c = table(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(nations))
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") >= _ts("1999-01-01"))
    stats = c.where(F.col("c_acctbal") > 0).agg(
        F.sum(cents(F.col("c_acctbal"))).alias("sum_c"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    cand = c.join(broadcast(stats)).where(
        cents(F.col("c_acctbal")) * F.col("n_pos") > F.col("sum_c")
    )
    no_orders = cand.join(o, cand.c_custkey == o.o_custkey, "left_anti")
    return (
        no_orders.groupBy(F.col("c_nationkey").cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents(F.col("c_acctbal"))) / F.lit(100.0)).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_Q22_SQL = f"""
WITH c AS (
  SELECT * FROM customer WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
), stats AS (
  SELECT SUM({cents_sql('c_acctbal')}) AS sum_c, COUNT(*) AS n_pos
  FROM c WHERE c_acctbal > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
       COUNT(*) AS numcust,
       SUM({cents_sql('c_acctbal')}) / 100.0 AS totacctbal
FROM c, stats
WHERE {cents_sql('c_acctbal')} * n_pos > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1 ORDER BY 1
"""


# ----------------------------------------------- derived partsupp
#
# The testdata has no partsupp table, so the four partsupp queries
# (q2/q11/q16/q20) derive the supply relation from lineitem: one
# exact-integer aggregate to (partkey, suppkey) grain. availqty ≙
# total quantity ever supplied by that pair; supplycost ≙ the
# cheapest observed unit price proxy (MIN extendedprice). Both are
# integer cents, so every downstream threshold compare is exact in
# Spark and DuckDB alike. The aggregate is map-side combined and is
# THE one fact-table shuffle each query pays; everything after runs
# at supply-pair grain (~part×supp, dim-like).


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum(cents(F.col("l_quantity"))).alias("ps_availqty_c"),
        F.min(cents(F.col("l_extendedprice"))).alias("ps_supplycost_c"),
    )


_PS_SQL = f"""
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         SUM({cents_sql('l_quantity')}) AS ps_availqty_c,
         MIN({cents_sql('l_extendedprice')}) AS ps_supplycost_c
  FROM lineitem GROUP BY 1, 2
"""


# ------------------------------------------------------------------ q2

def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (adapted: partsupp derived from
    lineitem; p_type = 'LARGE' stands in for '%BRASS'): for every
    LARGE part of size ≤ 25, the EUROPE supplier(s) offering the minimum
    supply cost. The spec's correlated MIN subquery becomes a window
    MIN over ps_partkey — computed on the already part+region-pruned
    pair table, never on lineitem.

    Scale shape: part filter and the supplier⋈nation⋈region chain
    both broadcast (dim-sized); the derived-ps aggregate is the only
    fact shuffle; the min-window partitions by the same ps_partkey
    the pairs are already keyed by. Order is total (acctbal, nation,
    unique s_name, partkey), so LIMIT 100 is deterministic."""
    p = table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 25) & (F.col("p_type") == "LARGE")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    euro_supp = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pairs = (
        _ps(spark, sf_dir)
        .join(broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(broadcast(euro_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("ps_partkey")
    return (
        pairs.withColumn("min_cost_c", F.min("ps_supplycost_c").over(w))
        .where(F.col("ps_supplycost_c") == F.col("min_cost_c"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            (F.col("ps_supplycost_c") / F.lit(100.0)).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


_Q2_SQL = f"""
WITH ps AS ({_PS_SQL}),
euro AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
pairs AS (
  SELECT ps.*, s_name, s_acctbal, n_name,
         MIN(ps_supplycost_c) OVER (PARTITION BY ps_partkey) AS min_cost_c
  FROM ps
  JOIN part ON ps_partkey = p_partkey AND p_size <= 25 AND p_type = 'LARGE'
  JOIN euro ON ps_suppkey = s_suppkey
)
SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
       ps_supplycost_c / 100.0 AS supplycost
FROM pairs WHERE ps_supplycost_c = min_cost_c
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


# ----------------------------------------------------------------- q11

_Q11_AVG_MULT = 2  # HAVING value > 2x the per-part average


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (adapted: derived partsupp;
    EUROPE region instead of one nation — single synthetic nations
    have no suppliers at the smallest SF): per-part inventory value
    held by EUROPE suppliers, keeping parts whose value exceeds 2x
    the per-part average — the global-scalar HAVING shape. The
    spec's 0.0001/SF fraction is an absolute share, which empties as
    the part count grows; multiples-of-average is the scale-free
    equivalent. The scalar (total, count) broadcasts back; the
    threshold compare is exact integers (value_c * n_parts >
    2 * total_c), never a float fraction."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nat_supp = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    per_part = (
        _ps(spark, sf_dir)
        .join(broadcast(nat_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_supplycost_c") * F.col("ps_availqty_c")).alias("value_c"))
    )
    total = per_part.agg(
        F.sum("value_c").alias("total_c"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        per_part.join(broadcast(total))
        .where(
            F.col("value_c") * F.col("n_parts")
            > F.lit(_Q11_AVG_MULT) * F.col("total_c")
        )
        .select("ps_partkey", (F.col("value_c") / F.lit(10000.0)).alias("value"))
        .orderBy(F.desc("value"), F.asc("ps_partkey"))
    )


_Q11_SQL = f"""
WITH ps AS ({_PS_SQL}),
nat AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
per_part AS (
  SELECT ps_partkey, SUM(ps_supplycost_c * ps_availqty_c) AS value_c
  FROM ps JOIN nat ON ps_suppkey = s_suppkey
  GROUP BY 1
),
tot AS (SELECT SUM(value_c) AS total_c, COUNT(*) AS n_parts FROM per_part)
SELECT ps_partkey, value_c / 10000.0 AS value
FROM per_part, tot
WHERE value_c * n_parts > {_Q11_AVG_MULT} * total_c
ORDER BY value DESC, ps_partkey ASC
"""


# ----------------------------------------------------------------- q16

_Q16_SIZES = [3, 9, 14, 19, 23, 36, 45, 49]


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship count (adapted: derived partsupp;
    negative account balance stands in for the '%Customer%
    Complaints%' blacklist): distinct suppliers per (brand, type,
    size) for selected sizes, excluding one brand, one type, and
    blacklisted suppliers — the NOT-IN → left-anti + COUNT(DISTINCT)
    shape. The blacklist and the part filter both broadcast; the
    distinct-count shuffles at pair grain on the group key."""
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(_Q16_SIZES)
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = (
        _ps(spark, sf_dir)
        .join(broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


_Q16_SQL = f"""
WITH ps AS ({_PS_SQL})
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN ({", ".join(str(s) for s in _Q16_SIZES)})
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


# ----------------------------------------------------------------- q20

def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (adapted: no availqty column, so
    'stock' ≙ quantity supplied before 1998 and 'demand' ≙ quantity
    shipped 1998+, per supply pair; 'forest%' ≙ 'small %'; CANADA ≙
    NATION_3): suppliers in the nation holding stock > half of
    subsequent demand for any small part — the spec's nested
    IN(IN(...)) chain as aggregate → semi-join → semi-join.

    Scale shape: one conditional aggregate over lineitem replaces
    the spec's two correlated scans; the part-name filter broadcasts
    into it; the final supplier semi-join is dim-sized. The
    stock>demand/2 compare is exact integers (2*early_c > late_c)."""
    p = table(spark, sf_dir, "part").where(F.col("p_name").startswith("small "))
    l = table(spark, sf_dir, "lineitem")
    cut = _ts("1998-01-01")
    per_pair = (
        l.join(broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.when(F.col("l_shipdate") < cut, cents(F.col("l_quantity"))).otherwise(
                    F.lit(0)
                )
            ).alias("early_c"),
            F.sum(
                F.when(F.col("l_shipdate") >= cut, cents(F.col("l_quantity"))).otherwise(
                    F.lit(0)
                )
            ).alias("late_c"),
        )
        .where((F.col("late_c") > 0) & (F.lit(2) * F.col("early_c") > F.col("late_c")))
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    nat_supp = s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
    return (
        nat_supp.join(
            per_pair.select("l_suppkey").distinct(),
            nat_supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


_Q20_SQL = f"""
WITH per_pair AS (
  SELECT l_suppkey,
         SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
                  THEN {cents_sql('l_quantity')} ELSE 0 END) AS early_c,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                  THEN {cents_sql('l_quantity')} ELSE 0 END) AS late_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small %'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT l_suppkey FROM per_pair
                    WHERE late_c > 0 AND 2 * early_c > late_c)
ORDER BY s_name
"""


# ---------------------------------------------------- customer_rfm

def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary
    quartiles via ntile over TOTAL orders (epoch-µs recency,
    exact-cent monetary). Every ntile order is total (metric +
    custkey tiebreak), so quartile assignment is deterministic under
    any partitioning — the property that makes a windowed
    segmentation safe on a cluster.

    Scale shape: one map-side-combined aggregate to one row per
    customer, then three windows over the customer-sized table (not
    the fact table). The unpartitioned ntile is a single-reducer sort
    of O(customers) rows — at 100 TB you'd shard it (e.g. per
    region/nation partition) or replace ntile with percent_rank over
    range-partitioned sort; the quartile semantics are unchanged."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        # o_orderdate is TIMESTAMP_NTZ in the parquet; cast to LTZ
        # under the UTC session so unix_micros matches epoch_us.
        F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
            "last_order_us"
        ),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents(F.col("o_totalprice"))).alias("spend_c"),
    )
    w_r = Window.orderBy(F.desc("last_order_us"), F.asc("o_custkey"))
    w_f = Window.orderBy(F.desc("n_orders"), F.asc("o_custkey"))
    w_m = Window.orderBy(F.desc("spend_c"), F.asc("o_custkey"))
    return per_cust.select(
        F.col("o_custkey").alias("custkey"),
        "last_order_us",
        "n_orders",
        (F.col("spend_c").cast("double") / 100.0).alias("total_spend"),
        F.ntile(4).over(w_r).alias("r_quartile"),
        F.ntile(4).over(w_f).alias("f_quartile"),
        F.ntile(4).over(w_m).alias("m_quartile"),
    )


# -------------------------------------- nation_activity_fullouter

_FO_CUST_BAL = 7000.0
_FO_SUPP_BAL = 5000.0


def nation_activity_fullouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation counts of high-balance customers vs high-balance
    suppliers, FULL OUTER joined so nations present on only one side
    survive with a zero on the other — the reconciliation-report
    join shape (and the full-outer coverage of the join surface).

    Scale shape: both inputs are pre-aggregated to nation
    cardinality BEFORE the join, so the full outer join is dim-sized
    regardless of fact size; the nation name decorate is a broadcast.
    """
    cust = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > _FO_CUST_BAL)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_rich_customers"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > _FO_SUPP_BAL)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_rich_suppliers"))
    )
    nation = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), F.col("n_name").alias("nation")
    )
    joined = cust.join(supp, "nationkey", "full_outer")
    return joined.join(broadcast(nation), "nationkey").select(
        "nationkey",
        "nation",
        F.coalesce(F.col("n_rich_customers"), F.lit(0)).cast("long").alias("n_rich_customers"),
        F.coalesce(F.col("n_rich_suppliers"), F.lit(0)).cast("long").alias("n_rich_suppliers"),
    )


_FULLOUTER_SQL = f"""
WITH cust AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_rich_customers
  FROM customer WHERE c_acctbal > {_FO_CUST_BAL} GROUP BY 1
), supp AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_rich_suppliers
  FROM supplier WHERE s_acctbal > {_FO_SUPP_BAL} GROUP BY 1
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       n.n_name AS nation,
       CAST(COALESCE(n_rich_customers, 0) AS BIGINT) AS n_rich_customers,
       CAST(COALESCE(n_rich_suppliers, 0) AS BIGINT) AS n_rich_suppliers
FROM cust c FULL OUTER JOIN supp s USING (nationkey)
JOIN nation n ON n.n_nationkey = COALESCE(c.nationkey, s.nationkey)
"""


# ------------------------------------------- orders_percent_rank

def orders_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile standing of each order's price within its order
    year: PERCENT_RANK + CUME_DIST — the rank-family window surface
    (quantile dashboards, outlier flags).

    Determinism: the rank ORDER BY key is the exact integer cents of
    the price, so float comparison can't reorder ties, and tied rows
    get identical rank in both engines by definition of the
    functions. Scale shape: one shuffle on the year; within-year
    sort is the window's own."""
    o = table(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate"))
    pc = cents(F.col("o_totalprice"))
    w = Window.partitionBy("order_year").orderBy(F.col("price_c").asc())
    base = o.select(
        "o_orderkey", yr.alias("order_year"), pc.alias("price_c")
    )
    return base.select(
        "o_orderkey",
        "order_year",
        (F.col("price_c") / 100.0).alias("total_price"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
    )


_PCT_RANK_SQL = f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
         {cents_sql('o_totalprice')} AS price_c
  FROM orders
)
SELECT o_orderkey, order_year,
       price_c / 100.0 AS total_price,
       PERCENT_RANK() OVER (PARTITION BY order_year ORDER BY price_c ASC) AS price_pct_rank,
       CUME_DIST() OVER (PARTITION BY order_year ORDER BY price_c ASC) AS price_cume_dist
FROM base
"""


# ------------------------------------------- market_basket_pairs

_BASKET_TOPN = 50


def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchased part pairs within an order (basket co-occurrence
    mining — the classic first step of association-rule pipelines and
    a core training-data-curation primitive for recommender corpora).

    Scale shape: the pair generation is a self-join on the order key,
    so it shuffles ONCE on l_orderkey and the blow-up is bounded by
    the per-order basket size (TPC-H: <= 7-ish lineitems; pairs per
    order stay O(basket^2), never O(n^2) global). The (orderkey,
    partkey) projection is made distinct BEFORE the self-join so
    multi-line orders of the same part can't inflate pair counts.
    """
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("p1"),
        F.col("b.l_partkey").alias("p2"),
    )
    counted = pairs.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.orderBy(
        F.col("n_orders").desc(), F.col("p1").asc(), F.col("p2").asc()
    )
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _BASKET_TOPN)
        .select("p1", "p2", "n_orders", "rnk")
    )


_BASKET_SQL = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), counted AS (
  SELECT p1, p2, COUNT(*) AS n_orders FROM pairs GROUP BY 1, 2
)
SELECT p1, p2, n_orders, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY n_orders DESC, p1 ASC, p2 ASC) AS INT) AS rnk
  FROM counted
) r WHERE rnk <= {_BASKET_TOPN}
"""


_RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(epoch_us(o_orderdate)) AS last_order_us,
         COUNT(*) AS n_orders,
         SUM({cents_sql('o_totalprice')}) AS spend_c
  FROM orders GROUP BY 1
)
SELECT o_custkey AS custkey,
       last_order_us,
       n_orders,
       CAST(spend_c AS DOUBLE) / 100.0 AS total_spend,
       CAST(NTILE(4) OVER (ORDER BY last_order_us DESC, o_custkey ASC) AS INT) AS r_quartile,
       CAST(NTILE(4) OVER (ORDER BY n_orders DESC, o_custkey ASC) AS INT) AS f_quartile,
       CAST(NTILE(4) OVER (ORDER BY spend_c DESC, o_custkey ASC) AS INT) AS m_quartile
FROM per_cust
"""


# ------------------------------------------------ nation_yoy_growth

def nation_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation — the trend
    surface every OLAP dashboard needs. Revenue aggregates exactly in
    BIGINT at (nation, year) grain FIRST (one fact shuffle); the YoY
    lag window then runs over O(nations × years) rows — scale-free.
    First year per nation has NULL growth (both engines)."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(
                cents(F.col("l_extendedprice"))
                * (F.lit(100) - cents(F.col("l_discount")))
            ).alias("rev_c")
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.asc("o_year"))
    prev = F.lag("rev_c").over(w)
    return agg.select(
        "n_name",
        "o_year",
        (F.col("rev_c") / F.lit(10000.0)).alias("revenue"),
        (
            (F.col("rev_c") - prev).cast("double") / prev.cast("double")
        ).alias("yoy_growth"),
    )


_YOY_SQL = f"""
WITH agg AS (
  SELECT n_name, year(o_orderdate) AS o_year,
         SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS rev_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, o_year, rev_c / 10000.0 AS revenue,
       CAST(rev_c - LAG(rev_c) OVER w AS DOUBLE)
         / CAST(LAG(rev_c) OVER w AS DOUBLE) AS yoy_growth
FROM agg
WINDOW w AS (PARTITION BY n_name ORDER BY o_year ASC)
"""


# ---------------------------------------------- brand_revenue_share

def brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share of each brand within its part type — the
    share-of-total window surface (sum-over-partition ratio). The
    fact joins the broadcast part dim, aggregates exactly to
    (type, brand) grain, and the share window runs over that
    dim-sized aggregate only."""
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem")
    agg = (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice"))
                * (F.lit(100) - cents(F.col("l_discount")))
            ).alias("rev_c")
        )
    )
    w = Window.partitionBy("p_type")
    return agg.select(
        "p_type",
        "p_brand",
        (F.col("rev_c") / F.lit(10000.0)).alias("revenue"),
        (
            F.col("rev_c").cast("double")
            / F.sum("rev_c").over(w).cast("double")
        ).alias("share"),
    )


_BRAND_SHARE_SQL = f"""
WITH agg AS (
  SELECT p_type, p_brand,
         SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS rev_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT p_type, p_brand, rev_c / 10000.0 AS revenue,
       CAST(rev_c AS DOUBLE)
         / CAST(SUM(rev_c) OVER (PARTITION BY p_type) AS DOUBLE) AS share
FROM agg
"""


QUERIES = {
    "tpch_q1": tpch_q1,
    "tpch_q2": tpch_q2,
    "tpch_q3": tpch_q3,
    "tpch_q4": tpch_q4,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q9": tpch_q9,
    "tpch_q10": tpch_q10,
    "tpch_q11": tpch_q11,
    "tpch_q12": tpch_q12,
    "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14,
    "tpch_q15": tpch_q15,
    "tpch_q16": tpch_q16,
    "tpch_q17": tpch_q17,
    "tpch_q18": tpch_q18,
    "tpch_q19": tpch_q19,
    "tpch_q20": tpch_q20,
    "tpch_q21": tpch_q21,
    "tpch_q22": tpch_q22,
    "customer_rfm": customer_rfm,
    "market_basket_pairs": market_basket_pairs,
    "nation_activity_fullouter": nation_activity_fullouter,
    "orders_percent_rank": orders_percent_rank,
    "nation_yoy_growth": nation_yoy_growth,
    "brand_revenue_share": brand_revenue_share,
}

ORACLE = {
    "tpch_q1": _Q1_SQL,
    "tpch_q2": _Q2_SQL,
    "tpch_q3": _Q3_SQL,
    "tpch_q4": _Q4_SQL,
    "tpch_q5": _Q5_SQL,
    "tpch_q6": _Q6_SQL,
    "tpch_q7": _Q7_SQL,
    "tpch_q8": _Q8_SQL,
    "tpch_q9": _Q9_SQL,
    "tpch_q10": _Q10_SQL,
    "tpch_q11": _Q11_SQL,
    "tpch_q12": _Q12_SQL,
    "tpch_q13": _Q13_SQL,
    "tpch_q14": _Q14_SQL,
    "tpch_q15": _Q15_SQL,
    "tpch_q16": _Q16_SQL,
    "tpch_q17": _Q17_SQL,
    "tpch_q18": _Q18_SQL,
    "tpch_q19": _Q19_SQL,
    "tpch_q20": _Q20_SQL,
    "tpch_q21": _Q21_SQL,
    "tpch_q22": _Q22_SQL,
    "customer_rfm": _RFM_SQL,
    "market_basket_pairs": _BASKET_SQL,
    "nation_activity_fullouter": _FULLOUTER_SQL,
    "orders_percent_rank": _PCT_RANK_SQL,
    "nation_yoy_growth": _YOY_SQL,
    "brand_revenue_share": _BRAND_SHARE_SQL,
}
