"""Corpus-trained bigram fluency scoring (SURVEY §2.5).

The classic perplexity-style quality filter a training-data pipeline
runs (KenLM-filtering's public shape, here as an add-1-smoothed
bigram model trained on the corpus itself): documents whose token
transitions are improbable under the corpus's own statistics are
boilerplate/garbled candidates. Emitted per doc: bigram count and
the mean smoothed transition probability in nano fixed-point.

Determinism design (what makes an LM score hash-exact across
engines): every per-bigram probability (C(a,b)+1)/(C(a)+V) is one
IEEE double division (correctly rounded in both engines), floored
to an INTEGER nano value per bigram, then summed as BIGINT — so the
aggregation is order-free (float summation order is engine- and
partition-dependent; integer summation is not). No logs anywhere:
log() is a transcendental whose last-ulp behavior differs across
libm implementations, so the score is the mean probability rather
than mean log-probability — same ranking direction for filtering,
bit-stable everywhere.

Scale shape: one corpus pass builds the bigram stream (explode, ~1
row per token); the model is the (observed-vocab²-bounded) bigram
count table plus the unigram table, both map-side combined; scoring
joins the doc bigram stream against the model on (a, b) — a hash
join against a bounded side — then reduces per doc with integer
aggregation. The corpus is touched twice (model build, scoring),
never shuffled wider than the model keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import norm_text, norm_text_sql, tokens, tokens_sql
from ..sources.tables import table

_NANO = 1_000_000_000


def _doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.filter(tokens(norm_text(F.col("text"))), lambda x: x != "").alias("tk"),
    ).where(F.size("tk") >= 2)
    return t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk)-1), i -> struct(tk[i-1] AS a, tk[i] AS b))"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))


def doc_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean add-1-smoothed bigram probability (nano
    fixed-point, floored per bigram BEFORE the order-free integer
    sum — see module docstring), with the bigram count. The model is
    the corpus itself; V is the distinct normalized token count."""
    bg = _doc_bigrams(spark, sf_dir).cache()
    bigram_counts = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    unigram_counts = bg.groupBy("a").agg(F.count(F.lit(1)).alias("c_a"))
    # V over all tokens (last tokens of docs included): union of both
    # bigram positions
    v = (
        bg.select(F.col("a").alias("w"))
        .unionByName(bg.select(F.col("b").alias("w")))
        .agg(F.countDistinct("w").alias("v"))
    )
    p_nano = F.floor(
        (F.col("c_ab") + F.lit(1)).cast("double")
        / (F.col("c_a") + F.col("v")).cast("double")
        * F.lit(float(_NANO))
    )
    scored = (
        bg.join(bigram_counts, ["a", "b"])
        .join(unigram_counts, "a")
        .crossJoin(F.broadcast(v))
        .select("doc_id", p_nano.alias("p_nano"))
    )
    # floor, not cast: Spark's double→long cast truncates while
    # DuckDB's CAST rounds — FLOOR is the one spelling both engines
    # agree on (values are non-negative).
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.floor(F.sum("p_nano") / F.count(F.lit(1))).alias("mean_p_nano"),
    )


_FLUENCY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter({tokens_sql(norm_text_sql('text'))}, x -> x <> '') AS tk
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)),
                i -> {{'a': tk[i], 'b': tk[i+1]}})) AS s
  FROM t WHERE len(tk) >= 2
), pairs AS (
  SELECT doc_id, s['a'] AS a, s['b'] AS b FROM bg
), bigram_counts AS (
  SELECT a, b, COUNT(*) AS c_ab FROM pairs GROUP BY 1, 2
), unigram_counts AS (
  SELECT a, COUNT(*) AS c_a FROM pairs GROUP BY 1
), v AS (
  SELECT COUNT(DISTINCT w) AS v FROM (
    SELECT a AS w FROM pairs UNION ALL SELECT b AS w FROM pairs
  )
), scored AS (
  SELECT doc_id,
         CAST(FLOOR(CAST(c_ab + 1 AS DOUBLE) / CAST(c_a + v AS DOUBLE)
                    * {float(_NANO)}) AS BIGINT) AS p_nano
  FROM pairs JOIN bigram_counts USING (a, b)
             JOIN unigram_counts USING (a)
             CROSS JOIN v
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(FLOOR(CAST(SUM(p_nano) AS DOUBLE) / COUNT(*)) AS BIGINT)
         AS mean_p_nano
FROM scored GROUP BY 1
"""


QUERIES = {
    "doc_bigram_fluency": doc_bigram_fluency,
}

ORACLE = {
    "doc_bigram_fluency": _FLUENCY_SQL,
}
