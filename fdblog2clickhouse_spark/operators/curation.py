"""Corpus-curation operators over `documents` (SURVEY §2.9).

The steps a large-scale training-data pipeline runs between raw
ingest and tokenization, beyond dedup/quality filtering (which live
in dedup.py / textops.py):

- `benchmark_decontam`: flag training docs that share long n-grams
  with a held-out evaluation set — the standard "benchmark
  decontamination" pass (e.g. GPT-3 appendix C / Dolma): any train
  doc sharing an 8-token shingle with an eval doc is contaminated.
- `domain_mixture_sample`: deterministic quota sampling to hit a
  target domain mixture (the "data mixing" step that reweights
  languages/sources before training).
- `token_collocations`: corpus-level collocation mining by lift
  (PMI without the log — a pure ratio stays exactly representable
  and engine-identical, no libm).

All hashes are md5-derived (functions/hashing.py) so every operator
is DuckDB-oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.hashing import h32_seeded, h32_sql, h32_spark_sql
from ..functions.text import norm_text, norm_text_sql, shingles_expr, tokens, tokens_sql
from ..sources.tables import table

# ---------------------------------------------- benchmark_decontam

_DECON_N = 8  # shingle width in tokens — long enough to be meaningful
_EVAL_MOD = 23  # doc_id % 23 == 0 → the held-out "benchmark" slice


def benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 23 != 0)
    that share at least one 8-token shingle with the held-out eval
    slice (doc_id % 23 == 0), with the count of distinct shared
    shingles.

    Scale shape: shingles are built IN-ROW (transform over a
    sequence — no self-join), hashed to 64-bit keys, and the eval
    gram set — small by construction (the benchmark suite, not the
    corpus) — is broadcast, so the contamination check is a
    broadcast semi-join against the train-side scan with NO shuffle
    of the corpus; the only shuffle is the per-doc count of matched
    grams, which is O(contaminated grams), not O(corpus).
    """
    d = table(spark, sf_dir, "documents")
    g = (
        d.select(
            "doc_id",
            "lang",
            "source",
            tokens(norm_text(F.col("text"))).alias("toks"),
        )
        .where(F.size("toks") >= _DECON_N)
        .select(
            "doc_id",
            "lang",
            "source",
            F.explode(
                F.array_distinct(F.expr(shingles_expr("toks", _DECON_N)))
            ).alias("s"),
        )
        .select(
            "doc_id", "lang", "source", F.expr(h32_spark_sql("s")).alias("gh")
        )
    )
    eval_grams = (
        g.where(F.col("doc_id") % _EVAL_MOD == 0).select("gh").distinct()
    )
    train = g.where(F.col("doc_id") % _EVAL_MOD != 0)
    return (
        train.join(broadcast(eval_grams), "gh")
        .groupBy("doc_id", "lang", "source")
        .agg(F.countDistinct("gh").alias("n_shared_grams"))
    )


def _decon_shingle_sql() -> str:
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(_DECON_N))
    return parts


_DECONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, source,
         {tokens_sql(norm_text_sql('text'))} AS t
  FROM documents
), idx AS (
  SELECT doc_id, lang, source, t,
         unnest(generate_series(1, len(t)-{_DECON_N - 1})) AS i
  FROM toks WHERE len(t) >= {_DECON_N}
), sh AS (
  SELECT DISTINCT doc_id, lang, source, {_decon_shingle_sql()} AS s FROM idx
), g AS (
  SELECT doc_id, lang, source, {h32_sql('s')} AS gh FROM sh
), ev AS (
  SELECT DISTINCT gh FROM g WHERE doc_id % {_EVAL_MOD} = 0
)
SELECT g.doc_id, g.lang, g.source,
       COUNT(DISTINCT g.gh) AS n_shared_grams
FROM g JOIN ev USING (gh)
WHERE g.doc_id % {_EVAL_MOD} <> 0
GROUP BY 1, 2, 3
"""


# ------------------------------------------- domain_mixture_sample

# Target language mixture (parts) and total sample size. Quotas are
# floor(N * w / sum_w); a language with fewer docs than its quota
# contributes everything it has (row_number can't exceed the count).
_MIX_WEIGHTS = {"en": 4, "de": 2, "es": 2, "fr": 1, "zh": 1}
_MIX_TOTAL = 200


def _quota_case_sql() -> str:
    s = sum(_MIX_WEIGHTS.values())
    arms = " ".join(
        f"WHEN '{lang}' THEN {(_MIX_TOTAL * w) // s}"
        for lang, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"CASE lang {arms} ELSE 0 END"


def domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quota sampling to a target language mixture
    (en:de:es:fr:zh = 4:2:2:1:1 over a 200-doc budget): per language,
    the quota's worth of docs ranked by a seeded md5 hash — no RNG,
    so the sample is reproducible under any partitioning, and the
    per-language window distributes by key (the sort is per-language,
    never global)."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        "source",
        h32_seeded(F.col("doc_id").cast("string"), seed=777).alias("h"),
        F.expr(_quota_case_sql()).alias("quota"),
    )
    w = Window.partitionBy("lang").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        t.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= F.col("quota"))
        .select("doc_id", "lang", "source", "sample_rank")
    )


_MIXTURE_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, source,
         {h32_sql("'777|' || CAST(doc_id AS VARCHAR)")} AS h,
         {_quota_case_sql()} AS quota
  FROM documents
), ranked AS (
  SELECT doc_id, lang, source, quota,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC)
              AS INT) AS sample_rank
  FROM t
)
SELECT doc_id, lang, source, sample_rank
FROM ranked WHERE sample_rank <= quota
"""


# ----------------------------------------------- token_collocations

_COLL_MIN_SUPPORT = 5
_COLL_TOPN = 100


def token_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by lift: for adjacent token pairs (a, b),
    lift = P(a,b) / (P(a) · P(b)) = (n_ab / N) / ((n_a / T)(n_b / T))
    — association strength without the PMI log (a pure double ratio
    with ONE division evaluates bit-identically on both engines;
    ln() would not).

    Scale shape: pairs are built in-row and aggregated with map-side
    combine (shuffle cardinality O(vocab²), not O(corpus)); unigram
    counts and the two scalar totals are vocab-/single-row-sized and
    broadcast, so the lift join never shuffles the pair table.
    """
    d = table(spark, sf_dir, "documents")
    t = d.select(tokens(norm_text(F.col("text"))).alias("toks")).where(
        F.size("toks") >= 2
    )
    pairs = t.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks)-1), "
                "i -> named_struct('a', toks[i-1], 'b', toks[i]))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    uni = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    totals = pc.agg(F.sum("n_ab").alias("n_pairs")).crossJoin(
        uni.agg(F.sum("n_tok").alias("n_tokens"))
    )
    joined = (
        pc.join(broadcast(uni.withColumnRenamed("tok", "a").withColumnRenamed("n_tok", "n_a")), "a")
        .join(broadcast(uni.withColumnRenamed("tok", "b").withColumnRenamed("n_tok", "n_b")), "b")
        .crossJoin(broadcast(totals))
    )
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n_tokens").cast("double")
        * F.col("n_tokens").cast("double")
        / (
            F.col("n_pairs").cast("double")
            * F.col("n_a").cast("double")
            * F.col("n_b").cast("double")
        )
    )
    w = Window.orderBy(F.desc("lift"), F.asc("a"), F.asc("b"))
    return (
        joined.where(F.col("n_ab") >= _COLL_MIN_SUPPORT)
        .select("a", "b", "n_ab", "n_a", "n_b", lift.alias("lift"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _COLL_TOPN)
    )


_COLLOCATIONS_SQL = f"""
WITH t AS (
  SELECT {tokens_sql(norm_text_sql('text'))} AS toks FROM documents
), tt AS (
  SELECT toks FROM t WHERE len(toks) >= 2
), pairs AS (
  SELECT toks[i] AS a, toks[i+1] AS b
  FROM (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i FROM tt)
), pc AS (
  SELECT a, b, COUNT(*) AS n_ab FROM pairs GROUP BY 1, 2
), uni AS (
  SELECT tok, COUNT(*) AS n_tok
  FROM (SELECT unnest(toks) AS tok FROM tt) GROUP BY 1
), totals AS (
  SELECT (SELECT SUM(n_ab) FROM pc) AS n_pairs,
         (SELECT SUM(n_tok) FROM uni) AS n_tokens
), scored AS (
  SELECT pc.a, pc.b, pc.n_ab, ua.n_tok AS n_a, ub.n_tok AS n_b,
         CAST(pc.n_ab AS DOUBLE) * CAST(totals.n_tokens AS DOUBLE)
           * CAST(totals.n_tokens AS DOUBLE)
           / (CAST(totals.n_pairs AS DOUBLE) * CAST(ua.n_tok AS DOUBLE)
              * CAST(ub.n_tok AS DOUBLE)) AS lift
  FROM pc
  JOIN uni ua ON ua.tok = pc.a
  JOIN uni ub ON ub.tok = pc.b
  CROSS JOIN totals
  WHERE pc.n_ab >= {_COLL_MIN_SUPPORT}
)
SELECT a, b, n_ab, n_a, n_b, lift,
       CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, a ASC, b ASC) AS INT) AS rnk
FROM scored QUALIFY rnk <= {_COLL_TOPN}
"""


QUERIES = {
    "benchmark_decontam": benchmark_decontam,
    "domain_mixture_sample": domain_mixture_sample,
    "token_collocations": token_collocations,
}

ORACLE = {
    "benchmark_decontam": _DECONTAM_SQL,
    "domain_mixture_sample": _MIXTURE_SQL,
    "token_collocations": _COLLOCATIONS_SQL,
}
