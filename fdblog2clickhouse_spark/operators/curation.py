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


# --------------------------------------------- quality_filter_funnel

_FUNNEL_MIN_TOKENS = 10
_FUNNEL_QUALITY_MIN = 0.5  # same threshold corpus_select ships


def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline yield report: how many docs survive each curation
    stage (ingest → min-length → quality ≥ θ → not-repetitive →
    PII-clean → exact-dedup canonical). The number every corpus run
    publishes next to its output. Composes the existing filter
    operators into ONE Catalyst plan — flags join at doc grain, one
    conditional aggregate produces all six cumulative counts, and
    stack() melts them to (stage, step, n_docs) rows in-row."""
    from .textops import pii_detect, quality_repetition, text_quality_score

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    q = text_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    rep = quality_repetition(spark, sf_dir).select("doc_id", "repetitive")
    pii = pii_detect(spark, sf_dir).select("doc_id", "has_pii")
    w = Window.partitionBy("h").orderBy(F.asc("doc_id"))
    canon = (
        d.select("doc_id", F.md5(norm_text(F.col("text"))).alias("h"))
        .withColumn("is_canon", F.row_number().over(w) == 1)
        .select("doc_id", "is_canon")
    )
    f2 = F.coalesce(F.col("n_tokens") >= _FUNNEL_MIN_TOKENS, F.lit(False))
    f3 = f2 & F.coalesce(
        F.col("quality_score") >= _FUNNEL_QUALITY_MIN, F.lit(False)
    )
    f4 = f3 & F.coalesce(~F.col("repetitive"), F.lit(False))
    f5 = f4 & F.coalesce(~F.col("has_pii"), F.lit(False))
    f6 = f5 & F.col("is_canon")
    agg = (
        d.select("doc_id")
        .join(q, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(pii, "doc_id", "left")
        .join(canon, "doc_id", "left")
        .agg(
            F.count(F.lit(1)).alias("s1"),
            F.count(F.when(f2, 1)).alias("s2"),
            F.count(F.when(f3, 1)).alias("s3"),
            F.count(F.when(f4, 1)).alias("s4"),
            F.count(F.when(f5, 1)).alias("s5"),
            F.count(F.when(f6, 1)).alias("s6"),
        )
    )
    return agg.selectExpr(
        "stack(6, 1, 'ingest', s1, 2, 'min_length', s2, 3, 'quality', s3, "
        "4, 'repetition', s4, 5, 'pii', s5, 6, 'dedup', s6) "
        "AS (stage, step, n_docs)"
    )


def _filter_funnel_sql() -> str:
    from .textops import _PII_SQL, _QUALITY_SQL, _REPETITION_SQL

    return f"""
WITH q AS (
  SELECT doc_id, n_tokens, quality_score FROM ({_QUALITY_SQL})
), rep AS (
  SELECT doc_id, repetitive FROM ({_REPETITION_SQL})
), pii AS (
  SELECT doc_id, has_pii FROM ({_PII_SQL})
), canon AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id ASC) = 1 AS is_canon
  FROM (SELECT doc_id, md5({norm_text_sql('text')}) AS h FROM documents)
), f AS (
  SELECT d.doc_id,
         COALESCE(q.n_tokens >= {_FUNNEL_MIN_TOKENS}, FALSE) AS f2,
         COALESCE(q.n_tokens >= {_FUNNEL_MIN_TOKENS}, FALSE)
           AND COALESCE(q.quality_score >= {_FUNNEL_QUALITY_MIN}, FALSE) AS f3,
         COALESCE(q.n_tokens >= {_FUNNEL_MIN_TOKENS}, FALSE)
           AND COALESCE(q.quality_score >= {_FUNNEL_QUALITY_MIN}, FALSE)
           AND COALESCE(NOT rep.repetitive, FALSE) AS f4,
         COALESCE(q.n_tokens >= {_FUNNEL_MIN_TOKENS}, FALSE)
           AND COALESCE(q.quality_score >= {_FUNNEL_QUALITY_MIN}, FALSE)
           AND COALESCE(NOT rep.repetitive, FALSE)
           AND COALESCE(NOT pii.has_pii, FALSE) AS f5,
         COALESCE(q.n_tokens >= {_FUNNEL_MIN_TOKENS}, FALSE)
           AND COALESCE(q.quality_score >= {_FUNNEL_QUALITY_MIN}, FALSE)
           AND COALESCE(NOT rep.repetitive, FALSE)
           AND COALESCE(NOT pii.has_pii, FALSE)
           AND canon.is_canon AS f6
  FROM documents d
  LEFT JOIN q USING (doc_id)
  LEFT JOIN rep USING (doc_id)
  LEFT JOIN pii USING (doc_id)
  LEFT JOIN canon USING (doc_id)
), agg AS (
  SELECT COUNT(*) AS s1,
         COUNT(CASE WHEN f2 THEN 1 END) AS s2,
         COUNT(CASE WHEN f3 THEN 1 END) AS s3,
         COUNT(CASE WHEN f4 THEN 1 END) AS s4,
         COUNT(CASE WHEN f5 THEN 1 END) AS s5,
         COUNT(CASE WHEN f6 THEN 1 END) AS s6
  FROM f
)
SELECT 1 AS stage, 'ingest' AS step, s1 AS n_docs FROM agg
UNION ALL SELECT 2, 'min_length', s2 FROM agg
UNION ALL SELECT 3, 'quality', s3 FROM agg
UNION ALL SELECT 4, 'repetition', s4 FROM agg
UNION ALL SELECT 5, 'pii', s5 FROM agg
UNION ALL SELECT 6, 'dedup', s6 FROM agg
"""


# ---------------------------------------------- doc_length_histogram

def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: docs bucketed by power-of-two token
    count (bucket = bit-length of n_tokens — same bin(x) trick both
    engines), with per-bucket doc and token totals. The length
    histogram every tokenizer-budget / packing decision reads.
    Shuffle is O(buckets) ≤ ~20 rows."""
    d = table(spark, sf_dir, "documents")
    t = d.select(tokens(norm_text(F.col("text"))).alias("toks")).select(
        F.size("toks").alias("n_tokens")
    )
    return (
        t.select(
            "n_tokens", F.length(F.bin("n_tokens")).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "bucket",
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) - 1) AS BIGINT)"
            ).alias("bucket_min_tokens"),
            "n_docs",
            "total_tokens",
        )
    )


_LENGTH_HIST_SQL = f"""
WITH t AS (
  SELECT len({tokens_sql(norm_text_sql('text'))}) AS n_tokens FROM documents
)
SELECT CAST(length(bin(n_tokens)) AS BIGINT) AS bucket,
       (1::BIGINT << (length(bin(n_tokens)) - 1)) AS bucket_min_tokens,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM t GROUP BY 1, 2
"""


QUERIES = {
    "benchmark_decontam": benchmark_decontam,
    "domain_mixture_sample": domain_mixture_sample,
    "token_collocations": token_collocations,
    "quality_filter_funnel": quality_filter_funnel,
    "doc_length_histogram": doc_length_histogram,
}

ORACLE = {
    "benchmark_decontam": _DECONTAM_SQL,
    "domain_mixture_sample": _MIXTURE_SQL,
    "token_collocations": _COLLOCATIONS_SQL,
    "quality_filter_funnel": _filter_funnel_sql(),
    "doc_length_histogram": _LENGTH_HIST_SQL,
}
