"""Text analysis over `documents` (SURVEY §2.5).

LLM-data-pipeline text operators: token counting (whitespace +
BPE-ish regex), composite quality scoring, marker-token language ID
with a confusion rollup, order-free content fingerprinting, and
corpus stats. Everything is built-in-function column algebra (no
Python UDFs — whole-stage codegen end to end), with DuckDB-mirrored
semantics: integer counts aggregated exactly, double post-ops in a
fixed operation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import h32_spark_sql, h32_sql
from ..functions.text import (
    char_ngrams_expr,
    norm_text,
    norm_text_sql,
    tokens,
    tokens_sql,
)
from ..sources.tables import table

# BPE-ish pre-tokenizer: letter runs, digit runs, single other glyphs.
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

_STOPWORDS = (
    "the", "a", "and", "of", "to", "in", "is", "for", "on", "with",
)

# marker tokens per language for the heuristic language-ID
_LANG_MARKERS = {
    "en": ("the", "and", "is", "of"),
    "es": ("el", "la", "los", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "les", "et", "une"),
    "zh": ("de", "shi", "bu", "wo"),
}
_LANG_ORDER = ("en", "es", "de", "fr", "zh")


def _in_list_sql(items) -> str:
    return ", ".join(f"'{x}'" for x in items)


# ----------------------------------------------------- token_count

def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    nt = norm_text(F.col("text"))
    t = d.select(
        "doc_id",
        nt.alias("nt"),
        tokens(F.col("text")).alias("toks"),
    )
    return t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("nt"), F.lit(_BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length("nt").alias("n_chars_norm"),
        (F.length("nt") / F.size("toks")).alias("avg_token_len"),
    )


_TOKEN_COUNT_SQL = f"""
WITH t AS (
  SELECT doc_id,
         {norm_text_sql('text')} AS nt,
         {tokens_sql('text')} AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(nt, '{_BPE_RE}')) AS INT) AS n_bpe_tokens,
       CAST(length(nt) AS INT) AS n_chars_norm,
       length(nt) / len(toks) AS avg_token_len
FROM t
"""


# ----------------------------------------------- text_quality_score

def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality: length saturation, non-alnum density,
    stopword ratio. Fixed double op order keeps engines identical."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", norm_text(F.col("text")).alias("nt"), tokens(F.col("text")).alias("toks")
    ).where(F.size("toks") >= 1)
    stop_expr = f"size(filter(toks, x -> x IN ({_in_list_sql(_STOPWORDS)})))"
    m = t.select(
        "doc_id",
        F.length("nt").alias("n_chars"),
        F.size("toks").alias("n_tokens"),
        (
            F.length("nt")
            - F.length(F.regexp_replace(F.col("nt"), "[^a-z0-9 ]", ""))
        ).alias("n_punct"),
        F.expr(stop_expr).alias("n_stop"),
    )
    len_score = F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0))
    punct_ratio = F.col("n_punct") / F.col("n_chars")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    return m.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        (
            F.lit(0.4) * len_score
            + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
            + F.lit(0.3) * stop_ratio
        ).alias("quality_score"),
    )


_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, {norm_text_sql('text')} AS nt, {tokens_sql('text')} AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(length(nt) AS INT) AS n_chars,
         CAST(len(toks) AS INT) AS n_tokens,
         CAST(length(nt) - length(regexp_replace(nt, '[^a-z0-9 ]', '', 'g')) AS INT) AS n_punct,
         CAST(len(list_filter(toks, x -> x IN ({_in_list_sql(_STOPWORDS)}))) AS INT) AS n_stop
  FROM t WHERE len(toks) >= 1
)
SELECT doc_id, n_chars, n_tokens,
       n_punct / n_chars AS punct_ratio,
       n_stop / n_tokens AS stopword_ratio,
       0.4 * least(n_chars / 500.0, 1.0)
         + 0.3 * (1.0 - n_punct / n_chars)
         + 0.3 * (n_stop / n_tokens) AS quality_score
FROM m
"""


# -------------------------------------------------- lang_id_ngram

def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID vs the labeled `lang`: a confusion
    rollup (lang × pred_lang → count). Argmax resolves ties by the
    fixed _LANG_ORDER preference, identically in both engines."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", tokens(norm_text(F.col("text"))).alias("toks"))
    counts = t.select(
        "doc_id",
        "lang",
        *[
            F.expr(
                f"size(filter(toks, x -> x IN ({_in_list_sql(_LANG_MARKERS[lg])})))"
            ).alias(f"c_{lg}")
            for lg in _LANG_ORDER
        ],
    )
    all_cols = [f"c_{lg}" for lg in _LANG_ORDER]
    g = F.greatest(*[F.col(c) for c in all_cols])
    pred = F.when(g == 0, F.lit("unknown"))
    for lg in _LANG_ORDER:
        pred = pred.when(F.col(f"c_{lg}") == g, F.lit(lg))
    return (
        counts.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


def _pred_sql() -> str:
    cases = " ".join(
        f"WHEN c_{lg} = g THEN '{lg}'" for lg in _LANG_ORDER
    )
    return f"CASE WHEN g = 0 THEN 'unknown' {cases} END"


_LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         {tokens_sql(norm_text_sql('text'))} AS toks
  FROM documents
), counts AS (
  SELECT doc_id, lang,
         {', '.join(f"CAST(len(list_filter(toks, x -> x IN ({_in_list_sql(_LANG_MARKERS[lg])}))) AS INT) AS c_{lg}" for lg in _LANG_ORDER)}
  FROM t
), gm AS (
  SELECT *, greatest({', '.join(f'c_{lg}' for lg in _LANG_ORDER)}) AS g FROM counts
)
SELECT lang, {_pred_sql()} AS pred_lang, COUNT(*) AS n
FROM gm GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------ doc_fingerprint

def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint from the char-5-gram hash set: XOR-fold
    (commutative → shuffle-order-free), min-hash, and distinct count.
    A cheap containment/equality digest for corpus-level comparison."""
    d = table(spark, sf_dir, "documents")
    nt = d.select("doc_id", norm_text(F.col("text")).alias("nt")).where(
        F.length("nt") >= 5
    )
    grams = nt.select(
        "doc_id", F.explode(F.expr(char_ngrams_expr("nt", 5))).alias("g")
    ).distinct()
    hashed = grams.select("doc_id", F.expr(h32_spark_sql("g")).alias("h"))
    return hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.min("h").alias("min_hash"),
        F.expr("bit_xor(h)").alias("xor_fingerprint"),
    )


_FINGERPRINT_SQL = f"""
WITH nt AS (
  SELECT doc_id, {norm_text_sql('text')} AS nt FROM documents
), idx AS (
  SELECT doc_id, nt, unnest(generate_series(1, length(nt)-4)) AS i
  FROM nt WHERE length(nt) >= 5
), grams AS (
  SELECT DISTINCT doc_id, substr(nt, i, 5) AS g FROM idx
), hashed AS (
  SELECT doc_id, {h32_sql('g')} AS h FROM grams
)
SELECT doc_id, COUNT(*) AS n_grams, MIN(h) AS min_hash,
       bit_xor(h) AS xor_fingerprint
FROM hashed GROUP BY 1
"""


# ---------------------------------------------- doc_stats_by_lang

def doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "source",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    agg = t.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "sum_chars",
        "sum_tokens",
        (F.col("sum_chars") / F.col("n_docs")).alias("avg_chars"),
        (F.col("sum_tokens") / F.col("n_docs")).alias("avg_tokens"),
    ).orderBy("lang", "source")


_DOC_STATS_SQL = f"""
WITH t AS (
  SELECT lang, source, n_chars,
         CAST(len({tokens_sql('text')}) AS INT) AS n_tokens
  FROM documents
), agg AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         SUM(n_chars) AS sum_chars, SUM(n_tokens) AS sum_tokens
  FROM t GROUP BY 1, 2
)
SELECT lang, source, n_docs,
       CAST(sum_chars AS BIGINT) AS sum_chars,
       CAST(sum_tokens AS BIGINT) AS sum_tokens,
       sum_chars / n_docs AS avg_chars,
       sum_tokens / n_docs AS avg_tokens
FROM agg ORDER BY 1, 2
"""


# ------------------------------------------------ token_histogram

_VOCAB_TOPN = 200


def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-N tokens by document frequency (the
    vocab-building pass of an LLM data pipeline). Tokens are
    deduped in-row first (array_distinct), so the shuffle carries
    one row per (doc, distinct token) and the groupBy benefits from
    map-side combine; the rank window runs over the already-tiny
    aggregated relation."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.array_distinct(tokens(norm_text(F.col("text"))))).alias("tok")
    ).where(F.col("tok") != "")
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("doc_freq"))
    w = Window.orderBy(F.desc("doc_freq"), F.asc("tok"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= _VOCAB_TOPN)
    )


_TOKEN_HISTOGRAM_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({tokens_sql(norm_text_sql('text'))}) AS tok
  FROM documents
), counts AS (
  SELECT tok, COUNT(*) AS doc_freq FROM tok WHERE tok <> '' GROUP BY 1
), ranked AS (
  SELECT tok, doc_freq,
         CAST(ROW_NUMBER() OVER (ORDER BY doc_freq DESC, tok ASC) AS INT) AS rnk
  FROM counts
)
SELECT tok, doc_freq, rnk FROM ranked WHERE rnk <= {_VOCAB_TOPN}
"""


# ------------------------------------------------- corpus_select

_CORPUS_QUALITY_MIN = 0.5


def corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline as ONE declarative plan:
    exact-dedup to canonical docs, score quality, keep docs above
    threshold — the select step that feeds a training run. Composing
    the operators keeps everything in a single Catalyst plan, so the
    normalize/md5 work is shared and the dedup groupBy and quality
    scan pipeline into two total shuffles."""
    d = table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", "lang", "source", F.md5(norm_text(F.col("text"))).alias("h")
    )
    canon = hashed.groupBy("h").agg(F.min("doc_id").alias("cid"))
    q = text_quality_score(spark, sf_dir).select("doc_id", "n_tokens", "quality_score")
    return (
        hashed.join(canon, "h")
        .where(F.col("doc_id") == F.col("cid"))
        .join(q, "doc_id")
        .where(F.col("quality_score") >= _CORPUS_QUALITY_MIN)
        .select("doc_id", "lang", "source", "n_tokens", "quality_score")
    )


_CORPUS_SELECT_SQL = f"""
WITH t AS (
  SELECT doc_id, {norm_text_sql('text')} AS nt, {tokens_sql('text')} AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(length(nt) AS INT) AS n_chars,
         CAST(len(toks) AS INT) AS n_tokens,
         CAST(length(nt) - length(regexp_replace(nt, '[^a-z0-9 ]', '', 'g')) AS INT) AS n_punct,
         CAST(len(list_filter(toks, x -> x IN ({_in_list_sql(_STOPWORDS)}))) AS INT) AS n_stop
  FROM t WHERE len(toks) >= 1
), q AS (
  SELECT doc_id, n_tokens,
         0.4 * least(n_chars / 500.0, 1.0)
           + 0.3 * (1.0 - n_punct / n_chars)
           + 0.3 * (n_stop / n_tokens) AS quality_score
  FROM m
), hashed AS (
  SELECT doc_id, lang, source, md5({norm_text_sql('text')}) AS h
  FROM documents
), canon AS (
  SELECT h, MIN(doc_id) AS cid FROM hashed GROUP BY 1
)
SELECT hashed.doc_id, lang, source, n_tokens, quality_score
FROM hashed
JOIN canon USING (h)
JOIN q ON q.doc_id = hashed.doc_id
WHERE hashed.doc_id = cid AND quality_score >= {_CORPUS_QUALITY_MIN}
"""


# ------------------------------------------------ quality_repetition

def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, public): the
    fraction of tokens taken by the single most-frequent token, the
    fraction of duplicated bigrams, and the symbol density. A doc
    failing any rule is flagged `repetitive`.

    Shape at scale: top-token needs one (doc_id, tok) count aggregate
    (map-side combined; shuffle is O(distinct tokens per doc), then a
    per-doc max — no window over the corpus). Bigram duplication is
    computed IN-ROW (size vs size(array_distinct)) so it costs zero
    shuffles. Ratios are single divisions of exact integers."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", norm_text(F.col("text")).alias("nt"), tokens(F.col("text")).alias("toks")
    ).where(F.size("toks") >= 2)

    top = (
        t.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_tokens"))
    )
    bigram = t.select(
        "doc_id",
        "nt",
        F.expr("size(toks) - 1").alias("n_bi"),
        F.expr(
            "size(array_distinct(transform(sequence(0, size(toks)-2), "
            "i -> concat_ws(' ', toks[i], toks[i+1]))))"
        ).alias("n_bi_distinct"),
    )
    j = top.join(bigram, "doc_id")
    top_frac = F.col("top_c").cast("double") / F.col("n_tokens")
    dup_bi = (F.col("n_bi") - F.col("n_bi_distinct")).cast("double") / F.col("n_bi")
    sym = (
        F.length("nt") - F.length(F.regexp_replace(F.col("nt"), "[^a-z0-9 ]", ""))
    ).cast("double") / F.length("nt")
    return j.select(
        "doc_id",
        "n_tokens",
        top_frac.alias("top_token_frac"),
        dup_bi.alias("dup_bigram_frac"),
        sym.alias("symbol_ratio"),
        (
            (top_frac > _REP_TOP_TOKEN_MAX)
            | (dup_bi > _REP_DUP_BIGRAM_MAX)
            | (sym > _REP_SYMBOL_MAX)
        ).alias("repetitive"),
    )


_REP_TOP_TOKEN_MAX = 0.10
_REP_DUP_BIGRAM_MAX = 0.50
_REP_SYMBOL_MAX = 0.10

_REPETITION_SQL = f"""
WITH t AS (
  SELECT doc_id, {norm_text_sql('text')} AS nt, {tokens_sql('text')} AS toks
  FROM documents
), t2 AS (
  SELECT * FROM t WHERE len(toks) >= 2
), tok AS (
  SELECT doc_id, unnest(toks) AS tok FROM t2
), top AS (
  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_tokens
  FROM (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2) g
  GROUP BY 1
), bigram AS (
  SELECT doc_id, nt,
         len(toks) - 1 AS n_bi,
         (SELECT COUNT(DISTINCT toks[i] || ' ' || toks[i+1])
          FROM unnest(generate_series(1, len(toks)-1)) AS u(i)) AS n_bi_distinct
  FROM t2
)
SELECT top.doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(top_c AS DOUBLE) / n_tokens AS top_token_frac,
       CAST(n_bi - n_bi_distinct AS DOUBLE) / n_bi AS dup_bigram_frac,
       CAST(length(nt) - length(regexp_replace(nt, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
         / length(nt) AS symbol_ratio,
       (CAST(top_c AS DOUBLE) / n_tokens > {_REP_TOP_TOKEN_MAX}
        OR CAST(n_bi - n_bi_distinct AS DOUBLE) / n_bi > {_REP_DUP_BIGRAM_MAX}
        OR CAST(length(nt) - length(regexp_replace(nt, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
           / length(nt) > {_REP_SYMBOL_MAX}) AS repetitive
FROM top JOIN bigram ON bigram.doc_id = top.doc_id
"""


# ------------------------------------------------------- pii_detect

# RE2-safe patterns (identical semantics in Java regex and RE2).
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_URL = "https?://[^ ]+"
_PII_PHONE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
_PII_DIGITS = "[0-9]{6,}"
_PII_LONGTOK = 20


def pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII/identifier scan: emails, URLs, phone shapes,
    long digit runs, and ≥20-char tokens (opaque identifiers). Pure
    per-row regexp column algebra — zero shuffles, trivially
    data-parallel at any scale; the final `has_pii` drives corpus
    filtering the way quality_score does."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    counts = d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_URL), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_PHONE), 0)).alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_DIGITS), 0)).alias("n_digit_runs"),
        F.size(F.filter(toks, lambda x: F.length(x) >= _PII_LONGTOK)).alias("n_long_tokens"),
    )
    return counts.select(
        "doc_id",
        *[F.col(c).cast("long").alias(c) for c in
          ("n_emails", "n_urls", "n_phones", "n_digit_runs", "n_long_tokens")],
        (
            (F.col("n_emails") + F.col("n_urls") + F.col("n_phones")
             + F.col("n_digit_runs") + F.col("n_long_tokens")) > 0
        ).alias("has_pii"),
    )


_PII_SQL = f"""
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '{_PII_URL}')) AS BIGINT) AS n_urls,
         CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
         CAST(len(regexp_extract_all(text, '{_PII_DIGITS}')) AS BIGINT) AS n_digit_runs,
         CAST(len(list_filter({tokens_sql('text')}, x -> length(x) >= {_PII_LONGTOK})) AS BIGINT) AS n_long_tokens
  FROM documents
)
SELECT doc_id, n_emails, n_urls, n_phones, n_digit_runs, n_long_tokens,
       (n_emails + n_urls + n_phones + n_digit_runs + n_long_tokens) > 0 AS has_pii
FROM c
"""


# ------------------------------------------------- doc_top_terms

_TOP_TERMS_K = 3


def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic terms per document: TF-IDF-style scoring with a
    PURE INTEGER RATIO (tf · n_docs / df) instead of tf·ln(n/df) —
    same ranking monotonicity per fixed tf, and exact BIGINT
    arithmetic until one final division, so the score hash-matches
    DuckDB (libm ln() is deliberately avoided: it is not guaranteed
    correctly rounded, and a 1-ulp disagreement would flip a rank).

    Shape: (doc, token) tf counts (map-side combined), token df over
    in-row-deduped tokens, one broadcast scalar n_docs, one per-doc
    top-k window. All shuffles carry aggregated rows."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(norm_text(F.col("text")))).alias("tok")
    ).where(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        d.select(
            F.explode(F.array_distinct(tokens(norm_text(F.col("text"))))).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            (
                (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("tok")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= _TOP_TERMS_K)
        .select("doc_id", "tok", "tf", "df", "score", "rnk")
    )


_TOP_TERMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql(norm_text_sql('text'))}) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2
), dtok AS (
  SELECT DISTINCT doc_id, unnest({tokens_sql(norm_text_sql('text'))}) AS tok
  FROM documents
), dfq AS (
  SELECT tok, COUNT(*) AS df FROM dtok WHERE tok <> '' GROUP BY 1
), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tok, tf, df,
         CAST(tf * n_docs AS DOUBLE) / df AS score
  FROM tf JOIN dfq USING (tok), nd
)
SELECT doc_id, tok, tf, df, score, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, tok ASC) AS rnk
  FROM scored
) r WHERE rnk <= {_TOP_TERMS_K}
"""


# ------------------------------------------------- bpe_pair_stats

_BPE_PAIR_TOPN = 50


def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token-pair frequencies — the merge-candidate scoring
    step of BPE tokenizer training, run corpus-wide.

    Scale shape: the pair list is built IN-ROW (transform over a
    sequence — whole-stage codegen, no self-join), then exploded and
    aggregated with map-side combine; the only shuffle is the final
    groupBy on the pair string, whose cardinality is O(vocab^2), not
    O(corpus). Top-N is a single total-ordered window over that small
    aggregate.
    """
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).where(F.size("toks") >= 2)
    pairs = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks)-1), "
                "i -> concat(toks[i-1], ' ', toks[i]))"
            )
        ).alias("pair"),
    )
    counted = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    w = Window.orderBy(
        F.col("n_occurrences").desc(), F.col("pair").asc()
    )
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _BPE_PAIR_TOPN)
        .select("pair", "n_occurrences", "n_docs", "rnk")
    )


_BPE_PAIR_SQL = f"""
WITH t AS (
  SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
), p AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS pair
  FROM t WHERE len(toks) >= 2
), counted AS (
  SELECT pair, COUNT(*) AS n_occurrences,
         COUNT(DISTINCT doc_id) AS n_docs
  FROM p GROUP BY 1
)
SELECT pair, n_occurrences, n_docs, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair ASC) AS INT) AS rnk
  FROM counted
) r WHERE rnk <= {_BPE_PAIR_TOPN}
"""


# --------------------------------------------- lang_confusion_metrics

def lang_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language precision / recall / F1 of the heuristic
    language-ID against the labeled `lang` — the classifier-eval
    rollup a pipeline publishes before trusting a filter. Derived
    entirely from the confusion aggregate (O(langs²) rows), so the
    eval joins are dim-sized; guarded divisions return 0.0 instead of
    NULL on empty prediction classes, identically in both engines."""
    conf = lang_id_ngram(spark, sf_dir)
    truth = conf.groupBy("lang").agg(F.sum("n").alias("n_true"))
    pred = conf.groupBy("pred_lang").agg(F.sum("n").alias("n_pred"))
    tp = conf.where(F.col("lang") == F.col("pred_lang")).select(
        "lang", F.col("n").alias("tp")
    )
    m = (
        truth.join(pred, truth.lang == pred.pred_lang, "left")
        .join(tp, "lang", "left")
        .select(
            "lang",
            "n_true",
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    pr = m.select(
        "lang",
        "n_true",
        "n_pred",
        "tp",
        F.when(F.col("n_pred") == 0, F.lit(0.0))
        .otherwise(F.col("tp").cast("double") / F.col("n_pred").cast("double"))
        .alias("precision"),
        F.when(F.col("n_true") == 0, F.lit(0.0))
        .otherwise(F.col("tp").cast("double") / F.col("n_true").cast("double"))
        .alias("recall"),
    )
    return pr.select(
        "lang",
        "n_true",
        "n_pred",
        "tp",
        "precision",
        "recall",
        F.when(F.col("precision") + F.col("recall") == 0.0, F.lit(0.0))
        .otherwise(
            F.lit(2.0)
            * F.col("precision")
            * F.col("recall")
            / (F.col("precision") + F.col("recall"))
        )
        .alias("f1"),
    )


def _lang_metrics_sql() -> str:
    return f"""
WITH conf AS (
  SELECT * FROM ({_LANG_ID_SQL})
), truth AS (
  SELECT lang, CAST(SUM(n) AS BIGINT) AS n_true FROM conf GROUP BY 1
), pred AS (
  SELECT pred_lang, CAST(SUM(n) AS BIGINT) AS n_pred FROM conf GROUP BY 1
), tp AS (
  SELECT lang, n AS tp FROM conf WHERE lang = pred_lang
), m AS (
  SELECT truth.lang, truth.n_true,
         COALESCE(pred.n_pred, 0) AS n_pred,
         COALESCE(tp.tp, 0) AS tp
  FROM truth
  LEFT JOIN pred ON pred.pred_lang = truth.lang
  LEFT JOIN tp ON tp.lang = truth.lang
), pr AS (
  SELECT lang, n_true, n_pred, tp,
         CASE WHEN n_pred = 0 THEN 0.0
              ELSE CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END AS precision,
         CASE WHEN n_true = 0 THEN 0.0
              ELSE CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall
  FROM m
)
SELECT lang, n_true, n_pred, tp, precision, recall,
       CASE WHEN precision + recall = 0.0 THEN 0.0
            ELSE 2.0 * precision * recall / (precision + recall) END AS f1
FROM pr
"""


# ---------------------------------------------- source_dup_inflation

def source_dup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diagnostics: per source, how inflated the raw doc count
    is vs distinct normalized texts — the first number a curation run
    reports (how much does exact dedup shrink each crawl/source).
    Two map-side-combined aggregates over the text hash; the dup
    ratio is one final double division."""
    d = table(spark, sf_dir, "documents")
    from ..functions.hashing import h32

    t = d.select("source", h32(norm_text(F.col("text"))).alias("th"))
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("th").alias("n_unique"),
        (
            (F.count(F.lit(1)) - F.countDistinct("th")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_ratio"),
    )


_DUP_INFLATION_SQL = f"""
WITH t AS (
  SELECT source, {h32_sql(norm_text_sql('text'))} AS th FROM documents
)
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT th) AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT th) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS dup_ratio
FROM t GROUP BY 1
"""


# ------------------------------------------------ doc_rarity_score

_COMMON_TOPN = 100  # corpus head-vocabulary size for the common-token ratio


def doc_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-rarity quality signal (the Gopher/Dolma-style
    head-vocabulary heuristic): rank every corpus token by occurrence
    count, then score each document by (a) the fraction of its tokens
    that fall inside the top-100 head vocabulary and (b) the mean
    corpus rank of its tokens. Low common-ratio + high mean rank
    flags gibberish/OCR noise; pathologically high common-ratio flags
    boilerplate. All integer arithmetic (counts, ranks, floor-milli
    ratios) so both engines agree bit-for-bit.

    Scale shape: the corpus-side explode reduces by token with
    map-side combine (vocab shuffle is vocabulary-bounded — token
    vocab saturates, it does not grow with corpus size); the rank
    window sorts only the aggregated vocab; the rank table then
    BROADCASTS back onto the exploded corpus, so per-doc scoring is
    one corpus-scale groupBy(doc_id) with partial aggregation and no
    other shuffle."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tokens(norm_text(F.col("text")))).alias("tok")
    ).where(F.col("tok") != "")
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranks = vocab.select(
        "tok", F.row_number().over(w).cast("long").alias("rnk")
    )
    scored = (
        tok.join(F.broadcast(ranks), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("rnk") <= _COMMON_TOPN).cast("long")).alias("n_common"),
            F.sum("rnk").alias("rank_sum"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "n_common",
        F.expr("(1000 * n_common) div n_tokens").alias("common_milli"),
        F.expr("(1000 * rank_sum) div n_tokens").alias("mean_rank_milli"),
    )


_RARITY_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens_sql(norm_text_sql('text'))}) AS tok
  FROM documents
), tok2 AS (
  SELECT doc_id, tok FROM tok WHERE tok <> ''
), vocab AS (
  SELECT tok, COUNT(*) AS n FROM tok2 GROUP BY 1
), ranks AS (
  SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS BIGINT) AS rnk
  FROM vocab
), scored AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN r.rnk <= {_COMMON_TOPN} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_common,
         CAST(SUM(r.rnk) AS BIGINT) AS rank_sum
  FROM tok2 t JOIN ranks r USING (tok)
  GROUP BY 1
)
SELECT doc_id, n_tokens, n_common,
       (1000 * n_common) // n_tokens AS common_milli,
       (1000 * rank_sum) // n_tokens AS mean_rank_milli
FROM scored
"""


QUERIES = {
    "token_count": token_count,
    "text_quality_score": text_quality_score,
    "lang_id_ngram": lang_id_ngram,
    "doc_fingerprint": doc_fingerprint,
    "doc_stats_by_lang": doc_stats_by_lang,
    "token_histogram": token_histogram,
    "corpus_select": corpus_select,
    "quality_repetition": quality_repetition,
    "pii_detect": pii_detect,
    "doc_top_terms": doc_top_terms,
    "bpe_pair_stats": bpe_pair_stats,
    "source_dup_inflation": source_dup_inflation,
    "lang_confusion_metrics": lang_confusion_metrics,
    "doc_rarity_score": doc_rarity_score,
}

ORACLE = {
    "token_count": _TOKEN_COUNT_SQL,
    "text_quality_score": _QUALITY_SQL,
    "lang_id_ngram": _LANG_ID_SQL,
    "doc_fingerprint": _FINGERPRINT_SQL,
    "doc_stats_by_lang": _DOC_STATS_SQL,
    "token_histogram": _TOKEN_HISTOGRAM_SQL,
    "corpus_select": _CORPUS_SELECT_SQL,
    "quality_repetition": _REPETITION_SQL,
    "pii_detect": _PII_SQL,
    "doc_top_terms": _TOP_TERMS_SQL,
    "bpe_pair_stats": _BPE_PAIR_SQL,
    "source_dup_inflation": _DUP_INFLATION_SQL,
    "lang_confusion_metrics": _lang_metrics_sql(),
    "doc_rarity_score": _RARITY_SQL,
}
