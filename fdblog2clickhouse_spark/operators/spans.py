"""Exact duplicated-substring span statistics (SURVEY §2.3).

The token-span-level dedup signal from the public "Deduplicating
Training Data Makes Language Models Better" method (Lee et al.
2022): find every maximal token span of length ≥ K that occurs more
than once in the corpus, and report per document how much of it is
duplicated text. Doc-level MinHash (dedup.py) catches near-identical
DOCUMENTS; this catches the boilerplate/quote/license SPANS inside
otherwise-unique documents — the thing substring dedup exists for.

Distributed shape (suffix arrays don't shard; overlapping shingles
do): each doc emits its K-token shingles WITH positions (in-row
build + one posexplode, ~1 row per token); a shingle hash occurring
more than once corpus-wide marks all its occurrences as duplicated
(one vocab-bounded count + a semi-join back — the same broadcast
shape as benchmark_decontam); per doc, the duplicated positions
merge into MAXIMAL spans with a gaps-and-islands window (fixed
shingle length K makes the union trivial: a new island starts
exactly when the next start is > K past the previous start — the
window partition is one doc's positions, bounded by doc length,
never corpus-sized). Pure integer arithmetic end to end.

A span duplicated WITHIN one doc counts too (global occurrence
count, not distinct-doc count) — self-plagiarized boilerplate is
still boilerplate, and Lee et al. dedup within documents as well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import h32_spark_sql, h32_sql
from ..functions.text import norm_text, norm_text_sql, tokens, tokens_sql
from ..sources.tables import table

_SPAN_K = 8  # minimum duplicated span length, in tokens


def _eligible_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs with >= K normalized tokens — the decision scope shared
    by all three span ops."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.filter(tokens(norm_text(F.col("text"))), lambda x: x != "").alias("tk"),
    ).where(F.size("tk") >= _SPAN_K)


def _pos_hashes(t: DataFrame) -> DataFrame:
    """(doc_id, n_tok, i, key, h): every K-token shingle with its
    position and the global-order BIGINT key the keep-first policy
    argmins. ONE derivation for stats/decision/apply — the
    decision-and-apply conservation invariant is structural, not
    just test-enforced (review finding, round 11)."""
    k = _SPAN_K
    parts = ", ".join(f"tk[i+{j}]" for j in range(k))
    return t.select(
        "doc_id",
        F.size("tk").alias("n_tok"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(tk)-{k}), "
                f"i -> concat_ws(' ', {parts}))"
            )
        ).alias("i", "s"),
    ).select(
        "doc_id",
        "n_tok",
        "i",
        (F.col("doc_id") * F.lit(1_000_000_000) + F.col("i")).alias("key"),
        F.expr(h32_spark_sql("s")).alias("h"),
    )


def _cut_positions(pos: DataFrame) -> DataFrame:
    """Non-canonical occurrences of duplicated shingles — the
    positions the ExactSubstr policy excises (the globally-first
    occurrence, min key per hash, is kept)."""
    per_h = pos.groupBy("h").agg(
        F.count(F.lit(1)).alias("c"), F.min("key").alias("min_key")
    )
    return (
        pos.join(per_h.where(F.col("c") > 1), "h")
        .where(F.col("key") != F.col("min_key"))
        .select("doc_id", "n_tok", "i")
    )


def _maximal_spans(positions: DataFrame) -> DataFrame:
    """Marked shingle-start positions → maximal spans (doc_id, n_tok,
    island, s0, s1) via the gaps-and-islands window (partition = one
    doc's positions, bounded by doc length; spans are disjoint
    because islands merge anything within K)."""
    k = _SPAN_K
    w = Window.partitionBy("doc_id").orderBy("i")
    islands = positions.withColumn(
        "brk",
        F.when(
            F.col("i") - F.lag("i").over(w) > F.lit(k), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy("doc_id", "n_tok", "island").agg(
        F.min("i").alias("s0"), (F.max("i") + F.lit(k) - 1).alias("s1")
    )


def _span_len():
    return F.col("s1") - F.col("s0") + F.lit(1)


def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc (with >= K tokens): token count, number of maximal
    duplicated spans, duplicated-token total, and the duplicated
    fraction in milli (floored — integer, hash-exact)."""
    t = _eligible_tokens(spark, sf_dir)
    pos = _pos_hashes(t)
    dup_h = (
        pos.groupBy("h").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") > 1)
    )
    dup_pos = pos.join(dup_h.select("h"), "h", "left_semi").select(
        "doc_id", "n_tok", "i"
    )
    spans = _maximal_spans(dup_pos)
    agg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_dup_spans"),
        F.sum(_span_len()).alias("dup_tokens"),
    )
    # zero rows for eligible docs with no duplicated shingle come
    # from a LEFT JOIN + coalesce, NOT a unionByName + anti-join: the
    # union spelling evaluates the whole corpus-wide shingle-hash
    # derivation TWICE (Spark shares no subtrees across union
    # branches) — measured 8× slower than the apply op's join shape
    # on the same derivation (round-12 bench audit).
    return t.select("doc_id", F.size("tk").alias("n_tok")).join(
        agg, "doc_id", "left"
    ).select(
        "doc_id",
        "n_tok",
        F.coalesce("n_dup_spans", F.lit(0)).cast("int").alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.floor(
            F.coalesce("dup_tokens", F.lit(0))
            * F.lit(1000)
            / F.col("n_tok").cast("double")
        ).alias("dup_frac_milli"),
    )


_DUP_SPAN_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter({tokens_sql(norm_text_sql('text'))}, x -> x <> '') AS tk
  FROM documents
), el AS (
  SELECT doc_id, len(tk) AS n_tok, tk FROM t WHERE len(tk) >= {_SPAN_K}
), sh AS (
  SELECT doc_id, n_tok,
         unnest(range(0, n_tok - {_SPAN_K} + 1)) AS i,
         unnest(list_transform(range(1, n_tok - {_SPAN_K} + 2),
                i -> {" || ' ' || ".join(f"tk[i+{j}]" for j in range(_SPAN_K))}))
           AS s
  FROM el
), hv AS (
  SELECT doc_id, n_tok, i, {h32_sql('s')} AS h FROM sh
), dup_h AS (
  SELECT h FROM hv GROUP BY h HAVING COUNT(*) > 1
), dup_pos AS (
  SELECT doc_id, n_tok, i FROM hv WHERE h IN (SELECT h FROM dup_h)
), brk AS (
  SELECT doc_id, n_tok, i,
         CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                   > {_SPAN_K} THEN 1 ELSE 0 END AS b
  FROM dup_pos
), isl AS (
  SELECT doc_id, n_tok, i,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS UNBOUNDED PRECEDING) AS island
  FROM brk
), spans AS (
  SELECT doc_id, n_tok, island,
         MAX(i) - MIN(i) + {_SPAN_K} AS span_len
  FROM isl GROUP BY 1, 2, 3
), agg AS (
  SELECT doc_id, CAST(n_tok AS INT) AS n_tok,
         CAST(COUNT(*) AS INT) AS n_dup_spans,
         CAST(SUM(span_len) AS BIGINT) AS dup_tokens,
         CAST(FLOOR(CAST(SUM(span_len) * 1000 AS DOUBLE)
                    / CAST(n_tok AS DOUBLE)) AS BIGINT) AS dup_frac_milli
  FROM spans GROUP BY doc_id, n_tok
)
SELECT * FROM agg
UNION ALL
SELECT doc_id, CAST(n_tok AS INT) AS n_tok,
       0 AS n_dup_spans, 0 AS dup_tokens, 0 AS dup_frac_milli
FROM el
WHERE doc_id NOT IN (SELECT doc_id FROM dup_pos)
"""


# --------------------------------------------------- dup_span_dedup

def dup_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL decision (`dup_span_stats` measures; this cuts):
    for every duplicated K-shingle, the globally FIRST occurrence —
    smallest (doc_id, position), encoded as one BIGINT key so the
    argmin is a plain MIN aggregate in both engines — is kept;
    every other occurrence marks its K-token span for excision.
    Non-canonical positions merge into maximal cut spans with the
    shared gaps-and-islands helper; per doc the op reports tokens
    kept/removed and the cut-span count — the numbers
    `dup_span_apply` applies (both draw their spans from the SAME
    `_cut_positions`/`_maximal_spans` derivation, so the
    conservation invariant is structural).

    Scale notes: the canonical choice is per-shingle-hash (one MIN
    per hash key, map-side combined); everything else is the stats
    op's shape. Keeping the first occurrence is the public
    ExactSubstr policy (deterministic, no coordination: the min key
    is a pure function of the corpus)."""
    t = _eligible_tokens(spark, sf_dir)
    cut_pos = _cut_positions(_pos_hashes(t))
    spans_df = _maximal_spans(cut_pos)
    cut = spans_df.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_cut_spans"),
        F.sum(_span_len()).alias("removed_tokens"),
    )
    # LEFT JOIN + coalesce for the uncut docs — the unionByName +
    # anti-join spelling ran the shingle-hash derivation twice (see
    # dup_span_stats)
    return t.select("doc_id", F.size("tk").alias("n_tok")).join(
        cut, "doc_id", "left"
    ).select(
        "doc_id",
        "n_tok",
        F.coalesce("n_cut_spans", F.lit(0)).cast("int").alias("n_cut_spans"),
        F.coalesce("removed_tokens", F.lit(0))
        .cast("long")
        .alias("removed_tokens"),
        (
            F.col("n_tok") - F.coalesce("removed_tokens", F.lit(0))
        ).cast("long").alias("kept_tokens"),
    )


_DUP_SPAN_DEDUP_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter({tokens_sql(norm_text_sql('text'))}, x -> x <> '') AS tk
  FROM documents
), el AS (
  SELECT doc_id, len(tk) AS n_tok, tk FROM t WHERE len(tk) >= {_SPAN_K}
), sh AS (
  SELECT doc_id, n_tok,
         unnest(range(0, n_tok - {_SPAN_K} + 1)) AS i,
         unnest(list_transform(range(1, n_tok - {_SPAN_K} + 2),
                i -> {" || ' ' || ".join(f"tk[i+{j}]" for j in range(_SPAN_K))}))
           AS s
  FROM el
), hv AS (
  SELECT doc_id, n_tok, i,
         doc_id * 1000000000 + i AS key,
         {h32_sql('s')} AS h
  FROM sh
), per_h AS (
  SELECT h, COUNT(*) AS c, MIN(key) AS min_key FROM hv GROUP BY h
), cut_pos AS (
  SELECT doc_id, n_tok, i
  FROM hv JOIN per_h USING (h)
  WHERE c > 1 AND key <> min_key
), brk AS (
  SELECT doc_id, n_tok, i,
         CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                   > {_SPAN_K} THEN 1 ELSE 0 END AS b
  FROM cut_pos
), isl AS (
  SELECT doc_id, n_tok, i,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS UNBOUNDED PRECEDING) AS island
  FROM brk
), spans AS (
  SELECT doc_id, n_tok, island,
         MAX(i) - MIN(i) + {_SPAN_K} AS span_len
  FROM isl GROUP BY doc_id, n_tok, island
), agg AS (
  SELECT doc_id, CAST(n_tok AS INT) AS n_tok,
         CAST(COUNT(*) AS INT) AS n_cut_spans,
         CAST(SUM(span_len) AS BIGINT) AS removed_tokens,
         CAST(n_tok - SUM(span_len) AS BIGINT) AS kept_tokens
  FROM spans GROUP BY doc_id, n_tok
)
SELECT * FROM agg
UNION ALL
SELECT doc_id, CAST(n_tok AS INT) AS n_tok, 0 AS n_cut_spans,
       0 AS removed_tokens, CAST(n_tok AS BIGINT) AS kept_tokens
FROM el
WHERE doc_id NOT IN (SELECT doc_id FROM cut_pos)
"""


# --------------------------------------------------- dup_span_apply

def dup_span_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus REWRITE (`dup_span_dedup` decides; this excises —
    the actual output of the Lee et al. pipeline, VERDICT r10 item
    #5): apply the cut spans to every eligible doc and emit the
    rewritten token stream. Per doc: n_tok, kept_tokens, and
    `rewritten` = the surviving tokens joined by single spaces (the
    normalized token stream is the unit the decision op reasons in,
    so it is what the rewrite emits; docs with < K tokens are outside
    the decision's scope and are excluded here too, same as the
    decision op).

    Distributed shape: the SAME `_cut_positions`/`_maximal_spans`
    derivation as the decision op (conservation is structural), then
    the spans collapse to ONE in-row array per doc (collect_list
    over the doc's few cut spans, never corpus-sized) and the
    excision itself is a pure in-row `filter/transform` over token
    positions — whole-stage codegen, zero extra shuffles beyond the
    decision op's."""
    t = _eligible_tokens(spark, sf_dir)
    cuts = (
        _maximal_spans(_cut_positions(_pos_hashes(t)))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s0", "s1")).alias("cuts"))
    )
    return (
        t.join(cuts, "doc_id", "left")
        .select(
            "doc_id",
            F.size("tk").alias("n_tok"),
            F.expr(
                "filter(sequence(0, size(tk)-1), "
                "p -> cuts IS NULL OR NOT exists(cuts, "
                "c -> p >= c.s0 AND p <= c.s1))"
            ).alias("keep"),
            "tk",
        )
        .select(
            "doc_id",
            "n_tok",
            F.size("keep").cast("long").alias("kept_tokens"),
            F.expr("concat_ws(' ', transform(keep, p -> tk[p]))").alias(
                "rewritten"
            ),
        )
    )


_DUP_SPAN_APPLY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter({tokens_sql(norm_text_sql('text'))}, x -> x <> '') AS tk
  FROM documents
), el AS MATERIALIZED (
  SELECT doc_id, len(tk) AS n_tok, tk FROM t WHERE len(tk) >= {_SPAN_K}
), sh AS (
  SELECT doc_id,
         unnest(range(0, n_tok - {_SPAN_K} + 1)) AS i,
         unnest(list_transform(range(1, n_tok - {_SPAN_K} + 2),
                i -> {" || ' ' || ".join(f"tk[i+{j}]" for j in range(_SPAN_K))}))
           AS s
  FROM el
), hv AS MATERIALIZED (
  SELECT doc_id, i,
         doc_id * 1000000000 + i AS key,
         {h32_sql('s')} AS h
  FROM sh
), per_h AS (
  SELECT h, COUNT(*) AS c, MIN(key) AS min_key FROM hv GROUP BY h
), cut_pos AS (
  SELECT doc_id, i
  FROM hv JOIN per_h USING (h)
  WHERE c > 1 AND key <> min_key
), brk AS (
  SELECT doc_id, i,
         CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                   > {_SPAN_K} THEN 1 ELSE 0 END AS b
  FROM cut_pos
), isl AS (
  SELECT doc_id, i,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS UNBOUNDED PRECEDING) AS island
  FROM brk
), spans AS MATERIALIZED (
  SELECT doc_id, MIN(i) AS s0, MAX(i) + {_SPAN_K} - 1 AS s1
  FROM isl GROUP BY doc_id, island
), pos AS (
  SELECT doc_id, n_tok, tk, unnest(range(0, n_tok)) AS p FROM el
), keep AS MATERIALIZED (
  SELECT doc_id, n_tok, tk[p + 1] AS tok, p FROM pos
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = pos.doc_id AND pos.p BETWEEN s.s0 AND s.s1
  )
)
SELECT doc_id, CAST(n_tok AS INT) AS n_tok,
       CAST(COUNT(*) AS BIGINT) AS kept_tokens,
       string_agg(tok, ' ' ORDER BY p) AS rewritten
FROM keep GROUP BY doc_id, n_tok
UNION ALL
SELECT doc_id, CAST(n_tok AS INT) AS n_tok,
       0 AS kept_tokens, '' AS rewritten
FROM el
WHERE doc_id NOT IN (SELECT doc_id FROM keep)
"""


# ------------------------------------- span_rewrite_sink_roundtrip

def span_rewrite_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rewrite WRITTEN BACK as a partitioned documents table
    (VERDICT r11 #5): `dup_span_apply`'s output joins its lang
    column, goes through the corpus sink (hive-partitioned by lang,
    doc_id-sorted — sinks/corpus.py), and the STORED table is read
    back into a per-lang integer aggregate the oracle computes
    straight from `documents`. A row lost, duplicated, or mutated by
    the partitioned write breaks the hash (rewritten_h is an md5
    hash-sum over the stored rewritten streams); kept-token
    conservation against `dup_span_dedup` is re-checked ON THE
    STORED OUTPUT by the pytest sibling."""
    from ..functions.hashing import h32
    from ..sinks.corpus import write_corpus
    from .sinkcheck import scratch_dir

    rew = dup_span_apply(spark, sf_dir).join(
        table(spark, sf_dir, "documents").select("doc_id", "lang"), "doc_id"
    )
    out = scratch_dir("span_rewrite") + "/t"
    write_corpus(rew, out)
    back = spark.read.parquet(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tok_sum"),
        F.sum("kept_tokens").alias("kept_sum"),
        F.sum(h32(F.col("rewritten"))).alias("rewritten_h"),
    )


_SPAN_REWRITE_SINK_SQL = f"""
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(a.n_tok) AS BIGINT) AS n_tok_sum,
       CAST(SUM(a.kept_tokens) AS BIGINT) AS kept_sum,
       CAST(SUM({h32_sql('a.rewritten')}) AS BIGINT) AS rewritten_h
FROM ({_DUP_SPAN_APPLY_SQL}) a
JOIN documents d USING (doc_id)
GROUP BY 1
"""


QUERIES = {
    "dup_span_stats": dup_span_stats,
    "dup_span_dedup": dup_span_dedup,
    "dup_span_apply": dup_span_apply,
    "span_rewrite_sink_roundtrip": span_rewrite_sink_roundtrip,
}

ORACLE = {
    "dup_span_stats": _DUP_SPAN_SQL,
    "dup_span_dedup": _DUP_SPAN_DEDUP_SQL,
    "dup_span_apply": _DUP_SPAN_APPLY_SQL,
    "span_rewrite_sink_roundtrip": _SPAN_REWRITE_SINK_SQL,
}
