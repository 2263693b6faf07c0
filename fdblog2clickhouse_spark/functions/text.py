"""Shared text primitives, mirrored Spark-side and DuckDB-side.

Every primitive has a Spark Column/SQL form and a DuckDB SQL form
with IDENTICAL semantics, so dedup/text operators stay
oracle-checkable. Note DuckDB regexp_replace needs the 'g' flag to
match Spark's replace-all default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------- normalization

def norm_text(col: Column) -> Column:
    """lowercase + trim + collapse runs of whitespace to one space."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def norm_text_sql(expr: str) -> str:
    return f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"


# -------------------------------------------------------- tokens

def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


# ----------------------------------------- token n-gram shingles

def shingles_expr(tok_col_name: str, n: int = 3) -> str:
    """Spark SQL expr: n-token shingles of array column `tok_col_name`.
    Caller must filter size(toks) >= n (sequence() would reverse on a
    negative span)."""
    parts = ", ".join(f"{tok_col_name}[i+{j}]" for j in range(n))
    return (
        f"transform(sequence(0, size({tok_col_name})-{n}), "
        f"i -> concat_ws(' ', {parts}))"
    )


def shingles_cte_sql(doc_table: str, text_expr: str, n: int = 3) -> str:
    """DuckDB CTE body producing (doc_id, s) DISTINCT n-token shingles."""
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
  toks AS (
    SELECT doc_id, {tokens_sql(text_expr)} AS t FROM {doc_table}
  ), idx AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t)-{n - 1})) AS i
    FROM toks WHERE len(t) >= {n}
  ), sh AS (
    SELECT DISTINCT doc_id, {parts} AS s FROM idx
  )"""


# ------------------------------------------ char n-gram helpers

def char_ngrams_expr(norm_col_name: str, n: int = 5) -> str:
    """Spark SQL expr: character n-grams of string column (1-based
    substring, same as DuckDB substr). Caller filters length >= n."""
    return (
        f"transform(sequence(1, length({norm_col_name})-{n - 1}), "
        f"i -> substring({norm_col_name}, i, {n}))"
    )
