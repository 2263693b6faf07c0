"""Skew-mitigation helpers: two-phase (salted) aggregation.

AQE's skew-join splitting cannot split a single hot KEY GROUP — when
one key holds a disproportionate share of rows (the 100 TB reality:
one hot machine, one boilerplate document), the reducer owning that
key becomes the straggler. Salting splits each key into `n_salts`
sub-keys for a first partial aggregate, then merges the partials in a
second (now-balanced) aggregate. Works for any commutative
aggregation (count/sum/min/max).

The salt must be DETERMINISTIC (derived from a row column, never
rand()) or retried tasks double-count under speculative execution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    *,
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase SUM+COUNT per key group. `salt_col` names any
    high-cardinality column used to derive the deterministic salt.
    Returns one row per key with columns (``*keys``, n, total) —
    identical to a direct groupBy, but the hot key's rows split
    across `n_salts` reducers in phase one."""
    salt = (F.xxhash64(F.col(salt_col)) % n_salts).alias("_salt")
    phase1 = (
        df.select(*keys, salt, value.alias("_v"))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_v").alias("_t"))
    )
    return phase1.groupBy(*keys).agg(
        F.sum("_n").alias("n"), F.sum("_t").alias("total")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    salt_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact⋈dim join with deterministic key salting: the fact
    side's hot key splits across `n_salts` sub-partitions (salt
    derived from `salt_col`, a high-cardinality FACT column — never
    rand(), or speculative retries change the result); the dim side
    replicates ×n_salts via one explode. Result row-set is identical
    to the plain join.

    Use when the dim is too big to broadcast AND a fact key is hot
    enough that AQE's skew splitting (which only splits partitions,
    not single key groups spread over one reducer's hash bucket)
    leaves a straggler. Cost: dim inflates ×n_salts — bounded, known,
    and spread evenly; the hot reducer disappears."""
    # pmod, not %: xxhash64 is signed and % keeps the sign (and abs()
    # still maps Long.MIN_VALUE negative) — the salt must land in
    # [0, n_salts) to meet the replicated dim values.
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("_salt")
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, [key, "_salt"], how).drop("_salt")
