"""Z-order (Morton-curve) clustering for the parquet sink
(SURVEY §2.8) — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` analog.

``write_mergetree`` sorts within partitions on ONE column, so
min/max row-group statistics prune scans filtered on that column
only; a predicate on any other column reads every row group. Z-order
interleaves the bits of several rank-normalized columns into one
sort key, so each parquet file covers a small HYPER-RECTANGLE of the
value space and min/max stats prune scans on ANY of the clustered
columns — the multi-dimensional locality MergeTree gets from a
compound primary key, and what Delta's OPTIMIZE ZORDER buys at
lakehouse scale.

Everything is column algebra (shift/or over a static 16-step
expression tree — whole-stage codegen, no UDF). The only driver-side
data is one min/max row per clustered column (bounded by the column
count). Scale shape: one stats pass (map-side-combined aggregate),
then repartitionByRange on the z-key (range exchange = the sort
shuffle Spark would pay for any global clustering) and a
sortWithinPartitions that folds into the same exchange's local sort.

Reference parity: the reference's table is ORDER BY (Time) only
(trace-converter.py:46-54); this module is the engine-side answer to
the compound ORDER BY its users would declare for multi-column scan
locality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bits per dimension; 16 bits × up to 3 cols (the cap zorder_key
# enforces: len(cols) * _ZBITS must stay within int64's 62 usable
# bits) — 3 × 16 = 48 interleaved bits.
_ZBITS = 16


def _zvalue(norm_cols: list[Column]) -> Column:
    """Interleave the low _ZBITS bits of the given (already
    rank-normalized, non-negative int) columns into one Morton key.
    Bit i of column c lands at position i*len(cols) + c, so no two
    inputs collide and the key is total-ordered on the curve."""
    n = len(norm_cols)
    z = F.lit(0).cast("long")
    for i in range(_ZBITS):
        for c, col in enumerate(norm_cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + c
                )
            )
    return z


def zorder_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append a ``_z`` Morton-key column over `cols` (numeric or
    timestamp). Each column is min/max-normalized to [0, 2^16) with
    the SAME fixed double op order on every row, from ONE aggregated
    stats row (broadcast join — the corpus is scanned once for stats,
    once for the key)."""
    if not cols or len(cols) * _ZBITS > 62:
        raise ValueError(f"1..3 z-order columns supported, got {cols!r}")
    nums = {c: F.col(c).cast("double") for c in cols}
    stats = df.agg(
        *[F.min(e).alias(f"mn_{c}") for c, e in nums.items()],
        *[F.max(e).alias(f"mx_{c}") for c, e in nums.items()],
    )
    j = df.crossJoin(F.broadcast(stats))
    scale = F.lit(float((1 << _ZBITS) - 1))
    norm = [
        F.when(
            F.col(f"mx_{c}") > F.col(f"mn_{c}"),
            F.floor(
                (nums[c] - F.col(f"mn_{c}"))
                / (F.col(f"mx_{c}") - F.col(f"mn_{c}"))
                * scale
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias(f"_n_{c}")
        for c in cols
    ]
    keyed = j.select(*df.columns, _zvalue([n for n in norm]).alias("_z"))
    return keyed


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet clustered on the Z-curve of `cols`:
    range-partition on the Morton key (one range exchange — the same
    shuffle any global clustering costs) into `num_files` splits,
    locally sorted so every file covers a compact curve segment =
    a small hyper-rectangle in (cols) space. Row-group min/max stats
    then prune scans filtered on ANY clustered column; see
    tests/test_zorder.py for the measured per-file span contraction
    vs a single-column sort."""
    keyed = zorder_key(df, cols)
    (
        keyed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
