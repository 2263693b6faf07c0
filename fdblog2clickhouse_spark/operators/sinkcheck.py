"""Driver-oracle-checked sink roundtrips (SURVEY §2.8).

The §2.8 sink components are unit-tested, but until round 8 none had
a DRIVER oracle row — the strongest gate in the repo. These two
operators close that: each writes the events table through a real
sink path into a scratch dir, reads it back, and returns an
integer-exact aggregate the DuckDB oracle computes directly from the
source table. A sink bug that drops, duplicates, or corrupts rows —
in the partitioned write, the compaction rewrite, or the Z-order
clustering — breaks the hash match.

Same scratch-dir pattern as the streaming operators
(streaming/queries.py:128): the write is part of the operator, the
returned DataFrame is the roundtrip evidence.

Reference parity: the reference's whole contract is "rows in equal
rows queryable" across its MergeTree table (trace-converter.py:
46-72); this is that contract, oracle-enforced, for the Spark-native
table layouts.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import cents, cents_sql
from ..sources.tables import table


def scratch_dir(name: str) -> str:
    """Deterministic per-operator scratch dir, WIPED on entry so
    repeated bench/correctness runs overwrite one copy instead of
    accumulating mkdtemp leftovers in /tmp (ADVICE r8). Keyed by pid
    so concurrent driver + pytest sessions don't race each other."""
    d = os.path.join(tempfile.gettempdir(), f"sinkcheck_{name}_{os.getpid()}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def mergetree_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → MergeTree-style sink (2 append batches → the
    small-file state streaming leaves) → OPTIMIZE-FINAL compaction →
    read back → per-partition integer aggregate. The oracle computes
    the same aggregate straight from `events`, so the write +
    compact + read cycle must be row-exact to hash-match."""
    from ..sinks.mergetree import optimize_mergetree, read_mergetree, write_mergetree

    e = table(spark, sf_dir, "events").select(
        F.col("ts").alias("time"), "event_id", "event_type", "value"
    )
    out = scratch_dir("mt_roundtrip") + "/t"
    # two appends = at least two files per partition, so compaction
    # has real merge work before the read. pmod (not %): Spark's %
    # takes the dividend's sign, so a negative odd event_id would
    # match neither == 0 nor == 1 and silently vanish from the
    # roundtrip — pmod makes the split a true partition of all rows.
    write_mergetree(e.where(F.pmod(F.col("event_id"), F.lit(2)) == 0), out, mode="append")
    write_mergetree(e.where(F.pmod(F.col("event_id"), F.lit(2)) == 1), out, mode="append")
    optimize_mergetree(spark, out)
    back = read_mergetree(spark, out)
    return back.groupBy(F.col("yyyymm").cast("int").alias("yyyymm")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
        F.min(F.unix_micros(F.col("time"))).alias("min_us"),
        F.max(F.unix_micros(F.col("time"))).alias("max_us"),
        F.countDistinct("event_id").alias("n_ids"),
    )


_MERGETREE_ROUNDTRIP_SQL = f"""
SELECT CAST(year(ts) * 100 + month(ts) AS INT) AS yyyymm,
       COUNT(*) AS n_rows,
       CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents,
       epoch_us(MIN(ts)) AS min_us,
       epoch_us(MAX(ts)) AS max_us,
       COUNT(DISTINCT event_id) AS n_ids
FROM events
GROUP BY 1
"""


def zorder_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → Z-order clustered sink on (user_id, value) → read
    back → per-event_type integer aggregate. Clustering is a pure
    REORDERING; the oracle aggregates the source directly, so any
    row lost/duplicated/mutated by the Morton-key pipeline breaks
    the match."""
    from ..sinks.zorder import write_zordered

    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = scratch_dir("z_roundtrip") + "/t"
    write_zordered(e, out, ["user_id", "value"], num_files=4)
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
        F.sum("event_id").alias("id_sum"),
        F.countDistinct("user_id").alias("n_users"),
    )


_ZORDER_ROUNDTRIP_SQL = f"""
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents,
       CAST(SUM(event_id) AS BIGINT) AS id_sum,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


QUERIES = {
    "mergetree_sink_roundtrip": mergetree_sink_roundtrip,
    "zorder_sink_roundtrip": zorder_sink_roundtrip,
}

ORACLE = {
    "mergetree_sink_roundtrip": _MERGETREE_ROUNDTRIP_SQL,
    "zorder_sink_roundtrip": _ZORDER_ROUNDTRIP_SQL,
}
