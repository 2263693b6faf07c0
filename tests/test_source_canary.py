"""Source-integrity canary (VERDICT r4 item #2).

The driver regenerates /root/testdata between rounds and has already
changed events.ts encoding once (TIMESTAMP(NANOS) → timestamp[us]).
The batch loader fails loudly on an unknown encoding, but a streaming
reader with a forced schema can silently misread timestamps (the r4
failure: `ts long` over a µs file → every ts shrunk 1000×). These
tests make the NEXT silent format change fail loudly by asserting the
streamed source and the batch table agree exactly, and that the
values land in the documented epoch range (TESTDATA.md: 2024 data).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from fdblog2clickhouse_spark.sources.tables import events_stream, events_ts_kind, table
from fdblog2clickhouse_spark.streaming.queries import _run_to_memory


def _summary(df):
    return df.select(
        F.count("*").alias("n"),
        F.unix_micros(F.min("ts")).alias("min_us"),
        F.unix_micros(F.max("ts")).alias("max_us"),
        F.sum(F.unix_micros("ts")).alias("sum_us"),
    ).collect()[0]


def test_events_ts_kind_recognized(sf_smoke):
    # raises ValueError on an unrecognized encoding — that IS the canary
    assert events_ts_kind(sf_smoke) in ("nanos", "micros")


def test_batch_events_in_documented_epoch_range(spark, sf_smoke):
    row = _summary(table(spark, sf_smoke, "events"))
    lo = 1_500_000_000 * 1_000_000  # 2017-07 — generously below the 2024 corpus
    hi = 2_000_000_000 * 1_000_000  # 2033-05 — generously above
    assert lo < row["min_us"] <= row["max_us"] < hi, row
    assert row["n"] > 0


def test_stream_and_batch_events_agree(spark, sf_smoke):
    """count / min / max / sum of ts identical between the streaming
    source and the batch table — a 1000× shrink (or any unit skew)
    fails all four."""
    batch = _summary(table(spark, sf_smoke, "events"))
    streamed = _run_to_memory(
        spark,
        events_stream(spark, sf_smoke).select("ts"),
        "ts_canary",
        "append",
    )
    got = _summary(streamed)
    assert got == batch


def _row_checksum(df):
    """Order-free whole-row checksum over ALL columns (everything
    stringified through the same cast path on both sides)."""
    concat = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in sorted(df.columns)]
    )
    return df.select(
        F.count("*").alias("n"),
        F.sum(F.crc32(concat)).alias("crc_sum"),
    ).collect()[0]


def test_stream_and_batch_events_agree_all_columns(spark, sf_smoke):
    """The stream schema is derived from the parquet footer, so a
    regenerated events.parquet with an added/renamed column must
    surface identically in both paths — a hard-coded stream schema
    would yield silent nulls for the new column while batch reads
    real values. Schema equality + full-row checksum catch that."""
    b = table(spark, sf_smoke, "events")
    s = events_stream(spark, sf_smoke)
    assert [(f.name, f.dataType) for f in s.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ]
    streamed = _run_to_memory(spark, s, "events_canary_full", "append")
    assert _row_checksum(streamed) == _row_checksum(b)
