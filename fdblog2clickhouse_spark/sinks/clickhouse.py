"""ClickHouse sink: schema management + JSONEachRow HTTP inserts
(SURVEY §2.8).

Re-expresses the reference's sink surface Spark-first:
- DDL generation from a declared column-spec table
  (≙ trace-converter.py:20-61 `clickhouse_schema`/`create_schema`):
  MergeTree, PARTITION BY toYYYYMM(time), ORDER BY (time), per-column
  codecs/comments, CREATE ... IF NOT EXISTS.
- JSONEachRow encoding (≙ trace-converter.py:66-72 `insert_trace`)
  done DISTRIBUTED: to_json(struct(*)) per row JVM-side, POSTed per
  partition from executors — no driver collect. ClickHouse is built
  for many concurrent bulk inserts (reference README.md:193-206), so
  per-partition POSTs of tens of thousands of rows is exactly the
  ingestion pattern it wants.
- HTTP basic auth via env or args (≙ trace-converter.py:11-17).

`requests` is import-gated; dry_run mode spools the exact payloads to
local files so tests (and air-gapped runs) exercise the full path
minus the socket.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    import requests

    HAVE_REQUESTS = True
except ImportError:  # pragma: no cover - baked-in envs usually have it
    requests = None
    HAVE_REQUESTS = False


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    ch_type: str
    codec: str = "CODEC(ZSTD)"
    comment: str = ""


# The reference's trace column set (trace-converter.py:85-93).
TRACE_COLUMNS = [
    ColumnSpec("severity", "UInt32", "CODEC(Delta, ZSTD)", "Event Severity Code"),
    ColumnSpec("machine", "String", "CODEC(ZSTD)", "Machine ID for Event"),
    ColumnSpec("log_group", "String", "CODEC(ZSTD)", "Group for Event Type"),
    ColumnSpec("time", "DateTime", "CODEC(ZSTD)", "Event Timestamp"),
    ColumnSpec("type", "String", "CODEC(ZSTD)", "Event Type"),
    ColumnSpec("id", "Nullable(String)", "CODEC(ZSTD)", "Event Identifier"),
]


def _esc(comment: str) -> str:
    """Escape a ClickHouse single-quoted string literal (double the
    quotes) — a comment containing an apostrophe must not produce
    malformed DDL."""
    return comment.replace("\\", "\\\\").replace("'", "''")


def mergetree_ddl(
    table: str,
    columns: list[ColumnSpec],
    *,
    partition_expr: str = "toYYYYMM(time)",
    order_by: str = "(time)",
    index_granularity: int = 8192,
) -> str:
    """MergeTree CREATE TABLE DDL from a column-spec table."""
    lines = []
    for i, c in enumerate(columns):
        lead = "  ( " if i == 0 else "  , "
        lines.append(
            f"{lead}`{c.name}`".ljust(20)
            + f" {c.ch_type}".ljust(20)
            + f" COMMENT '{_esc(c.comment)}'".ljust(32)
            + f" {c.codec}"
        )
    body = "\n".join(lines)
    return (
        f"CREATE TABLE IF NOT EXISTS `{table}`\n"
        f"{body}\n"
        f"  ) ENGINE = MergeTree()\n"
        f"    PARTITION BY\n      {partition_expr}\n"
        f"    ORDER BY\n      {order_by}\n"
        f"    SETTINGS\n      index_granularity={index_granularity}"
    )


# Spark → ClickHouse type mapping for schema derivation. The
# reference builds its column dict by hand next to the pandas frame
# (trace-converter.py:85-93); Spark-native, the DataFrame schema IS
# the source of truth, so the column specs derive from it.
_SPARK_TO_CH = {
    "byte": "Int8",
    "short": "Int16",
    "integer": "Int32",
    "int": "Int32",
    "long": "Int64",
    "bigint": "Int64",
    "float": "Float32",
    "double": "Float64",
    "boolean": "UInt8",
    "string": "String",
    "binary": "String",
    "date": "Date",
    "timestamp": "DateTime64(6)",
    "timestamp_ntz": "DateTime64(6)",
}


def _ch_type(dt, nullable: bool) -> str:
    """Recursive Spark-type → ClickHouse-type mapping. Handles
    decimal(p,s) → Decimal(p, s) (every §2.2 money aggregate), arrays
    → Array(T) (embedding columns), and maps → Map(K, V). ClickHouse
    containers are themselves non-nullable (there is no
    Nullable(Array)); nullability applies to the element/value side
    only. Unsupported types still raise rather than guess."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType

    if isinstance(dt, DecimalType):
        base = f"Decimal({dt.precision}, {dt.scale})"
    elif isinstance(dt, ArrayType):
        return f"Array({_ch_type(dt.elementType, dt.containsNull)})"
    elif isinstance(dt, MapType):
        # ClickHouse Map keys must be non-nullable
        return (
            f"Map({_ch_type(dt.keyType, False)}, "
            f"{_ch_type(dt.valueType, dt.valueContainsNull)})"
        )
    else:
        base = _SPARK_TO_CH.get(dt.typeName())
        if base is None:
            raise ValueError(
                f"no ClickHouse mapping for Spark type {dt.simpleString()!r}"
            )
    if nullable and not base.startswith("Nullable("):
        base = f"Nullable({base})"
    return base


def spark_schema_to_columns(schema) -> list[ColumnSpec]:
    """Derive ClickHouse column specs from a Spark StructType — the
    sink's CREATE/ALTER DDL then always reflects what the pipeline
    actually produces (no hand-maintained parallel column list to
    drift). Nullable Spark fields map to Nullable(T); unsupported
    types raise rather than guess."""
    cols = []
    for f in schema.fields:
        try:
            ch = _ch_type(f.dataType, f.nullable)
        except ValueError as e:
            raise ValueError(f"{e} (column {f.name!r})") from None
        cols.append(ColumnSpec(f.name, ch))
    return cols


def alter_ddl(
    table: str,
    deployed: list[ColumnSpec],
    desired: list[ColumnSpec],
    *,
    drop_removed: bool = False,
) -> list[str]:
    """Schema evolution: the ALTER TABLE statements that migrate a
    deployed MergeTree table to the desired column set — ADD COLUMN
    (positioned with AFTER, so the physical order matches the spec),
    MODIFY COLUMN on type/codec/comment change, and DROP COLUMN only
    when explicitly allowed (dropping data is never the default; by
    default removed columns are left in place and reported as a
    comment line). Returns [] when schemas already agree — callers
    can gate deploys on that."""
    deployed_by_name = {c.name: c for c in deployed}
    desired_names = {c.name for c in desired}
    stmts: list[str] = []
    prev: str | None = None
    for c in desired:
        old = deployed_by_name.get(c.name)
        if old is None:
            pos = f" AFTER `{prev}`" if prev is not None else " FIRST"
            stmts.append(
                f"ALTER TABLE `{table}` ADD COLUMN IF NOT EXISTS "
                f"`{c.name}` {c.ch_type} COMMENT '{_esc(c.comment)}' {c.codec}{pos}"
            )
        elif (old.ch_type, old.codec, old.comment) != (c.ch_type, c.codec, c.comment):
            stmts.append(
                f"ALTER TABLE `{table}` MODIFY COLUMN "
                f"`{c.name}` {c.ch_type} COMMENT '{_esc(c.comment)}' {c.codec}"
            )
        prev = c.name
    for c in deployed:
        if c.name not in desired_names:
            if drop_removed:
                stmts.append(f"ALTER TABLE `{table}` DROP COLUMN IF EXISTS `{c.name}`")
            else:
                stmts.append(
                    f"-- column `{c.name}` no longer produced; "
                    f"pass drop_removed=True to emit DROP COLUMN"
                )
    return stmts


def jsoneachrow(df: DataFrame) -> DataFrame:
    """Encode rows as JSONEachRow lines, JVM-side, fully distributed.
    Returns a single-string-column DataFrame ('line')."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("line"))


def _post_lines(lines: list[str], url: str, params: dict, auth, spool_dir: str | None):
    payload = "\n".join(lines)
    if spool_dir is not None:
        os.makedirs(spool_dir, exist_ok=True)
        fname = os.path.join(spool_dir, f"batch-{uuid.uuid4().hex}.jsonl")
        with open(fname, "w") as f:
            f.write(payload)
        return
    if not HAVE_REQUESTS:
        raise RuntimeError("requests not available; use dry_run spooling")
    r = requests.post(url, params=params, data=payload.encode(), auth=auth)
    r.raise_for_status()


@dataclass
class ClickHouseHttpSink:
    """HTTP sink with the reference's env-var surface. dry_run spools
    payloads to `spool_dir` instead of POSTing."""

    addr: str = field(default_factory=lambda: os.environ.get("CLICKHOUSE_ADDR", ""))
    database: str = field(default_factory=lambda: os.environ.get("CLICKHOUSE_DB", ""))
    table: str = field(default_factory=lambda: os.environ.get("CLICKHOUSE_TABLE", ""))
    user: str | None = field(default_factory=lambda: os.environ.get("CLICKHOUSE_USER"))
    password: str | None = field(
        default_factory=lambda: os.environ.get("CLICKHOUSE_PASS")
    )
    spool_dir: str | None = None  # set → dry run

    @property
    def _auth(self):
        if self.user is not None and self.password is not None:
            return (self.user, self.password)
        return None

    def create_schema(self, columns: list[ColumnSpec]) -> str:
        ddl = mergetree_ddl(self.table, columns)
        if self.spool_dir is None:
            _post_lines(
                [f"CREATE DATABASE IF NOT EXISTS {self.database}"],
                self.addr,
                {},
                self._auth,
                None,
            )
            _post_lines([ddl], self.addr, {"database": self.database}, self._auth, None)
        return ddl

    def insert(self, df: DataFrame, *, batch_size: int = 50_000) -> None:
        """Distributed JSONEachRow insert: each partition POSTs its
        own bulk batches straight from the executor."""
        url = self.addr
        params = {
            "database": self.database,
            "query": f"INSERT INTO {self.table} FORMAT JSONEachRow",
        }
        auth = self._auth
        spool = self.spool_dir
        lines_df = jsoneachrow(df)

        def send_partition(rows):
            buf: list[str] = []
            for row in rows:
                buf.append(row["line"])
                if len(buf) >= batch_size:
                    _post_lines(buf, url, params, auth, spool)
                    buf = []
            if buf:
                _post_lines(buf, url, params, auth, spool)

        lines_df.foreachPartition(send_partition)

    def foreach_batch(self):
        """Adapter for streaming: writeStream.foreachBatch(sink.foreach_batch()).
        Prints one status line per micro-batch (rows + destination) —
        the reference logs df.info() and the HTTP response per batch
        (trace-converter.py:122-127); this is the Spark-side analog."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            # persist so the count for the status line and the insert
            # share ONE computation of the micro-batch (without it,
            # count() + insert() each recompute the whole batch plan —
            # a 2x sink-path cost at scale).
            batch_df.persist()
            try:
                n = batch_df.count()
                self.insert(batch_df)
            finally:
                batch_df.unpersist()
            dest = self.spool_dir or f"{self.addr} {self.database}.{self.table}"
            print(f"[trace-convert] batch {batch_id}: rows={n} -> {dest} ok")

        return _fn
