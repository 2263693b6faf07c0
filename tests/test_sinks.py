"""Sink & schema-management tests (SURVEY §2.8) — parity with the
reference's DDL/JSONEachRow/partitioning behavior."""

from __future__ import annotations

import glob
import json
import os
import tempfile

from pyspark.sql import functions as F

from fdblog2clickhouse_spark.operators.trace_ops import trace_normalize
from fdblog2clickhouse_spark.sinks.clickhouse import (
    TRACE_COLUMNS,
    ClickHouseHttpSink,
    ColumnSpec,
    alter_ddl,
    jsoneachrow,
    mergetree_ddl,
    spark_schema_to_columns,
)
from fdblog2clickhouse_spark.sinks.mergetree import read_mergetree, write_mergetree
from fdblog2clickhouse_spark.sources.tables import table


def test_ddl_structure():
    ddl = mergetree_ddl("cluster01", TRACE_COLUMNS)
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS `cluster01`")
    for c in TRACE_COLUMNS:
        assert f"`{c.name}`" in ddl
        assert c.ch_type in ddl
    assert "ENGINE = MergeTree()" in ddl
    assert "toYYYYMM(time)" in ddl
    assert "ORDER BY" in ddl and "(time)" in ddl
    assert "index_granularity=8192" in ddl


def test_schema_derivation_from_dataframe(spark, sf_smoke):
    """Column specs derive from the normalized trace DataFrame's own
    schema — the DDL always reflects what the pipeline produces."""
    rows = _trace_rows(spark, sf_smoke)
    cols = spark_schema_to_columns(rows.schema)
    assert [c.name for c in cols] == rows.columns
    by_name = {c.name: c.ch_type for c in cols}
    assert by_name["time"] in ("DateTime64(6)", "Nullable(DateTime64(6))")
    assert "Int" in by_name["severity"]
    ddl = mergetree_ddl("derived", cols)
    for c in rows.columns:
        assert f"`{c}`" in ddl


def test_schema_derivation_maps_decimal_array_map(spark, sf_smoke):
    """The container/decimal mappings the r7 verdict flagged: sinking
    a money aggregate or the embeddings table must not raise.
    ClickHouse containers are non-nullable (no Nullable(Array))."""
    from pyspark.sql import functions as F

    emb = table(spark, sf_smoke, "embeddings")
    by = {c.name: c.ch_type for c in spark_schema_to_columns(emb.schema)}
    assert by["embedding"].startswith("Array(")
    assert "Nullable(Array" not in by["embedding"]

    money = spark.sql(
        "SELECT CAST(1.50 AS DECIMAL(12,2)) AS amt, "
        "map('k', CAST(1 AS BIGINT)) AS m"
    )
    by = {c.name: c.ch_type for c in spark_schema_to_columns(money.schema)}
    assert "Decimal(12, 2)" in by["amt"]
    assert by["m"].startswith("Map(String")

    # every §2.2 aggregate result schema must map without raising
    from fdblog2clickhouse_spark.operators import tpch

    q1 = tpch.QUERIES["tpch_q1"](spark, sf_smoke)
    assert len(spark_schema_to_columns(q1.schema)) == len(q1.columns)


def test_schema_derivation_rejects_unmapped_types(spark, sf_smoke):
    import pytest

    nested = spark.sql("SELECT named_struct('a', 1) AS s")  # struct column
    with pytest.raises(ValueError, match="no ClickHouse mapping"):
        spark_schema_to_columns(nested.schema)


def test_alter_ddl_evolution():
    """ADD positioned with AFTER, MODIFY on any spec change, DROP only
    when explicitly allowed, [] when schemas agree."""
    deployed = list(TRACE_COLUMNS)
    assert alter_ddl("t", deployed, deployed) == []

    widened = deployed + [ColumnSpec("trace_file", "String", comment="source file")]
    stmts = alter_ddl("t", deployed, widened)
    assert len(stmts) == 1
    assert "ADD COLUMN IF NOT EXISTS `trace_file`" in stmts[0]
    assert f"AFTER `{deployed[-1].name}`" in stmts[0]

    retyped = [
        ColumnSpec(c.name, "UInt64", c.codec, c.comment) if c.name == "severity" else c
        for c in deployed
    ]
    stmts = alter_ddl("t", deployed, retyped)
    assert len(stmts) == 1 and "MODIFY COLUMN `severity` UInt64" in stmts[0]

    narrowed = [c for c in deployed if c.name != "log_group"]
    stmts = alter_ddl("t", deployed, narrowed)
    assert len(stmts) == 1 and stmts[0].startswith("--")  # no silent drop
    stmts = alter_ddl("t", deployed, narrowed, drop_removed=True)
    assert len(stmts) == 1 and "DROP COLUMN IF EXISTS `log_group`" in stmts[0]


def test_jsoneachrow_roundtrip(spark, sf_smoke):
    df = trace_normalize(spark, sf_smoke).limit(50)
    lines = [r["line"] for r in jsoneachrow(df).collect()]
    assert len(lines) == 50
    parsed = [json.loads(x) for x in lines]
    assert all(set(p) <= {"id", "time_us", "machine", "severity", "type", "log_group"}
               for p in parsed)
    assert {p["severity"] for p in parsed} <= {10, 40}


def test_http_sink_dry_run_spools_full_table(spark, sf_smoke):
    spool = tempfile.mkdtemp(prefix="ch_spool_")
    sink = ClickHouseHttpSink(
        addr="http://localhost:8123", database="testing", table="cluster01",
        spool_dir=spool,
    )
    df = trace_normalize(spark, sf_smoke)
    sink.insert(df)
    lines = []
    for fname in glob.glob(f"{spool}/batch-*.jsonl"):
        with open(fname) as f:
            lines.extend(x for x in f.read().splitlines() if x)
    assert len(lines) == df.count()
    ids = {json.loads(x)["id"] for x in lines}
    assert len(ids) == df.count()


def test_mergetree_sink_sorted_partitions(spark, sf_smoke):
    out = os.path.join(tempfile.mkdtemp(prefix="mt_"), "events_mt")
    e = table(spark, sf_smoke, "events").select(
        F.col("ts").alias("time"), "event_id", "event_type", "value"
    )
    write_mergetree(e, out, mode="overwrite")
    back = read_mergetree(spark, out)
    assert back.count() == e.count()
    assert glob.glob(f"{out}/yyyymm=*"), "expected toYYYYMM partition dirs"
    # rows inside each file are time-sorted (ORDER BY law)
    for pdir in glob.glob(f"{out}/yyyymm=*"):
        part = spark.read.parquet(pdir)
        times = [r["time"] for r in part.select("time").collect()]
        # per-file ordering: read each parquet file separately
        for fpath in glob.glob(f"{pdir}/*.parquet"):
            ft = [r["time"] for r in spark.read.parquet(fpath).select("time").collect()]
            assert ft == sorted(ft)
    # partition pruning: a month filter must prune input files
    months = sorted(int(p.split("=")[1]) for p in
                    (os.path.basename(x) for x in glob.glob(f"{out}/yyyymm=*")))
    plan = back.where(F.col("yyyymm") == months[0])._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.where(F.col("yyyymm") == months[0]).count() > 0


def test_mergetree_optimize_compacts_and_preserves(spark, sf_smoke):
    """OPTIMIZE TABLE analog: N appended micro-batches leave N files
    per partition; compaction must collapse them to 1, re-sort rows
    by time (tight row-group stats again), and change NOTHING about
    the data."""
    from fdblog2clickhouse_spark.sinks.mergetree import optimize_mergetree

    out = os.path.join(tempfile.mkdtemp(prefix="mt_opt_"), "events_mt")
    e = table(spark, sf_smoke, "events").select(
        F.col("ts").alias("time"), "event_id", "event_type", "value"
    )
    # 4 appends ≙ 4 streaming micro-batches → ≥4 files per partition
    for i in range(4):
        write_mergetree(e.where(F.col("event_id") % 4 == i), out, mode="append")
    before = {
        os.path.basename(p): len(glob.glob(f"{p}/*.parquet"))
        for p in glob.glob(f"{out}/yyyymm=*")
    }
    assert before and all(n >= 4 for n in before.values()), before
    pre = sorted(
        tuple(r) for r in read_mergetree(spark, out).drop("yyyymm").collect()
    )

    stats = optimize_mergetree(spark, out)
    assert set(stats) == set(before)

    after = {
        os.path.basename(p): len(glob.glob(f"{p}/*.parquet"))
        for p in glob.glob(f"{out}/yyyymm=*")
    }
    assert all(n == 1 for n in after.values()), after
    post = sorted(
        tuple(r) for r in read_mergetree(spark, out).drop("yyyymm").collect()
    )
    assert pre == post, "compaction changed the data"
    # per-file time order restored
    for pdir in glob.glob(f"{out}/yyyymm=*"):
        for fpath in glob.glob(f"{pdir}/*.parquet"):
            ft = [r["time"] for r in spark.read.parquet(fpath).select("time").collect()]
            assert ft == sorted(ft)
    # idempotent: second optimize is a no-op
    assert optimize_mergetree(spark, out) == {}


def test_mergetree_schema_evolution(spark, sf_smoke):
    """Schema management parity: a later batch adds a column (the
    reference README's 'open a PR after adding the column' flow);
    mergeSchema reads must surface the union schema with NULLs for
    old rows."""
    out = os.path.join(tempfile.mkdtemp(prefix="mt_evo_"), "events_mt")
    e = table(spark, sf_smoke, "events")
    v1 = e.select(F.col("ts").alias("time"), "event_id", "event_type")
    v2 = e.select(
        F.col("ts").alias("time"), "event_id", "event_type",
        F.col("value").alias("new_metric"),
    )
    write_mergetree(v1, out, mode="append")
    write_mergetree(v2, out, mode="append")
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "new_metric" in merged.columns
    n_total = merged.count()
    n_old = merged.where(F.col("new_metric").isNull()).count()
    assert n_total == 2 * e.count() and n_old == e.count()


def _trace_rows(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.select(
        F.col("ts").alias("time"),
        F.when(F.col("event_type") == "error", F.lit(40))
        .otherwise(F.lit(10))
        .cast("int")
        .alias("severity"),
        F.col("event_type").alias("type"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_c"),
        "event_id",
    )


def test_incremental_rollup_batch_invariant(spark, sf_smoke, tmp_path):
    """SummingMergeTree semantics: merging N batches must equal the
    one-shot aggregate, for any batch slicing."""
    from fdblog2clickhouse_spark.sinks.rollup import (
        batch_rollup,
        merge_rollup,
        read_rollup,
    )

    rows = _trace_rows(spark, sf_smoke)
    oneshot = {
        (r["yyyymm"], r["severity"], r["type"]): (r["n_events"], r["value_c"])
        for r in batch_rollup(rows).collect()
    }

    path = str(tmp_path / "rollup")
    b1 = rows.where(F.col("event_id") % 3 == 0)
    b2 = rows.where(F.col("event_id") % 3 == 1)
    b3 = rows.where(F.col("event_id") % 3 == 2)
    for b in (b1, b2, b3):
        merge_rollup(spark, path, b.drop("event_id"))

    merged = {
        (r["yyyymm"], r["severity"], r["type"]): (r["n_events"], r["value_c"])
        for r in read_rollup(spark, path).collect()
    }
    assert merged == oneshot


def test_rollup_foreachbatch_stream(spark, sf_smoke, tmp_path):
    """The rollup maintains itself from a real AvailableNow stream via
    foreachBatch."""
    from fdblog2clickhouse_spark.sinks.rollup import (
        batch_rollup,
        foreach_batch_rollup,
        read_rollup,
    )

    src = str(tmp_path / "src")
    rows = _trace_rows(spark, sf_smoke).drop("event_id")
    rows.coalesce(2).write.mode("overwrite").parquet(src)

    path = str(tmp_path / "rollup")
    stream = spark.readStream.schema(
        "time timestamp, severity int, type string, value_c long"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(foreach_batch_rollup(path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = {
        (r["yyyymm"], r["severity"], r["type"]): (r["n_events"], r["value_c"])
        for r in batch_rollup(rows).collect()
    }
    got = {
        (r["yyyymm"], r["severity"], r["type"]): (r["n_events"], r["value_c"])
        for r in read_rollup(spark, path).collect()
    }
    assert got == want


def test_upsert_latest_wins_any_order(spark, sf_smoke, tmp_path):
    """ReplacingMergeTree semantics: merging batches in ANY order
    yields the same latest-state table as the global dedup."""
    from fdblog2clickhouse_spark.sinks.upsert import (
        latest_per_key,
        merge_upsert,
        read_upsert,
    )

    e = table(spark, sf_smoke, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    want = {
        (r["user_id"], r["event_type"]): (r["event_id"], r["value"])
        for r in latest_per_key(
            e, ["user_id", "event_type"], "ts", "event_id"
        ).collect()
    }

    batches = [e.where(F.col("event_id") % 3 == k) for k in (2, 0, 1)]  # shuffled order
    path = str(tmp_path / "state")
    for b in batches:
        merge_upsert(
            spark, path, b, keys=["user_id", "event_type"], version="ts", tiebreak="event_id"
        )
    got = {
        (r["user_id"], r["event_type"]): (r["event_id"], r["value"])
        for r in read_upsert(spark, path).collect()
    }
    assert got == want


def test_mergetree_partition_pruning(spark, sf_smoke, tmp_path):
    """A yyyymm predicate must prune partition directories at plan
    time — the scan-skipping that PARTITION BY toYYYYMM(Time) buys
    the reference's MergeTree table (trace-converter.py:46-54)."""
    from fdblog2clickhouse_spark.plans import formatted_plan
    from fdblog2clickhouse_spark.sinks.mergetree import read_mergetree, write_mergetree

    path = str(tmp_path / "mt")
    # orders span 1995-2001 → many yyyymm partitions (events cover a
    # single month, which can't demonstrate pruning)
    o = table(spark, sf_smoke, "orders").select(
        F.col("o_orderdate").alias("time"), "o_orderkey", "o_totalprice"
    )
    write_mergetree(o, path, time_col="time")

    months = [r["yyyymm"] for r in read_mergetree(spark, path).select("yyyymm").distinct().collect()]
    assert len(months) > 1, "need multiple partitions to prove pruning"
    one = read_mergetree(spark, path).where(F.col("yyyymm") == months[0])
    plan = formatted_plan(one)
    pf = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert pf and "yyyymm" in pf[0], f"partition filter not pushed\n{plan}"
    assert one.count() > 0


def test_hll_rollup_slicing_invariant_and_idempotent(spark, sf_smoke, tmp_path):
    """AggregatingMergeTree semantics: the register state after N
    sliced merges equals the one-shot state; re-merging an
    already-absorbed batch (at-least-once redelivery) is a no-op."""
    from fdblog2clickhouse_spark.sinks.hll_rollup import (
        batch_registers,
        merge_hll,
        read_estimate,
    )
    from fdblog2clickhouse_spark.sources.tables import table

    e = table(spark, sf_smoke, "events").select(
        "event_type", "user_id", "event_id"
    )
    oneshot = {
        (r["event_type"], r["bucket"]): r["m"]
        for r in batch_registers(e).collect()
    }

    path = str(tmp_path / "hll")
    batches = [e.where(F.col("event_id") % 3 == k) for k in range(3)]
    for b in batches:
        merge_hll(spark, path, b.drop("event_id"))
    merged = {
        (r["event_type"], r["bucket"]): r["m"]
        for r in spark.read.parquet(path).collect()
    }
    assert merged == oneshot

    est_before = sorted(map(tuple, read_estimate(spark, path).collect()))
    merge_hll(spark, path, batches[0].drop("event_id"))  # redelivery
    est_after = sorted(map(tuple, read_estimate(spark, path).collect()))
    assert est_before == est_after


# ---------------------------------------- live-HTTP leg (fake server)
#
# The POST is the reference's entire job (trace-converter.py:66-72);
# every other test runs dry_run spooling. The stdlib http.server
# fixture (`fake_ch`, tests/conftest.py — shared with the CLI watch
# integration test) exercises requests.post + raise_for_status + the
# auth tuple + batch chunking end-to-end with a real socket.

import base64

import pytest


def _http_sink(url: str) -> ClickHouseHttpSink:
    return ClickHouseHttpSink(
        addr=url, database="tracedb", table="trace", user="u1", password="p1"
    )


def test_http_insert_posts_batches_with_auth(spark, sf_smoke, fake_ch):
    url, received, _ = fake_ch
    rows = _trace_rows(spark, sf_smoke).limit(10).repartition(1)
    _http_sink(url).insert(rows, batch_size=4)

    assert len(received) == 3  # 10 rows, 1 partition, batches of 4/4/2
    expected_auth = "Basic " + base64.b64encode(b"u1:p1").decode()
    got = []
    for r in received:
        assert r["auth"] == expected_auth
        assert r["params"]["database"] == "tracedb"
        assert r["params"]["query"] == "INSERT INTO trace FORMAT JSONEachRow"
        got.extend(json.loads(line) for line in r["body"].splitlines())
    assert sorted(len(r["body"].splitlines()) for r in received) == [2, 4, 4]
    assert len(got) == 10
    assert all("severity" in rec and "time" in rec for rec in got)


def test_http_create_schema_posts_db_then_ddl(spark, fake_ch):
    url, received, _ = fake_ch
    ddl = _http_sink(url).create_schema(TRACE_COLUMNS)
    assert len(received) == 2
    assert received[0]["body"] == "CREATE DATABASE IF NOT EXISTS tracedb"
    assert "database" not in received[0]["params"]
    assert received[1]["params"]["database"] == "tracedb"
    assert received[1]["body"] == ddl
    assert "ENGINE = MergeTree()" in received[1]["body"]


def test_http_insert_raises_on_non_200(spark, sf_smoke, fake_ch):
    url, received, state = fake_ch
    state["status"] = 500
    rows = _trace_rows(spark, sf_smoke).limit(3).repartition(1)
    with pytest.raises(Exception, match="500"):
        _http_sink(url).insert(rows)
    assert received, "server never saw the failing POST"


def test_http_create_schema_raises_on_non_200(fake_ch):
    url, _, state = fake_ch
    state["status"] = 403
    with pytest.raises(Exception, match="403"):
        _http_sink(url).create_schema(TRACE_COLUMNS)


def test_hist_sink_slicing_invariant(spark, sf_smoke, tmp_path):
    """Per-bin SUM merge: 1-batch and 3-batch merge orders must leave
    bit-identical state and finalized quantiles."""
    from pyspark.sql import functions as F

    from fdblog2clickhouse_spark.sinks.hist_rollup import merge_hist, read_quantiles
    from fdblog2clickhouse_spark.sources.tables import table

    e = table(spark, sf_smoke, "events").select("event_id", "event_type", "value")
    one = str(tmp_path / "one")
    three = str(tmp_path / "three")
    merge_hist(spark, one, e.drop("event_id"))
    for i in range(3):
        merge_hist(
            spark, three,
            e.where(F.pmod(F.col("event_id"), F.lit(3)) == i).drop("event_id"),
        )
    a = sorted(map(tuple, spark.read.parquet(one).collect()))
    b = sorted(map(tuple, spark.read.parquet(three).collect()))
    assert a == b
    qa = sorted(map(tuple, read_quantiles(spark, one).collect()))
    qb = sorted(map(tuple, read_quantiles(spark, three).collect()))
    assert qa == qb
