#!/usr/bin/env python3
"""Phase-profile the expensive lifecycle ops for the r18 optimization
round. Monkeypatches wall-clock timers around the store primitives
(write_table, write_banded_index, pruned_table, pruned_store_rows,
DataFrame.count / .collect / parquet writes) and prints a per-call
ledger, so the per-job fixed costs inside e.g.
dedup_store_rep_admission are attributed without editing operators.

Usage: python tools/phase_profile_r18.py <op_name> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

LEDGER: list[tuple[str, float]] = []


def _wrap(mod, name, label=None):
    orig = getattr(mod, name)
    lab = label or name

    def timed(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        LEDGER.append((lab, time.perf_counter() - t0))
        return out

    setattr(mod, name, timed)
    return orig


def main() -> None:
    op_name = sys.argv[1]

    from fdblog2clickhouse_spark.session import get_spark
    from fdblog2clickhouse_spark import operators
    import fdblog2clickhouse_spark.operators.dedup_store as ds
    from pyspark.sql import DataFrame

    # --- instrument the store primitives -------------------------
    for fn in (
        "write_table",
        "write_banded_index",
        "pruned_table",
        "pruned_store_rows",
        "read_table",
        "expand_group_evidence",
        "rep_admission_step",
    ):
        if hasattr(ds, fn):
            _wrap(ds, fn)

    # --- instrument DataFrame actions ----------------------------
    # Spark 4: the runtime class is pyspark.sql.classic.dataframe
    # .DataFrame, which overrides the actions — patch it, not the base.
    try:
        from pyspark.sql.classic.dataframe import DataFrame as CDF
    except ImportError:
        CDF = DataFrame
    for fn in ("count", "collect"):
        orig = getattr(CDF, fn)

        def make(orig, fn):
            def timed(self, *a, **kw):
                t0 = time.perf_counter()
                out = orig(self, *a, **kw)
                LEDGER.append((f"df.{fn}", time.perf_counter() - t0))
                return out

            return timed

        setattr(CDF, fn, make(orig, fn))

    # time parquet writes via DataFrameWriter.parquet
    from pyspark.sql.readwriter import DataFrameWriter

    orig_pq = DataFrameWriter.parquet

    def timed_pq(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig_pq(self, *a, **kw)
        LEDGER.append((f"writer.parquet:{a[0] if a else '?'}",
                       time.perf_counter() - t0))
        return out

    DataFrameWriter.parquet = timed_pq

    spark = get_spark("phase-profile-r18")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the reader path like bench.py does
    spark.read.parquet(f"{SF}/lineitem.parquet").count()
    LEDGER.clear()

    fn = operators.all_queries()[op_name]
    # warm run (plan/codegen), then one timed run — mirrors bench
    fn(spark, SF).count()
    LEDGER.clear()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = fn(spark, SF)
    n = df.count()
    total = time.perf_counter() - t0

    print(f"\n=== {op_name}: {total:.2f}s total, rows={n} ===")
    # per-call ledger in call order (outer calls include inner time;
    # rep_admission_step spans its internals)
    agg: dict[str, tuple[int, float]] = {}
    for lab, dt in LEDGER:
        c, s = agg.get(lab, (0, 0.0))
        agg[lab] = (c + 1, s + dt)
    print("-- call order --")
    for lab, dt in LEDGER:
        if dt > 0.05:
            print(f"  {dt:7.3f}s  {lab}")
    print("-- aggregate --")
    for lab, (c, s) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {s:7.3f}s  n={c:3d}  {lab}")
    spark.stop()


if __name__ == "__main__":
    main()
