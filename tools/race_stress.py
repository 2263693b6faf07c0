"""REAL cross-process reader-vs-maintainer race stress (round 18):
the contract tests simulate the heal race by monkeypatched rename
injection; this tool runs the race for real — a separate PROCESS
loops `heal_swap(path)` (exactly what every query node does before
building its read plan) as fast as the OS allows, while this process
performs N back-to-back `_swap_aside` swaps of a real parquet table.

Pass criteria (the MAINTAINER CONTRACT's reader half):
  - every swap either COMPLETES (the bounded retry absorbed any heal
    that fired inside the window) or raises the documented
    second-writer error with live+staging both complete — in which
    case the re-swap must converge;
  - after every completed swap the table holds exactly the new
    content (readable, no .old, no stale rows);
  - the racer process never crashes (heal_swap tolerates losing its
    own rename race to the swap completing).

The heal's restore only fires inside the microseconds-wide window
between the two renames, so most iterations see no race — the tool
reports how many times the racer actually restored (races_hit) so a
zero-hit run is visibly inconclusive rather than silently green.

FOLD MODE (`python tools/race_stress.py fold [CYCLES] [N_RACERS]`):
the same idea against the granular FOLD — racer processes loop
`heal_table_fold(path)` hot (counting journal sightings, so a run
that never hit the window is visibly inconclusive) while this
process runs retract→fold cycles on a real bucketed table. The
fold's contract under cross-process heals is ABORT-THEN-CONVERGE:
a heal that fires mid-fold may roll it back (restores asides, clears
staging+journal) — the writer must abort with one of the documented
errors, NEVER retire or partially publish a partition — and the
retry must converge. Pass criteria: after every cycle (with retries
on documented aborts) the table holds EXACTLY the expected rows; no
journal, aside, or staging remnants; racers never crash.

Usage: python tools/race_stress.py [N_SWAPS] [N_RACERS]
       python tools/race_stress.py fold [CYCLES] [N_RACERS]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def racer(path: str, stop, hits) -> None:
    """The query node in another process: heal before every read."""
    from fdblog2clickhouse_spark.operators.dedup_store import heal_swap

    old = path + ".old"
    while not stop.is_set():
        existed = os.path.exists(old) and not os.path.exists(path)
        heal_swap(path)  # must never raise (race-tolerant)
        if existed and os.path.exists(path):
            with hits.get_lock():
                hits.value += 1


def fold_racer(path: str, stop, sightings) -> None:
    """A query node's read-path heal, run hot: heal as fast as the
    OS allows, counting how often the fold journal was actually
    observed (a zero-sighting run exercised nothing — report it)."""
    from fdblog2clickhouse_spark.operators.dedup_store import (
        _FOLD_JOURNAL,
        heal_table_fold,
    )

    j = os.path.join(path, _FOLD_JOURNAL)
    while not stop.is_set():
        if os.path.exists(j):
            with sightings.get_lock():
                sightings.value += 1
        heal_table_fold(path)  # must never raise


def fold_main() -> None:
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    n_racers = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import functions as F

    from fdblog2clickhouse_spark.session import get_spark
    from fdblog2clickhouse_spark.operators import dedup_store as ds

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fold_race_")
    path = os.path.join(root, "tbl")
    n0 = 4 * cycles + 64
    df = spark.createDataFrame(
        [(i, f"g{i}") for i in range(n0)], "doc_id long, gh string"
    )
    ds.write_table(df, path, "overwrite", key="doc_id", buckets=8)

    stop = mp.Event()
    sightings = mp.Value("i", 0)
    procs = [
        mp.Process(
            target=fold_racer, args=(path, stop, sightings), daemon=True
        )
        for _ in range(n_racers)
    ]
    for p in procs:
        p.start()

    alive = set(range(n0))
    aborts = 0
    t0 = time.perf_counter()
    for c in range(cycles):
        victims = sorted(alive)[:2]
        alive -= set(victims)
        tomb = spark.createDataFrame(
            [(v,) for v in victims], "doc_id long"
        )
        for attempt in range(25):
            try:
                ds._fold_table_granular(
                    spark, path, os.path.join(root, "nosuch"), None, tomb
                )
                break
            except RuntimeError as e:
                msg = str(e)
                assert (
                    "vanished" in msg or "gutted" in msg
                    or "losing the rename" in msg
                ), f"undocumented fold failure: {msg}"
                print(f"  cycle {c} attempt {attempt}: ABORT {msg.splitlines()[0][:90]}")
                aborts += 1
        else:
            raise AssertionError("fold never converged in 25 attempts")
        got = sorted(
            r["doc_id"]
            for r in ds.read_table(spark, path).select("doc_id").collect()
        )
        if got != sorted(alive):
            import glob as _g

            missing = sorted(set(alive) - set(got))
            extra = sorted(set(got) - set(alive))
            print(f"FORENSICS cycle {c}: missing={missing} extra={extra}")
            import pyarrow.parquet as pq

            for d in sorted(_g.glob(os.path.join(path, "pb=*"))):
                fs = sorted(os.listdir(d))
                rows = sum(
                    pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
                    for f in fs
                    if f.endswith(".parquet")
                )
                print(f"  {os.path.basename(d)}: rows={rows} files={fs}")
            miss_pb = {
                r["pb"]
                for r in spark.createDataFrame(
                    [(m,) for m in missing], "doc_id long"
                )
                .select(
                    F.expr(
                        "CAST(pmod(xxhash64(CAST(doc_id AS BIGINT)), 8) AS INT)"
                    ).alias("pb")
                )
                .distinct()
                .collect()
            }
            print("  missing ids' buckets:", sorted(miss_pb))
            print("  parts:", sorted(os.listdir(path)))
            print("  siblings:", sorted(_g.glob(path + "*"))[:10])
            print(
                "  asides:",
                _g.glob(
                    os.path.join(path, "**", ds._BFOLD_PREFIX + "*"),
                    recursive=True,
                ),
            )
            jj = os.path.join(path, ds._FOLD_JOURNAL)
            if os.path.exists(jj):
                print("  journal:", open(jj).read())
            raise AssertionError(
                f"cycle {c}: row loss/leak — got {len(got)}, "
                f"expected {len(alive)}"
            )
    dt = time.perf_counter() - t0

    stop.set()
    for p in procs:
        p.join(timeout=5)
        assert p.exitcode == 0, f"fold racer crashed: {p.exitcode}"
    import glob as _g

    assert not os.path.exists(os.path.join(path, ds._FOLD_JOURNAL))
    assert not _g.glob(
        os.path.join(path, "**", ds._BFOLD_PREFIX + "*"), recursive=True
    )
    print(
        f"fold-race-stress: GREEN — {cycles} retract→fold cycles vs "
        f"{n_racers} healing processes in {dt:.1f}s, journal "
        f"sightings={sightings.value}, documented aborts={aborts} "
        "(every cycle converged to exact content, no remnants, no "
        "racer crash)",
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n_swaps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    n_racers = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from fdblog2clickhouse_spark.operators.dedup_store import _swap_aside

    root = tempfile.mkdtemp(prefix="race_stress_")
    path = os.path.join(root, "tbl")
    os.makedirs(path)
    with open(os.path.join(path, "gen.txt"), "w") as f:
        f.write("-1")

    stop = mp.Event()
    hits = mp.Value("i", 0)
    procs = [
        mp.Process(target=racer, args=(path, stop, hits), daemon=True)
        for _ in range(n_racers)
    ]
    for p in procs:
        p.start()

    aborts = 0
    t0 = time.perf_counter()
    for gen in range(n_swaps):
        staging = path + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging)
        with open(os.path.join(staging, "gen.txt"), "w") as f:
            f.write(str(gen))
        try:
            _swap_aside(path, staging)
        except RuntimeError:
            # documented second-writer spelling: both complete, re-run
            # converges. (Reachable only if racers chain-heal through
            # all 16 retries — astronomically unlikely but legal.)
            aborts += 1
            assert os.path.isdir(path) and os.path.isdir(staging)
            _swap_aside(path, staging)
        with open(os.path.join(path, "gen.txt")) as f:
            got = f.read()
        assert got == str(gen), (got, gen)
        assert not os.path.exists(path + ".old")
    dt = time.perf_counter() - t0

    stop.set()
    for p in procs:
        p.join(timeout=5)
        assert p.exitcode == 0, f"racer crashed: {p.exitcode}"
    print(
        f"race-stress: GREEN — {n_swaps} swaps vs {n_racers} healing "
        f"processes in {dt:.1f}s, races_hit={hits.value}, "
        f"retry-exhaustion aborts={aborts} (every swap left exact "
        "content, no remnants, no racer crash)",
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fold":
        fold_main()
    else:
        main()
