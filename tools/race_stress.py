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

Usage: python tools/race_stress.py [N_SWAPS] [N_RACERS]
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
    main()
