#!/usr/bin/env python3
"""(Re)generate tests/slow_tests.json — the data-driven `slow` tier
(see tests/conftest.py): every test whose measured call time crosses
THRESHOLD seconds is excluded from the default (driver-facing) pytest
run and runs under `-m slow` instead.

Two modes:
  python tools/test_durations.py --from-csv file.csv [...] [--threshold 3]
      csv lines: "<seconds>\\t<outcome>\\t<nodeid>" (the durlog plugin
      below writes this format).
  python tools/test_durations.py --measure [--threshold 3]
      runs the FULL suite (slow tier included) with an inline
      duration-logging plugin, then regenerates the json. This is the
      long path (the whole point of the tier is that the full suite
      takes ~1 h+), so prefer --from-csv on an existing ledger.

Parametrized tests are keyed by their base nodeid (params stripped):
one slow parametrization marks all of them — a budget gate, not a
precision instrument.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tests", "slow_tests.json")

PLUGIN = """
import os
def pytest_runtest_logreport(report):
    if report.when == "call":
        with open(os.environ["DURLOG_FILE"], "a") as f:
            f.write(f"{report.duration:.3f}\\t{report.outcome}\\t{report.nodeid}\\n")
"""


def load_csvs(paths: list[str]) -> dict[str, float]:
    worst: dict[str, float] = {}
    for p in paths:
        with open(p) as f:
            for line in f:
                dur, _outcome, nodeid = line.rstrip("\n").split("\t", 2)
                base = nodeid.split("[")[0]
                worst[base] = max(worst.get(base, 0.0), float(dur))
    return worst


def main() -> None:
    args = sys.argv[1:]
    threshold = 3.0
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    csvs: list[str] = []
    if args and args[0] == "--from-csv":
        csvs = args[1:]
    elif args and args[0] == "--measure":
        d = tempfile.mkdtemp(prefix="durlog_")
        plug = os.path.join(d, "durlog.py")
        with open(plug, "w") as f:
            f.write(PLUGIN)
        csv = os.path.join(d, "durations.csv")
        env = dict(os.environ, DURLOG_FILE=csv,
                   PYTHONPATH=d + os.pathsep + os.environ.get("PYTHONPATH", ""))
        subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "",
             "-p", "durlog"],
            cwd=ROOT, env=env, check=False,
        )
        csvs = [csv]
    else:
        print(__doc__)
        raise SystemExit(2)
    worst = load_csvs(csvs)
    slow = sorted(k for k, v in worst.items() if v >= threshold)
    with open(OUT, "w") as f:
        json.dump(slow, f, indent=1)
    kept = sum(1 for v in worst.values() if v < threshold)
    print(f"slow tier: {len(slow)} base nodeids >= {threshold}s "
          f"(fast tier keeps {kept} measured) -> {OUT}")


if __name__ == "__main__":
    main()
