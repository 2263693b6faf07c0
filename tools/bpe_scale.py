"""BPE trainer at realistic merge counts (VERDICT r9 #5 / r10 #6).

`bpe_train_merges` ships with _N_MERGES = 12 — enough for the oracle
row, three orders of magnitude short of a production tokenizer
(30-50k merges). The open question is the PER-MERGE driver overhead:
each merge is one small Spark job (cached-vocab scan → pair
aggregate → 1-row argmax collect) plus an in-row replace, so total
time should be start-up + N × (job latency + vocab pass). This tool
runs the trainer at several N in one session (monkeypatching the
module constant — the loop reads it at call time) and reports
per-merge marginal cost, which SCALE.md extrapolates to 50k.

Usage: python tools/bpe_scale.py [SF_DIR] [N ...]   (default sf0.1,
N = 12 64 256 512)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from fdblog2clickhouse_spark.session import get_spark  # noqa: E402
from fdblog2clickhouse_spark.operators import bpe  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NS = [int(x) for x in sys.argv[2:]] or [12, 64, 256, 512]

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

# warm: the corpus read + codegen paths, untimed
bpe._N_MERGES = 12
bpe._train(spark, SF)

results: list[tuple[int, float, int]] = []
for n in NS:
    bpe._N_MERGES = n
    t0 = time.perf_counter()
    merges, _ = bpe._train(spark, SF)
    dt = time.perf_counter() - t0
    results.append((n, dt, len(merges)))
    print(f"N={n}: {dt:.1f}s total, {dt / max(len(merges), 1):.3f}s/merge "
          f"({len(merges)} merges ran)", flush=True)

if len(results) >= 2:
    # divide by merges that actually RAN — small corpora exhaust
    # their vocab before large N (the loop breaks on an empty argmax)
    (_, t0_, m0), (_, t1, m1) = results[0], results[-1]
    if m1 > m0:
        marginal = (t1 - t0_) / (m1 - m0)
        print(f"\nmarginal per-merge cost ({m0}→{m1} merges): {marginal:.3f}s")
        print(f"extrapolated 50k merges: {marginal * 50_000 / 3600:.1f}h "
              f"(+ the one-time corpus pass)")
