"""Scale evidence for the admission path: hold the batch FIXED, grow
the persisted signature store K×, measure the scoring step.

The 100 TB claim of `dedup_store_admission` (operators/dedup_store.py)
is that a batch's admission cost is O(batch + matched candidates) —
the store is touched only through its banded index — so growing the
store should grow the scoring time far slower than linearly (the
store-side costs are the parquet scan of the signature table and its
share of the band-bucket join).

Method: the sf0.1 base slice's signatures are replicated K times
with doc_id offsets of 10M·k (≡ 0 mod 10, so slice semantics are
preserved and replicas never collide); the SAME sf0.1 batch is
scored against each store size. Replicated docs are exact text
duplicates of their originals, so bucket occupancy grows K× in every
band — this is the PESSIMISTIC growth mode for an uncapped admission
join (real stores are pre-deduped); candidates grow ~K per batch
doc, not K².

Interleaved ABBA-style ordering across K values, median-of-3.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from fdblog2clickhouse_spark.session import get_spark  # noqa: E402
from fdblog2clickhouse_spark.operators import dedup_store as ds  # noqa: E402
from fdblog2clickhouse_spark.operators import dedup as dd  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KS = [1, 2, 4]
OFFSET = 10_000_000  # ≡ 0 mod 10: replicas stay in base slices

spark = get_spark()

sh = ds.shingle_frame(
    __import__(
        "fdblog2clickhouse_spark.sources.tables", fromlist=["table"]
    ).table(spark, SF, "documents").select("doc_id", "text")
).cache()
feats = sh.select("doc_id", F.col("sh").alias("fs"))
base_sigs = ds.signature_frame(sh.where(ds._base_pred(F.col("doc_id")))).cache()
batch_sigs = ds.signature_frame(
    sh.where(ds._slice(F.col("doc_id"), ds._BATCH1_REM))
).cache()
base_sigs.count(), batch_sigs.count()

import os
import shutil
import tempfile

root = os.path.join(tempfile.gettempdir(), f"admission_scale_{os.getpid()}")
shutil.rmtree(root, ignore_errors=True)

stores: dict[int, str] = {}
for k in KS:
    path = f"{root}/store_x{k}"
    rep = base_sigs
    for i in range(1, k):
        rep = rep.unionByName(
            base_sigs.withColumn("doc_id", F.col("doc_id") + OFFSET * i)
        )
    rep.write.mode("overwrite").parquet(path)
    stores[k] = path
    n = spark.read.parquet(path).count()
    print(f"store x{k}: {n} signature rows", flush=True)


def score(k: int) -> tuple[float, int]:
    t0 = time.perf_counter()
    cand = ds.admission_candidates(spark.read.parquet(stores[k]), batch_sigs)
    # replicas share text with originals, so verify features resolve
    # via doc_id % OFFSET (replica docs are byte-identical copies)
    cand_base = cand.select(
        (F.col("da") % OFFSET).alias("da"), (F.col("db") % OFFSET).alias("db")
    )
    n = dd.jaccard_on_candidates(cand_base, feats, dd._JACCARD_THRESHOLD).count()
    return time.perf_counter() - t0, n


for k in KS:  # warm all three paths
    score(k)

times: dict[int, list[float]] = {k: [] for k in KS}
order = list(KS)
for rep in range(3):
    for k in order:
        dt, n = score(k)
        times[k].append(dt)
        print(f"rep {rep} x{k}: {dt:.2f}s pairs={n}", flush=True)
    order.reverse()

print()
for k in KS:
    print(f"x{k}: median={statistics.median(times[k]):.2f}s", flush=True)
shutil.rmtree(root, ignore_errors=True)
