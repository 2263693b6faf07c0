#!/usr/bin/env python3
"""Crossover experiment: exact all-pairs dedup vs the composed
LSH-verified path as the corpus grows.

The sf0.1 `documents` table is replicated K× into /tmp (replica i
prefixes every token with `r{i}`, so replicas are DISSIMILAR — the
near-dup density per document stays constant, which is the regime the
complexity claim is about: all-pairs work grows ~K², candidate-gated
work ~K). Then both operators run unmodified against the scaled dir.

Usage: python tools/scale_crossover.py [K ...]   (default 1 2 4)
Writes one line per (K, op): docs, wall seconds (min of 2).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = "/tmp/scale_crossover"

OPS = ["dedup_ngram_jaccard", "dedup_jaccard_lsh_verified"]


def make_scaled(spark, k: int) -> str:
    # always rebuild: a stale dir (older BASE, interrupted write)
    # would silently time the wrong corpus
    out = f"{OUT_ROOT}/k{k}"
    shutil.rmtree(out, ignore_errors=True)
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for i in range(k):
        if i == 0:
            parts.append(d)
        else:
            parts.append(
                d.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.regexp_replace("text", r"(^|\s)", f"$1r{i}").alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4]

    from fdblog2clickhouse_spark import operators
    from fdblog2clickhouse_spark.session import get_spark

    spark = get_spark("scale-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    qs = operators.all_queries()

    for k in ks:
        sf_dir = make_scaled(spark, k)
        n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        for name in OPS:
            fn = qs[name]
            fn(spark, sf_dir).count()  # warm
            samples = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            print(
                f"K={k} docs={n} {name}: {round(min(samples), 2)}s",
                flush=True,
            )
    shutil.rmtree(OUT_ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
