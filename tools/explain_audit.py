#!/usr/bin/env python3
"""Physical-plan audit for the headline queries (SURVEY §7 step 7).

Prints a per-query scorecard (see plans/audit.py for the signals).
Run with AUDIT_FULL=1 to also dump the formatted plans.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NAMES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "events_per_minute",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_bruteforce",
    "token_count",
    # round-2 additions
    "hll_distinct_users",
    "cms_heavy_hitters",
    "value_quantile_hist",
    "funnel_conversion",
    "events_sliding_windows",
    "ann_pq_topk",
    "knn_classify",
    "doc_top_terms",
    "customer_rfm",
    # round-2 continuation
    "market_basket_pairs",
    "bpe_pair_stats",
    "chunk_dedup",
    "events_decay_score",
    "embedding_kmeans",
    "dedup_containment",
    "cluster_balanced_sample",
    # partsupp-derived TPC-H completions
    "tpch_q2",
    "tpch_q11",
    "tpch_q16",
    "tpch_q20",
    "doc_lang_kmeans",
    # round-7 additions
    "doc_rarity_score",
    "ann_filtered_topk",
    # round-8 additions: composed candidate-gated ops + signature
    # store + incremental dedup
    "dedup_jaccard_lsh_verified",
    "dedup_containment_lsh_verified",
    "embedding_neardup_lsh_verified",
    "doc_minhash_signatures",
    "dedup_incremental_minhash",
    # round-8 training-assembly trio
    "sequence_packing",
    "embedding_int8_quantize",
    "doc_skyline_select",
    # round-9 additions whose RETURNED frame is the interesting plan
    # (the store-admission ops materialize to parquet and return
    # scans — their admission kernels are plan-pinned in
    # tests/test_plans.py instead)
    "ann_ivf_store_search",
    "ann_ivfpq_topk",
    "pack_manifest",
    "bpe_tokenize",
    # round-11 additions: the substring-dedup rewrite (in-row
    # excision — the interesting plan is the returned one) — the rep
    # admission kernels materialize to parquet like the r9 store
    # ops; their pruned-read/band-join seams are plan-pinned in
    # tests/test_plans.py and tests/test_dedup_store.py instead
    "dup_span_apply",
]


def main() -> None:
    from fdblog2clickhouse_spark import operators
    from fdblog2clickhouse_spark.plans import formatted_plan, plan_scorecard
    from fdblog2clickhouse_spark.session import get_spark

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = operators.all_queries()

    for name in NAMES:
        plan = formatted_plan(queries[name](spark, SF))
        s = plan_scorecard(plan)
        print(
            f"{name:22s} scans={s['scans']} pushed={s['pushed_filters']} "
            f"nopush={s['unpushed_scans']} readcols={s['read_cols']} "
            f"BHJ={s['broadcast_joins']} SMJ={s['sortmerge_joins']} "
            f"exch={s['exchanges']} codegen={s['codegen_spans']}"
            + (" CARTESIAN!" if s["cartesian"] else "")
            + (" PYEVAL!" if s["python_eval"] else "")
        )
        if os.environ.get("AUDIT_FULL"):
            print(plan)
    spark.stop()


if __name__ == "__main__":
    main()
