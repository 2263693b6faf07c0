"""Oracle-parity + semantics tests for similarity search (SURVEY §2.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdblog2clickhouse_spark.operators import similarity

from .oracle import compare


@pytest.mark.parametrize("name", sorted(similarity.QUERIES))
def test_similarity_oracle_parity(spark, sf_oracle, name):
    df = similarity.QUERIES[name](spark, sf_oracle)
    compare(df, similarity.ORACLE[name], sf_oracle)


def test_bruteforce_topk_shape(spark, sf_oracle):
    rows = similarity.ann_topk_bruteforce(spark, sf_oracle).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert len(by_q) == 10
    for q, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == [1, 2, 3, 4, 5]
        ordered = sorted(rs, key=lambda r: r["rank"])
        cos = [r["cosine"] for r in ordered]
        assert cos == sorted(cos, reverse=True)


def test_lsh_subset_of_bucket(spark, sf_oracle):
    """LSH results are genuine neighbors: every returned pair's cosine
    must appear in the brute-force all-pairs ranking for that query
    with rank no better than its bucket-restricted rank."""
    brute = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in similarity.ann_topk_bruteforce(spark, sf_oracle).collect()
    }
    lsh = similarity.ann_lsh_topk(spark, sf_oracle).collect()
    assert len(lsh) > 0
    for r in lsh:
        key = (r["q_id"], r["n_id"])
        if key in brute:
            assert abs(brute[key] - r["cosine"]) < 1e-12


def test_knn_classify_semantics(spark, sf_oracle):
    """One prediction per held-out vector; vote counts within [1, k];
    labeled clusters in the synthetic data should make most
    predictions agree with the true label."""
    from fdblog2clickhouse_spark.operators.similarity import _KNN_HOLDOUT_MOD, _KNN_K

    rows = similarity.knn_classify(spark, sf_oracle).collect()
    e = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    n_holdout = e.where(F.col("vec_id") % _KNN_HOLDOUT_MOD == 0).count()
    assert len(rows) == n_holdout
    assert all(1 <= r["votes"] <= _KNN_K for r in rows)
    # synthetic labels are not cosine-clustered, so no accuracy bound;
    # predictions must still come from the real label domain.
    domain = {r["label"] for r in e.select("label").distinct().collect()}
    assert all(r["pred_label"] in domain for r in rows)
