"""Duplicated-substring span tests (operators/spans.py)."""

from __future__ import annotations

from fdblog2clickhouse_spark.operators import spans
from tests.oracle import compare


def test_dup_spans_match_oracle(spark, sf_oracle):
    compare(spans.dup_span_stats(spark, sf_oracle), spans._DUP_SPAN_SQL, sf_oracle)


def test_planted_spans(spark, tmp_path):
    """Exact span accounting on crafted docs: a 12-token run shared
    by two docs inside otherwise-unique text must surface in BOTH as
    one maximal span of exactly 12 tokens; a doc that repeats its
    own 8-token run twice gets both occurrences as spans; a fully
    unique doc reports zeros."""
    shared = "one two three four five six seven eight nine ten eleven twelve"
    uniq_a = "aa bb cc dd ee ff gg hh"
    uniq_b = "ii jj kk ll mm nn oo pp"
    run8 = "r1 r2 r3 r4 r5 r6 r7 r8"
    docs = [
        (1, f"{uniq_a} {shared} {uniq_b}"),
        (2, f"qq ww ee2 rr tt yy uu oo2 {shared} zz xx cc2 vv bb2 nn2 mm2 ll2"),
        (3, f"{run8} s1 s2 s3 s4 s5 s6 s7 s8 {run8}"),
        (4, "totally unique words here that repeat nowhere else at all ok"),
    ]
    import os

    from fdblog2clickhouse_spark.sources.tables import TABLE_NAMES

    for name in TABLE_NAMES:
        if name != "documents":
            os.symlink(
                f"/root/testdata/sf0.001/{name}.parquet",
                str(tmp_path / f"{name}.parquet"),
            )
    import numpy as np
    import pandas as pd

    # single parquet FILE (not a Spark part-dir): the DuckDB oracle
    # harness reads {sf_dir}/documents.parquet directly
    pd.DataFrame(
        {
            "doc_id": np.array([i for i, _ in docs], dtype=np.int64),
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": np.array([len(t) for _, t in docs], dtype=np.int64),
        }
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in spans.dup_span_stats(spark, str(tmp_path)).collect()
    }
    assert got[1] == (1, 12)
    assert got[2] == (1, 12)
    # doc 3: both 8-token runs duplicated; 8 unique tokens between
    # them keep the islands separate (gap 16 > K=8)
    assert got[3] == (2, 16)
    assert got[4] == (0, 0)
    compare(
        spans.dup_span_stats(spark, str(tmp_path)),
        spans._DUP_SPAN_SQL,
        str(tmp_path),
    )


def test_dedup_matches_oracle_and_keeps_first(spark, sf_oracle):
    """Oracle parity, plus the policy invariant: removed + kept =
    n_tok per doc, and across the whole corpus at least one
    occurrence of every duplicated shingle survives (the canonical
    copies are never cut — checked via the stats op: removed tokens
    is always strictly less than the corpus-wide duplicated-span
    tokens when duplicates span multiple docs)."""
    from tests.oracle import compare

    df = spans.dup_span_dedup(spark, sf_oracle)
    compare(df, spans._DUP_SPAN_DEDUP_SQL, sf_oracle)
    rows = df.collect()
    assert all(r["removed_tokens"] + r["kept_tokens"] == r["n_tok"] for r in rows)
    stats = {r["doc_id"]: r for r in spans.dup_span_stats(spark, sf_oracle).collect()}
    for r in rows:
        # removal is a subset of the duplicated material
        assert r["removed_tokens"] <= stats[r["doc_id"]]["dup_tokens"]
    # and strictly less in total: canonical copies stay
    assert sum(r["removed_tokens"] for r in rows) < sum(
        s["dup_tokens"] for s in stats.values()
    )


def test_apply_matches_oracle_and_conserves(spark, sf_oracle):
    """Oracle parity for the corpus rewrite, plus the conservation
    pin (VERDICT r10 item #5: decision ∘ apply ≡ reported counts):
    the apply op covers exactly the decision op's doc set, its
    kept_tokens equals the decision's per doc, and the rewritten
    string really contains that many tokens."""
    df = spans.dup_span_apply(spark, sf_oracle)
    compare(df, spans._DUP_SPAN_APPLY_SQL, sf_oracle)
    dec = {
        r["doc_id"]: r for r in spans.dup_span_dedup(spark, sf_oracle).collect()
    }
    rows = df.collect()
    assert {r["doc_id"] for r in rows} == set(dec)
    for r in rows:
        d = dec[r["doc_id"]]
        assert r["n_tok"] == d["n_tok"]
        assert r["kept_tokens"] == d["kept_tokens"]
        assert len(r["rewritten"].split()) == r["kept_tokens"]


def test_apply_planted_excision(spark, tmp_path):
    """The rewrite on the keep-first corpus: the canonical doc keeps
    its text verbatim (normalized token stream), the other two lose
    exactly the shared run."""
    import os

    import numpy as np
    import pandas as pd

    from fdblog2clickhouse_spark.sources.tables import TABLE_NAMES

    for name in TABLE_NAMES:
        if name != "documents":
            os.symlink(
                f"/root/testdata/sf0.001/{name}.parquet",
                str(tmp_path / f"{name}.parquet"),
            )
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    docs = [
        (5, f"aa bb cc dd ee ff gg hh {shared}"),
        (7, f"{shared} ii jj kk ll mm nn oo pp"),
        (9, f"qq rr ss tt uu vv ww xx {shared} yy zz ab cd ef gh ij kl"),
    ]
    pd.DataFrame(
        {
            "doc_id": np.array([i for i, _ in docs], dtype=np.int64),
            "text": [t for _, t in docs],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": np.array([len(t) for _, t in docs], dtype=np.int64),
        }
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    got = {
        r["doc_id"]: r["rewritten"]
        for r in spans.dup_span_apply(spark, str(tmp_path)).collect()
    }
    assert got[5] == f"aa bb cc dd ee ff gg hh {shared}"
    assert got[7] == "ii jj kk ll mm nn oo pp"
    assert got[9] == "qq rr ss tt uu vv ww xx yy zz ab cd ef gh ij kl"
    compare(
        spans.dup_span_apply(spark, str(tmp_path)),
        spans._DUP_SPAN_APPLY_SQL,
        str(tmp_path),
    )


def test_dedup_planted_first_occurrence_kept(spark, tmp_path):
    """Three docs share one 10-token run: the smallest doc_id keeps
    it, the other two get it cut."""
    import os

    import numpy as np
    import pandas as pd

    from fdblog2clickhouse_spark.sources.tables import TABLE_NAMES

    for name in TABLE_NAMES:
        if name != "documents":
            os.symlink(
                f"/root/testdata/sf0.001/{name}.parquet",
                str(tmp_path / f"{name}.parquet"),
            )
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    docs = [
        (5, f"aa bb cc dd ee ff gg hh {shared}"),
        (7, f"{shared} ii jj kk ll mm nn oo pp"),
        (9, f"qq rr ss tt uu vv ww xx {shared} yy zz ab cd ef gh ij kl"),
    ]
    pd.DataFrame(
        {
            "doc_id": np.array([i for i, _ in docs], dtype=np.int64),
            "text": [t for _, t in docs],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": np.array([len(t) for _, t in docs], dtype=np.int64),
        }
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    got = {
        r["doc_id"]: (r["n_cut_spans"], r["removed_tokens"])
        for r in spans.dup_span_dedup(spark, str(tmp_path)).collect()
    }
    assert got[5] == (0, 0)       # first occurrence (smallest doc_id) kept
    assert got[7] == (1, 10)
    assert got[9] == (1, 10)


def test_span_rewrite_sink_roundtrip(spark, sf_oracle):
    """The rewrite written back as a partitioned table: oracle hash
    on the STORED aggregate, hive layout one file per lang partition
    (the corpus sink's repartition-on-partition-col discipline), and
    kept-token conservation re-checked on the stored output against
    the decision op."""
    import glob
    import os

    from fdblog2clickhouse_spark.operators.sinkcheck import scratch_path
    from pyspark.sql import functions as F

    df = spans.span_rewrite_sink_roundtrip(spark, sf_oracle)
    compare(df, spans._SPAN_REWRITE_SINK_SQL, sf_oracle)

    stored = os.path.join(scratch_path("span_rewrite"), "t")
    part_dirs = glob.glob(os.path.join(stored, "lang=*"))
    assert part_dirs, "no hive partitions written"
    for d in part_dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d

    back = spark.read.parquet(stored)
    kept_stored = back.agg(F.sum("kept_tokens")).first()[0]
    kept_decided = (
        spans.dup_span_dedup(spark, sf_oracle).agg(F.sum("kept_tokens")).first()[0]
    )
    assert kept_stored == kept_decided
