"""Deterministic leakage-safe splitting: cluster-atomic assignment,
fraction accuracy, subset stability, cross-engine portability."""

import duckdb
import pytest
from pyspark.sql import functions as F

from graphula_spark.operators import splits as S


def _docs(spark, n=2000):
    rows = [(i, f"document body number {i} with some words") for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_fractions_and_determinism(spark):
    df = _docs(spark)
    out = S.split_by_key(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    # deterministic across runs
    again = S.split_by_key(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.collect() == again.collect()


def test_subset_stability(spark):
    """Growing the corpus never moves an existing document's split —
    the property that keeps an eval set an eval set."""
    frac = {"train": 0.9, "val": 0.1}
    small = {r.doc_id: r.split for r in S.split_by_key(_docs(spark, 500), "doc_id", frac).collect()}
    big = {r.doc_id: r.split for r in S.split_by_key(_docs(spark, 2000), "doc_id", frac).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_bad_fractions_raise(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError, match="sum to 1"):
        S.split_by_key(df, "doc_id", {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="non-negative"):
        S.split_by_key(df, "doc_id", {"train": 1.5, "val": -0.5})


def test_exact_duplicates_never_straddle(spark):
    rows = [(i, f"unique doc {i}") for i in range(100)]
    rows += [(1000 + i, f"unique doc {i}") for i in range(100)]  # exact dups
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = S.leakage_safe_split(df, "doc_id", "text", {"train": 0.5, "val": 0.5})
    got = {r.doc_id: r.split for r in out.collect()}
    for i in range(100):
        assert got[i] == got[1000 + i], i


def test_near_dup_clusters_are_atomic(spark):
    """With a pairs DataFrame, whole connected components co-locate —
    including transitive chains (a~b, b~c => a,b,c together)."""
    docs = _docs(spark, 300)
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(0, 50)]
        + [(i + 100, i + 200) for i in range(0, 50)],  # chains of 3
        ["id_a", "id_b"],
    )
    out = S.leakage_safe_split(
        docs, "doc_id", "text", {"train": 0.6, "val": 0.4}, pairs=pairs
    )
    got = {r.doc_id: r.split for r in out.collect()}
    for i in range(50):
        assert got[i] == got[i + 100] == got[i + 200], i
    # both splits are still populated among the singletons
    assert {got[i] for i in range(250, 300)} == {"train", "val"}


def test_portable_hash_matches_duckdb(spark):
    """The split decision replays exactly in ANSI SQL — the discipline
    that makes the assignment auditable outside Spark."""
    df = _docs(spark, 400)
    out = S.split_by_key(df, "doc_id", {"train": 0.8, "val": 0.2}, seed="s1")
    got = {(r.doc_id, r.split) for r in out.collect()}
    con = duckdb.connect()
    want = set(
        con.execute(
            """
            SELECT i, CASE WHEN ('0x' || substr(md5('s1' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                                % 1000000 < 800000
                      THEN 'train' ELSE 'val' END
            FROM range(400) t(i)
            """
        ).fetchall()
    )
    assert got == want


def test_no_shuffle_without_pairs(spark):
    """The exact-dup-safe split is a pure map: no Exchange in the plan."""
    df = _docs(spark, 100)
    out = S.leakage_safe_split(df, "doc_id", "text", {"train": 0.5, "val": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
