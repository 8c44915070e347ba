#!/usr/bin/env python
"""Round-11 probe: byte-level evidence for the round's new shapes.

A. Single-pass reps fan-back (VERDICT r10 #2): `embedding_near_dup_reps`
   now composes the component label onto the UNIQUE side and fans
   members back through ONE exchange. A/B against the round-10 shape
   (members join clean on (blk,h), then the whole assign union
   re-shuffles on rep) on the probe_r10 dataset: 2M rows, dup
   multiplicity 100. Outputs must agree row-exact; bytes moved is the
   metric.

B. Distributed CC past the driver gate (VERDICT r10 #1): a 500k-edge
   graph (> CC_DRIVER_MAX_EDGES = 200k) takes the label-propagation
   loop BY CONSTRUCTION — no monkeypatch. Ground truth is closed-form
   (disjoint chains), so this also re-verifies the 100 TB code path on
   an input the driver fast path cannot take.

C. Fused asof+range profile (VERDICT r10 #3): shuffle bytes of the
   fused single-window-pass operator vs the composed
   asof_join + range_join_count + stitch-join shape at sf1 events
   (~1M rows). Row-exact equality asserted.

D. Bucketed semantic decontamination (VERDICT r10 #4): corpus 1M x
   bench 200k — the regime where the exact path's broadcast gate
   fails and its fallback is a 2*10^11-pair shuffle cross join (not
   runnable). The banded-LSH path must finish in seconds with
   candidate-join bytes, and recall >= 0.9 on 2k planted near-dups.

Run:  PYTHONPATH=/root/repo python tools/probe_r11.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from tools.probe_r8 import get_probe_spark, measure  # noqa: E402
from tools.probe_r10 import build_vectors  # noqa: E402


def r10_reps(df):
    """The round-10 two-pass fan-back, replicated inline for A/B."""
    from graphula_spark.operators.ann import _norm, _unit, _dot, _vec_hash
    from graphula_spark.operators.cluster import connected_components

    m = df.select(
        F.col("vec_id").alias("id"),
        F.col("label").alias("blk"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    flagged = m.withColumn(
        "nz", F.coalesce(_norm(F.col("v")) > 0, F.lit(False))
    )
    nz = flagged.where(F.col("nz")).drop("nz")
    zr = flagged.where(~F.col("nz")).drop("nz")
    uniq = nz.groupBy("blk", "v").agg(F.min("id").alias("rep")).persist()
    keyg = uniq.groupBy("blk", _vec_hash(F.col("v")).alias("h")).agg(
        F.count(F.lit(1)).alias("nv"), F.min("rep").alias("rep0")
    )
    clean = keyg.where(F.col("nv") == 1).select(
        "blk", "h", F.col("rep0").alias("rep")
    )
    coll_keys = keyg.where(F.col("nv") > 1).select("blk", "h")
    members_h = nz.select("id", "blk", _vec_hash(F.col("v")).alias("h"))
    assign = members_h.join(clean, ["blk", "h"], "inner").select("id", "rep")
    exc = nz.withColumn("h", _vec_hash(F.col("v"))).join(
        F.broadcast(coll_keys), ["blk", "h"], "left_semi"
    )
    exc_assign = exc.groupBy("blk", "v").agg(F.min("id").alias("rep"))
    assign = assign.unionByName(
        exc.join(exc_assign, ["blk", "v"]).select("id", "rep")
    )
    assign = assign.unionByName(zr.select("id", F.col("id").alias("rep")))
    nrm = (
        uniq.select(F.col("rep").alias("id"), "blk", "v")
        .withColumn("n", _norm(F.col("v")))
        .withColumn("v", _unit(F.col("v"), F.col("n")))
        .drop("n")
    )
    a = nrm.select(F.col("id").alias("id_a"), "blk", F.col("v").alias("va"))
    b = nrm.select(F.col("id").alias("id_b"), "blk", F.col("v").alias("vb"))
    pairs = (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(_dot(F.col("va"), F.col("vb")) >= F.lit(0.95))
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    comp = connected_components(pairs, "id_a", "id_b")
    out = (
        assign.join(
            comp.select(
                F.col("node").alias("rep"), F.col("cluster").alias("g")
            ),
            "rep",
            "left",
        )
        .select(
            F.col("id").alias("vec_id"),
            F.coalesce(F.col("g"), F.col("rep")).alias("representative"),
        )
        .localCheckpoint(eager=True)
    )
    uniq.unpersist()
    return out


def probe_a(spark):
    from graphula_spark.operators.ann import embedding_near_dup_reps

    df = build_vectors(spark)
    df.persist().count()
    _, old_b = measure(
        spark, "A-OLD r10 two-pass fan-back", lambda: r10_reps(df).count()
    )
    _, new_b = measure(
        spark,
        "A-NEW r11 single-pass fan-back",
        lambda: embedding_near_dup_reps(df, threshold=0.95).count(),
    )
    new = embedding_near_dup_reps(df, threshold=0.95)
    old = r10_reps(df)
    assert new.exceptAll(old).isEmpty() and old.exceptAll(new).isEmpty()
    df.unpersist()
    print(
        f"\nA verdict: row-exact; NEW {new_b/1e6:.1f} MB vs OLD "
        f"{old_b/1e6:.1f} MB shuffled"
    )


def probe_b(spark):
    from graphula_spark.operators import cluster as cluster_mod

    n_chains, chain_len = 50_000, 10  # 500k edges, gate is 200k
    base = spark.range(n_chains).select(
        F.explode(F.sequence(F.lit(0), F.lit(chain_len - 1))).alias("i"),
        (F.col("id") * 100).alias("c0"),
    )
    edges = base.select(
        (F.col("c0") + F.col("i")).alias("src"),
        (F.col("c0") + F.col("i") + 1).alias("dst"),
    ).persist()
    n = edges.count()
    assert n > cluster_mod.CC_DRIVER_MAX_EDGES, "gate not crossed"
    dt, bts = measure(
        spark,
        f"B distributed CC over {n} edges (gate {cluster_mod.CC_DRIVER_MAX_EDGES})",
        lambda: cluster_mod.connected_components(edges).count(),
    )
    labels = cluster_mod.connected_components(edges)
    # closed form: every node labels to its chain head (c0)
    bad = labels.where(
        F.col("cluster") != (F.col("node") - F.col("node") % 100)
    ).count()
    n_nodes = labels.count()
    edges.unpersist()
    assert bad == 0 and n_nodes == n_chains * (chain_len + 1), (bad, n_nodes)
    print(
        f"\nB verdict: {n_nodes} nodes labeled exactly by the DISTRIBUTED "
        f"loop in {dt:.1f}s, {bts/1e6:.1f} MB shuffled"
    )


def probe_c(spark):
    import bench
    from graphula_spark.operators.relational import (
        asof_join,
        asof_range_profile,
        range_join_count,
    )

    sf1 = bench.ensure_sf1(spark, "/root/testdata/sf0.1")
    ev = spark.read.parquet(f"{sf1}/events.parquet").persist()
    ev.count()
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "ts", "user_id", F.col("event_id").alias("click_id")
    )

    def composed():
        oa = asof_join(purchases, clicks, on="ts", by="user_id").select(
            "event_id", "user_id", "click_id"
        )
        rj = range_join_count(
            purchases, clicks.select("ts", "user_id"),
            "ts", "ts", "user_id", 600, 600, "n_clicks_near",
        ).select("event_id", "n_clicks_near")
        return oa.join(rj, "event_id")

    def fused():
        return asof_range_profile(
            purchases, clicks, on="ts", by="user_id", right_id="click_id",
            lower_seconds=600, upper_seconds=600,
            asof_name="click_id", count_name="n_clicks_near",
        ).select("event_id", "user_id", "click_id", "n_clicks_near")

    _, old_b = measure(spark, "C-OLD composed shape", lambda: composed().count())
    _, new_b = measure(spark, "C-NEW fused profile", lambda: fused().count())
    a, b = fused(), composed()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    ev.unpersist()
    print(
        f"\nC verdict: row-exact at sf1; FUSED {new_b/1e6:.1f} MB vs "
        f"COMPOSED {old_b/1e6:.1f} MB shuffled"
    )


def probe_d(spark):
    from graphula_spark.operators.ann import semantic_decontaminate

    n_corpus, n_bench, n_plant, dim = 1_000_000, 200_000, 2_000, 32
    vec = lambda seed: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (
            F.pmod(F.xxhash64(seed * F.lit(131) + i), F.lit(1000))
            .cast("double") / F.lit(500.0) - F.lit(1.0)
        ),
    )
    corpus = spark.range(n_corpus).select(
        F.col("id").alias("vec_id"), vec(F.col("id")).alias("embedding")
    )
    # bench: 2k rows IDENTICAL to corpus ids 0..1999 (cosine 1.0) +
    # 198k unrelated
    planted = spark.range(n_plant).select(
        (F.col("id") + 10_000_000).alias("vec_id"),
        vec(F.col("id")).alias("embedding"),
    )
    noise = spark.range(n_bench - n_plant).select(
        (F.col("id") + 20_000_000).alias("vec_id"),
        vec(F.col("id") + 5_000_000).alias("embedding"),
    )
    bench_df = planted.unionByName(noise).persist()
    bench_df.count()
    corpus = corpus.persist()
    corpus.count()

    def run():
        return (
            semantic_decontaminate(corpus, bench_df, bucketed=True)
            .where("contaminated").count()
        )

    dt, bts = measure(
        spark, f"D bucketed decontaminate {n_corpus}x{n_bench}", run
    )
    flagged = (
        semantic_decontaminate(corpus, bench_df, bucketed=True)
        .where("contaminated")
        .where(F.col("vec_id") < n_plant)
        .count()
    )
    corpus.unpersist()
    bench_df.unpersist()
    # noise overlaps are possible (vec(id+5M) can collide with a corpus
    # vec id in [0, 1M) range at seed overlap 5M..6M — outside corpus
    # seeds, so none); planted recall is the gate
    recall = flagged / n_plant
    assert recall >= 0.9, recall
    print(
        f"\nD verdict: {dt:.1f}s, {bts/1e6:.1f} MB shuffled, planted "
        f"recall {recall:.3f} (exact path here would be a "
        f"{n_corpus*n_bench/1e9:.0f}B-pair cross join)"
    )


if __name__ == "__main__":
    spark = get_probe_spark()
    which = set(sys.argv[1:]) or {"a", "b", "c", "d"}
    t0 = time.time()
    if "a" in which:
        probe_a(spark)
    if "b" in which:
        probe_b(spark)
    if "c" in which:
        probe_c(spark)
    if "d" in which:
        probe_d(spark)
    print(f"\nprobe_r11 total {time.time() - t0:.1f}s")
