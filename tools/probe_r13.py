#!/usr/bin/env python
"""Round-13 probes.

Section A — SemDeDup hot-cell cap (VERDICT r12 #3): plant a
near-identical-yet-DISTINCT embedding hub (one template re-rendered
5k ways plus 10k scatter vectors). `collapse_exact` cannot touch it
(every vector differs), so the uncapped pass pays pop²/2 pair scores
inside ONE KMeans cell — and because the pair join keys on the cell
id, those scores land in ONE task: the single-straggler signature
that stalls a 1000-executor cluster no matter how many cores it has.
With `max_cell_size`, the cell is sub-bucketed by centroid-centered
hyperplane signs and reconnected through per-bucket representatives
(`_subdivide_hot_cells`). Metrics: wall, pair volume, max task
seconds, and pairwise CLUSTERING RECALL of the capped pass against
the uncapped one (fraction of same-group item pairs preserved),
gated >= 0.9 — in the hub regime the representative bridge keeps the
group whole, so the expected recall is 1.0.

Section B — bucketed TPC-H catalog at ~sf1 (VERDICT r12 #6):
PLANS.md §34 measured the co-bucketed lineitem/orders A/B at sf0.1;
this re-runs plain vs bucketed q3/q18/q21 at the ×10 replication
(bench.ensure_sf1), recording wall, Exchange counts from the
formatted plan, and per-run shuffle-write bytes.

Run:  PYTHONPATH=/root/repo python tools/probe_r13.py
"""

from __future__ import annotations

import contextlib
import io
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from tools.probe_r12 import measure_tasks  # noqa: E402
from tools.probe_r8 import get_probe_spark  # noqa: E402


def build_hub_corpus(spark, hub_n=14_000, scatter_n=10_000, dim=32):
    """Deterministic corpus: `hub_n` unit vectors jittered around one
    template direction (pairwise cosine ~0.999, all DISTINCT) plus
    `scatter_n` independent vectors. JVM-side generation (xxhash64
    noise), materialized once."""
    # template: a fixed unit direction; jitter amplitude 0.01 per dim
    template = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (F.pmod(F.xxhash64(F.lit(777), d), F.lit(2000)) - 1000.0)
        / 1000.0,
    )
    hub = spark.range(hub_n).select(
        F.col("id").alias("vec_id"),
        F.zip_with(
            template,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: (
                    F.pmod(F.xxhash64(F.col("id"), d, F.lit(1)), F.lit(2000))
                    - 1000.0
                )
                / 100000.0,
            ),
            lambda t, n: t + n,
        ).alias("embedding"),
    )
    scatter = spark.range(scatter_n).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.pmod(F.xxhash64(F.col("id"), d, F.lit(2)), F.lit(2000))
                - 1000.0
            )
            / 1000.0,
        ).alias("embedding"),
    )
    df = hub.unionByName(scatter).persist()
    print(f"corpus: {df.count():,} vectors ({hub_n:,} hub + "
          f"{scatter_n:,} scatter), dim {dim}")
    return df


def pairwise_recall(uncapped, capped) -> float:
    """Fraction of same-group item pairs in the uncapped clustering
    that remain same-group in the capped one: sum over the
    (uncapped_group, capped_group) contingency of C(n,2), divided by
    the uncapped sum of C(n,2). Singletons contribute nothing."""
    u = uncapped.where(F.col("dup_group").isNotNull()).select(
        "id", F.col("dup_group").alias("ug")
    )
    c = capped.where(F.col("dup_group").isNotNull()).select(
        "id", F.col("dup_group").alias("cg")
    )
    denom_df = u.groupBy("ug").count().agg(
        F.sum(F.expr("count * (count - 1) / 2")).alias("p")
    )
    denom = denom_df.collect()[0]["p"] or 0
    if not denom:
        return 1.0
    num_df = (
        u.join(c, "id")
        .groupBy("ug", "cg")
        .count()
        .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("p"))
    )
    num = num_df.collect()[0]["p"] or 0
    return float(num) / float(denom)


def _run_semdedup(spark, df, cap, label):
    from graphula_spark.operators.ann import semantic_dedup

    holder = {}

    def run():
        out = semantic_dedup(
            df, n_cells=8, eps=0.95, seed=5,
            collapse_exact=False, max_cell_size=cap,
        ).persist()
        holder["out"] = out
        holder["rows"] = out.count()

    wall, _shuf, worst = measure_tasks(spark, f"semantic_dedup {label}", run)
    out = holder["out"]
    n_groups = (
        out.where(F.col("dup_group").isNotNull())
        .select("dup_group").distinct().count()
    )
    kept = out.where(F.col("keep")).count()
    print(f"  -> {holder['rows']:,} rows, {n_groups} dup groups, "
          f"{kept:,} kept")
    return out, wall, worst


def semdedup_cap_probe(spark) -> None:
    # --- A/B at 5k hub (the largest size whose uncapped pass still
    # fits this host): wall, max task, and pairwise clustering recall
    df5 = build_hub_corpus(spark, hub_n=5_000)
    unc, unc_wall, unc_worst = _run_semdedup(spark, df5, None, "5k uncapped")
    cap_out, cap_wall, cap_worst = _run_semdedup(
        spark, df5, 325, "5k capped(325)"
    )
    recall = pairwise_recall(unc, cap_out)
    print(f"\npairwise clustering recall capped-vs-uncapped: {recall:.4f}")
    assert recall >= 0.9, recall
    print(f"max-task: {unc_worst:.1f}s -> {cap_worst:.1f}s "
          f"({unc_worst / max(cap_worst, 1e-9):.1f}x); "
          f"wall {unc_wall:.1f}s -> {cap_wall:.1f}s")
    unc.unpersist()
    cap_out.unpersist()
    df5.unpersist()

    # --- 14k hub: the capped pass completes with GROUND-TRUTH recall
    # (the hub is one eps-clique by construction, so the true
    # clustering is one 14k group — checkable without an uncapped
    # reference); the uncapped attempt runs LAST because it OOMs the
    # 16 GB local JVM under normal cache pressure (its pair set alone
    # is ~10^8 rows of joined array payloads; on a freshly started JVM
    # it completes but 7.5x slower with a 42s straggler task) — so the
    # try/except reports whichever outcome this host produces.
    df14 = build_hub_corpus(spark, hub_n=14_000)
    cap14, cap14_wall, cap14_worst = _run_semdedup(
        spark, df14, 650, "14k capped(650)"
    )
    hub_rows = cap14.where(F.col("id") < 1_000_000)
    hub_groups = hub_rows.select("dup_group").distinct().collect()
    assert len(hub_groups) == 1 and hub_groups[0][0] == 0, hub_groups
    assert hub_rows.where(F.col("keep")).count() == 1
    print(f"14k capped: ground-truth ONE hub group, 1 survivor "
          f"(wall {cap14_wall:.1f}s, max task {cap14_worst:.1f}s)")
    cap14.unpersist()
    try:
        _run_semdedup(spark, df14, None, "14k uncapped (expected to die)")
        print("14k uncapped: completed on this host")
    except Exception as e:
        print(f"14k uncapped: FAILED as expected — {type(e).__name__}: "
              f"{str(e)[:160]}")
    df14.unpersist()


def _exchanges(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return sum(
        1 for ln in buf.getvalue().splitlines()
        if ln.strip().startswith(("Exchange", "+ Exchange"))
        or "Exchange" in ln.split("(")[0]
    )


def bucketed_sf1_probe(spark) -> None:
    import os

    import bench
    from graphula_spark import tpch

    sf1 = bench.ensure_sf1(spark, "/root/testdata/sf0.1")
    qnames = ("tpch_q3", "tpch_q18", "tpch_q21")

    def med(fn, runs=3):
        times = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf1).count()
            times.append(time.time() - t0)
        return statistics.median(times)

    plain = {}
    for q in qnames:
        fn = tpch.QUERIES[q]
        fn(spark, sf1).count()  # warm
        _, shuf, _ = measure_tasks(spark, f"plain {q} (sf1)",
                                   lambda fn=fn: fn(spark, sf1).count())
        plain[q] = (med(fn), _exchanges(fn(spark, sf1)), shuf)

    loc = "/tmp/graphula_tpch_bucketed/" + sf1.strip("/").replace("/", "_")
    t0 = time.time()
    if os.path.exists(f"{loc}/_bucket_meta.json"):
        tpch.register_bucketed(spark, loc)
    else:
        tpch.save_bucketed(spark, sf1, loc, prefix="proberkt13")
    build_s = time.time() - t0
    print(f"\nbucketed build/attach: {build_s:.1f}s")
    try:
        bucketed = {}
        for q in qnames:
            fn = tpch.QUERIES[q]
            fn(spark, sf1).count()  # warm
            _, shuf, _ = measure_tasks(spark, f"bucketed {q} (sf1)",
                                       lambda fn=fn: fn(spark, sf1).count())
            bucketed[q] = (med(fn), _exchanges(fn(spark, sf1)), shuf)
    finally:
        tpch.BUCKETED.pop(sf1, None)
    print("\n== bucketed catalog at ~sf1 (x10 facts) ==")
    for q in qnames:
        pw, pe, ps = plain[q]
        bw, be, bs = bucketed[q]
        print(f"{q}: wall {pw:.2f}s -> {bw:.2f}s ({pw/bw:.2f}x), "
              f"exchanges {pe} -> {be}, "
              f"shuffle {ps/1e6:.1f} MB -> {bs/1e6:.1f} MB")


if __name__ == "__main__":
    import os

    spark = get_probe_spark()
    section = os.environ.get("PROBE_SECTION", "AB")
    if "A" in section:
        semdedup_cap_probe(spark)
    if "B" in section:
        bucketed_sf1_probe(spark)
    print("\nPROBE R13 DONE")
