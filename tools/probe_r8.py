#!/usr/bin/env python
"""Round-8 probe: END-TO-END shuffle bytes of the ρdf inference path
at ~20M triples (VERDICT r7 What's-missing #2 / next-round #4).

Round 6 measured only the LANDING half of Dataset re-materialization
(tools/probe_r6.py: 1 MB vs 312 MB). Round 7 rewrote the input side
(`rdfs._derive_only` / `Dataset.materialize_rdfs`) and CLAIMED every
shuffle is O(derived) in docstrings. This probe measures it:

  1. `Graph.materialize_rdfs` end-to-end on a 20M-triple graph whose
     rules derive a corpus-small set (~0.8M triples, 4% of corpus):
     total shuffleWriteBytes + per-stage breakdown must be
     derived-sized, not corpus-sized.
  2. The SAME graph through the pre-r7 shape (triples ∪ rule frames →
     global dropDuplicates) as the corpus-sized yardstick.
  3. `Dataset.materialize_rdfs` end-to-end (derive + land) at the same
     scale — the full API call the r6/r7 fixes target.
  4. The broadcast boundary: a variant where EVERY type triple derives
     (derived = 2× corpus types, ~40 MB > the 64 MB threshold is NOT
     crossed here, but ~20M rows exceed AQE's broadcast conversion at
     times) — records what plan the overlap semi-join actually gets
     when the derived side stops being broadcast-small. Whatever it
     shows is the honest answer: when derived ≈ corpus, O(derived)
     and O(corpus) coincide and a shuffle join IS the right plan.

Wall time on local[32] hides shuffle volume (page-cache speed); BYTES
MOVED is what a 1000-executor network pays. Results go in ROADMAP.md's
probe table.

Run:  PYTHONPATH=/root/repo python tools/probe_r8.py
"""

from __future__ import annotations

import json
import time
import urllib.request

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def get_probe_spark():
    """The engine session (graphula_spark.session.get_spark) with the
    UI re-enabled: the REST status API is the only place per-stage
    shuffleWriteBytes is exposed."""
    return (
        SparkSession.builder.appName("probe-r8")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _stages(spark) -> dict[int, dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        return {
            (s["stageId"], s["attemptId"]): s for s in json.load(r)
        }


def measure(spark, label: str, run) -> tuple[float, int]:
    """Run `run()`; print wall time, total NEW shuffle-write bytes and
    the per-stage breakdown (every new stage with nonzero shuffle
    write, largest first)."""
    before = _stages(spark)
    t0 = time.time()
    run()
    dt = time.time() - t0
    after = _stages(spark)
    new = {k: v for k, v in after.items() if k not in before}
    total = sum(s.get("shuffleWriteBytes", 0) for s in new.values())
    print(f"\n{label}: {dt:.1f}s, {total/1e6:.1f} MB total shuffle write")
    writers = sorted(
        (s for s in new.values() if s.get("shuffleWriteBytes", 0) > 0),
        key=lambda s: -s["shuffleWriteBytes"],
    )
    for s in writers:
        name = s.get("name", "?").split("\n")[0][:90]
        print(
            f"  stage {s['stageId']}: {s['shuffleWriteBytes']/1e6:8.1f} MB "
            f"({s.get('numTasks', '?')} tasks)  {name}"
        )
    if not writers:
        print("  (no shuffle-writing stages)")
    return dt, total


def build_graph(spark, frac_typed_in_hierarchy: int):
    """~20M-triple graph: 10M 'linked' edges (no rules fire) + 10M
    rdf:type triples over 25 classes. Only entities with
    id % frac == 0 get class seg:0, the one class on the subClassOf
    chain seg:0 ⊑ Segment ⊑ Thing — so derived size =
    2 × (10M / frac) while the corpus stays 20M. frac=1 puts EVERY
    class on the chain (derived ≈ 2 × 10M)."""
    from graphula_spark.graph import Graph
    from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS

    n = 10_000_000
    types = spark.range(n).select(
        F.concat(F.lit("e:"), F.col("id")).alias("s"),
        F.lit(RDF_TYPE).alias("p"),
        F.when(
            F.col("id") % frac_typed_in_hierarchy == 0, F.lit("seg:0")
        )
        .otherwise(F.concat(F.lit("seg:"), (F.col("id") % 24) + 1))
        .alias("o"),
    )
    linked = spark.range(n).select(
        F.concat(F.lit("e:"), F.col("id")).alias("s"),
        F.lit("linked").alias("p"),
        F.concat(F.lit("e:"), (F.col("id") + 1) % n).alias("o"),
    )
    if frac_typed_in_hierarchy == 1:
        schema = [(f"seg:{i}", RDFS_SUBCLASS, "Segment") for i in range(25)]
    else:
        schema = [("seg:0", RDFS_SUBCLASS, "Segment")]
    schema.append(("Segment", RDFS_SUBCLASS, "Thing"))
    strings = types.unionByName(linked).unionByName(
        spark.createDataFrame(schema, ["s", "p", "o"])
    )
    g = Graph.from_string_triples(spark, strings, cache=False)
    g = type(g)(spark, g.triples.localCheckpoint(eager=True), g.dictionary)
    g.dictionary.df.persist().count()
    return g


def probe_graph_materialize(spark) -> None:
    from graphula_spark.graph import Graph
    from graphula_spark.operators import rdfs as R

    g = build_graph(spark, frac_typed_in_hierarchy=25)
    n_in = g.triples.count()
    # NO warm-up derive: _derive_only persists its derived frames, and
    # a prior derive_rdfs() would let the measured materialize read
    # them from cache — the honest number is the FIRST call's cost
    counts = {}
    print(f"\n=== Graph.materialize_rdfs end-to-end: {n_in:,} triples ===")

    def run_new():
        mg = g.materialize_rdfs()
        counts["out"] = mg.triples.count()
        mg.triples.unpersist()

    def run_old():
        # the pre-r7 shape: corpus ∪ rule frames → GLOBAL dedup
        frames, _d = R._derived_frames(g)
        u = g.triples.select("s", "p", "o")
        for f_ in frames:
            u = u.unionByName(f_)
        assert u.dropDuplicates(["s", "p", "o"]).count() == counts["out"]

    new_s, new_b = measure(spark, "NEW (r8 gated-broadcast shape)", run_new)
    n_derived = counts["out"] - n_in
    print(
        f"  ({n_derived:,} derived, {n_derived/n_in:.1%} of corpus)"
    )
    old_s, old_b = measure(spark, "OLD (global-dedup shape)", run_old)
    per_row = new_b / max(n_derived, 1)
    print(
        f"\nGraph verdict: NEW shuffles {new_b/1e6:.0f} MB "
        f"({per_row:.0f} B/derived row) vs OLD {old_b/1e6:.0f} MB — "
        f"{old_b/max(new_b,1):.0f}x less. O(derived) claim "
        f"{'HOLDS' if new_b * 5 < old_b else 'FAILS'}."
    )
    g.dictionary.df.unpersist()


def probe_dataset_materialize(spark) -> None:
    from graphula_spark.dataset import Dataset
    from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS

    n = 10_000_000
    data = (
        spark.range(n)
        .select(
            F.concat(F.lit("e:"), F.col("id")).alias("s"),
            F.lit(RDF_TYPE).alias("p"),
            F.when(F.col("id") % 25 == 0, F.lit("seg:0"))
            .otherwise(F.concat(F.lit("seg:"), (F.col("id") % 24) + 1))
            .alias("o"),
            F.lit(None).cast("string").alias("g"),
        )
        .unionByName(
            spark.range(n).select(
                F.concat(F.lit("e:"), F.col("id")).alias("s"),
                F.lit("linked").alias("p"),
                F.concat(F.lit("e:"), (F.col("id") + 1) % n).alias("o"),
                F.lit(None).cast("string").alias("g"),
            )
        )
    )
    onto = spark.createDataFrame(
        [
            ("seg:0", RDFS_SUBCLASS, "Segment", "http://ex/onto"),
            ("Segment", RDFS_SUBCLASS, "Thing", "http://ex/onto"),
        ],
        ["s", "p", "o", "g"],
    )
    ds = Dataset.from_string_quads(spark, data.unionByName(onto))
    ds = Dataset(
        spark, ds.quads.localCheckpoint(eager=True), ds.dictionary
    )
    ds.dictionary.df.persist().count()
    n_quads = ds.quads.count()
    print(f"\n=== Dataset.materialize_rdfs end-to-end: {n_quads:,} quads ===")

    def run():
        out = ds.materialize_rdfs("http://ex/onto", "http://ex/inf")
        n_out = out.quads.count()
        assert n_out > n_quads, (n_out, n_quads)

    dt, b = measure(spark, "Dataset.materialize_rdfs (derive + land)", run)
    print(
        f"\nDataset verdict: full derive+land shuffled {b/1e6:.0f} MB at "
        f"{n_quads:,} quads."
    )
    ds.dictionary.df.unpersist()


def probe_broadcast_boundary(spark) -> None:
    """What plan does the overlap semi-join get when derived is NOT
    broadcast-small? frac=1 derives ~2 rows per type triple (~20M,
    corpus-sized). Record the bytes — at this size O(derived) and
    O(corpus) coincide, so a shuffle join is the correct plan; the
    probe documents the boundary rather than asserting smallness."""
    from graphula_spark.operators import rdfs as R

    g = build_graph(spark, frac_typed_in_hierarchy=1)
    n_in = g.triples.count()
    counts = {}
    print(f"\n=== broadcast boundary: {n_in:,} triples ===")

    def run():
        mg = g.materialize_rdfs()
        counts["out"] = mg.triples.count()
        mg.triples.unpersist()

    dt, b = measure(spark, "NEW shape, corpus-sized derivation", run)
    n_derived = counts["out"] - n_in
    print(
        f"\nBoundary verdict: {b/1e6:.0f} MB shuffled for a "
        f"{n_derived:,}-row derivation ({n_derived/n_in:.1%} of corpus, "
        f"{b/max(n_derived,1):.0f} B/row) — at this size O(derived) and "
        "O(corpus) coincide, so derived-proportional bytes are correct."
    )
    g.dictionary.df.unpersist()


def probe_insert(spark) -> None:
    """Round-8 follow-on: Graph.add_string_triples at 20M triples.
    Inserting a 10k-triple batch must shuffle batch-sized bytes — the
    old shape global-deduped corpus ∪ batch (a full corpus shuffle per
    insert)."""
    from pyspark.sql import functions as F

    g = build_graph(spark, frac_typed_in_hierarchy=25)
    n_in = g.triples.count()
    batch = spark.range(10_000).select(
        F.concat(F.lit("new:"), F.col("id")).alias("s"),
        F.lit("linked").alias("p"),
        F.concat(F.lit("e:"), F.col("id")).alias("o"),
    )
    print(f"\n=== Graph.add_string_triples: {n_in:,} triples + 10k batch ===")

    def run_new():
        g2 = g.add_string_triples(batch)
        assert g2.triples.count() == n_in + 10_000

    def run_old():
        d2 = g.dictionary.union(
            batch.select(F.explode(F.array("s", "p", "o")).alias("value"))
        )
        enc = batch
        for c in ("s", "p", "o"):
            enc = d2.encode_col(enc, c, f"{c}_id")
        new_t = enc.select(
            F.col("s_id").alias("s"),
            F.col("p_id").alias("p"),
            F.col("o_id").alias("o"),
        )
        out = (
            g.triples.select("s", "p", "o")
            .unionByName(new_t)
            .dropDuplicates(["s", "p", "o"])
        )
        assert out.count() == n_in + 10_000

    new_s, new_b = measure(spark, "NEW (gated two-step insert)", run_new)
    old_s, old_b = measure(spark, "OLD (global dedup insert)", run_old)
    print(
        f"\nInsert verdict: NEW {new_b/1e6:.1f} MB vs OLD {old_b/1e6:.0f} MB "
        f"shuffled for a 10k insert."
    )
    g.dictionary.df.unpersist()


def probe_delta_materialize(spark) -> None:
    """Incremental closure maintenance at 20M CLOSED triples: a 10k
    batch through add_materialized_rdfs must cost O(batch) rule work,
    vs re-deriving the whole closure (which is itself already
    derived-sized post-r8 — the delta should beat even that)."""
    from pyspark.sql import functions as F

    g = build_graph(spark, frac_typed_in_hierarchy=25)
    closed = g.materialize_rdfs()
    closed = type(g)(
        spark, closed.triples.localCheckpoint(eager=True), closed.dictionary
    )
    n_closed = closed.triples.count()
    batch = spark.range(10_000).select(
        F.concat(F.lit("e:"), F.col("id")).alias("s"),  # existing entities
        F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type").alias("p"),
        F.lit("seg:0").alias("o"),
    )
    print(
        f"\n=== add_materialized_rdfs (delta): {n_closed:,} closed triples "
        "+ 10k type batch ==="
    )

    def run_delta():
        g2 = closed.add_materialized_rdfs(batch)
        g2.triples.count()

    def run_full():
        g2 = closed.add_string_triples(batch).materialize_rdfs()
        g2.triples.count()

    d_s, d_b = measure(spark, "DELTA (batch rule input)", run_delta)
    f_s, f_b = measure(spark, "FULL (re-materialize)", run_full)
    print(
        f"\nDelta verdict: {d_b/1e6:.1f} MB / {d_s:.1f}s vs full "
        f"re-materialization {f_b/1e6:.1f} MB / {f_s:.1f}s."
    )
    g.dictionary.df.unpersist()


if __name__ == "__main__":
    import sys

    spark = get_probe_spark()
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:])
    probes = {
        "graph": probe_graph_materialize,
        "dataset": probe_dataset_materialize,
        "boundary": probe_broadcast_boundary,
        "insert": probe_insert,
        "delta": probe_delta_materialize,
    }
    for name, fn in probes.items():
        if not only or name in only:
            fn(spark)
