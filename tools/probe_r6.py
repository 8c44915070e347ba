#!/usr/bin/env python
"""Round-6 scale probes (VERDICT r5 next-round items 3 and 8).

Like the round-5 URL hot-key probe, each probe scales one new operator
~x100 past its bench size and looks for stragglers: the skewed variant
must not be disproportionately slower than a uniform variant of the
same size, and the plan must show the mitigation (partial aggregation,
broadcast) actually engaged.

  1. RDFS materialization on a ~30M-triple graph (bench runs 30k):
     string-triple build -> dictionary encode -> closure, all timed
     separately. The closure is broadcast-rule joins + one dedup; its
     cost must track data size, not ontology shape.
  2. PageRank on a power-law graph (5M edges, hottest node takes ~20%
     of all in-edges) vs a uniform graph of identical size. The dst
     aggregation must pre-aggregate map-side (partial HashAggregate in
     the plan) so the hot node cannot concentrate a shuffle.
  3. sameAs smushing with one celebrity entity holding 1M aliases:
     min-label connected components over a 1M-edge star must converge
     in the label-propagation loop without a hot-partition stall, and
     the end-to-end smush (dictionary-encoded) is timed at 100k
     aliases.

Run:  PYTHONPATH=/root/repo python tools/probe_r6.py
Results are recorded in ROADMAP.md's probe table.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from graphula_spark.session import get_spark


def probe_rdfs_30m(spark) -> None:
    from graphula_spark.graph import Graph
    from graphula_spark.operators.rdfs import (
        RDF_TYPE,
        RDFS_DOMAIN,
        RDFS_RANGE,
        RDFS_SUBCLASS,
        RDFS_SUBPROP,
    )

    n = 15_000_000  # 2 data triples each -> 30M data triples
    base_df = spark.range(n).select(
        F.concat(F.lit("e:"), F.col("id")).alias("s"),
        F.lit(RDF_TYPE).alias("p"),
        F.concat(F.lit("seg:"), F.col("id") % 25).alias("o"),
    )
    edges_df = spark.range(n).select(
        F.concat(F.lit("e:"), F.col("id")).alias("s"),
        F.lit("inNation").alias("p"),
        F.concat(F.lit("nation:"), F.col("id") % 25).alias("o"),
    )
    schema_rows = [
        (f"seg:{i}", RDFS_SUBCLASS, "Segment") for i in range(25)
    ] + [
        ("Segment", RDFS_SUBCLASS, "Thing"),
        ("inNation", RDFS_SUBPROP, "locatedIn"),
        ("locatedIn", RDFS_SUBPROP, "relatedTo"),
        ("inNation", RDFS_DOMAIN, "Customer"),
        ("locatedIn", RDFS_RANGE, "Place"),
    ]
    schema_df = spark.createDataFrame(schema_rows, ["s", "p", "o"])
    strings = base_df.unionByName(edges_df).unionByName(schema_df)

    t0 = time.time()
    g = Graph.from_string_triples(spark, strings, cache=False)
    g = Graph(spark, g.triples.localCheckpoint(eager=True), g.dictionary)
    g.dictionary.df.persist().count()
    n_in = g.triples.count()
    build_s = time.time() - t0

    t0 = time.time()
    mg = g.materialize_rdfs()
    n_out = mg.triples.count()
    closure_s = time.time() - t0
    print(
        f"rdfs_30m: in={n_in:,} out={n_out:,} "
        f"build={build_s:.1f}s closure={closure_s:.1f}s "
        f"({(n_out - n_in) / closure_s:,.0f} derived triples/s)"
    )
    mg.triples.unpersist()
    g.dictionary.df.unpersist()


def probe_pagerank_powerlaw(spark) -> None:
    from graphula_spark.operators.graph_analytics import pagerank

    n_nodes, n_edges = 100_000, 5_000_000
    # power-law dst: pow(rand, 8) concentrates mass near node 0 —
    # the hottest node receives ~20% of all in-edges
    skewed = spark.range(n_edges).select(
        (F.col("id") % n_nodes).alias("src"),
        F.floor(
            F.pow(F.rand(seed=7), F.lit(8.0)) * n_nodes
        ).cast("long").alias("dst"),
    ).localCheckpoint(eager=True)
    uniform = spark.range(n_edges).select(
        (F.col("id") % n_nodes).alias("src"),
        F.floor(F.rand(seed=7) * n_nodes).cast("long").alias("dst"),
    ).localCheckpoint(eager=True)
    hot = (
        skewed.groupBy("dst").count().orderBy(F.desc("count")).first()
    )
    print(
        f"pagerank graph: {n_edges:,} edges, hottest dst holds "
        f"{hot['count'] / n_edges:.1%} of in-edges"
    )

    # the mitigation must be IN THE PLAN: the dst-keyed contribution
    # aggregation pre-aggregates map-side (partial HashAggregate below
    # the exchange), so the hot node's rows collapse per map partition
    e = skewed.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    deg = e.groupBy("u").agg(F.count("*").alias("deg"))
    ranks = e.select(F.col("u").alias("node")).distinct().withColumn(
        "rank", F.lit(1e-5)
    )
    contribs = (
        e.join(deg, "u")
        .join(ranks, F.col("u") == ranks["node"])
        .select("v", (F.col("rank") / F.col("deg")).alias("c"))
        .groupBy("v")
        .agg(F.sum("c").alias("inflow"))
    )
    plan = contribs._sc._jvm.PythonSQLUtils.explainString(
        contribs._jdf.queryExecution(), "simple"
    )
    assert "partial_sum" in plan.lower() or "Partial" in plan, plan[-2000:]
    print("pagerank plan: partial (map-side) aggregation confirmed")

    for name, edges in (("skewed", skewed), ("uniform", uniform)):
        t0 = time.time()
        ranks = pagerank(edges, n_iter=5)
        top = ranks.orderBy(F.desc("rank")).first()
        dt = time.time() - t0
        print(
            f"pagerank {name}: 5 iters in {dt:.1f}s "
            f"(top node {top['node']} rank {top['rank']:.4f})"
        )


def probe_smush_celebrity(spark) -> None:
    from graphula_spark.operators.cluster import connected_components

    # CC engine on the raw 1M-alias star (the shape smush_sameas feeds)
    n_alias = 1_000_000
    star = spark.range(1, n_alias + 1).select(
        F.lit(0).cast("long").alias("s"), F.col("id").alias("o")
    )
    t0 = time.time()
    cc = connected_components(star, src="s", dst="o")
    n_nodes = cc.count()
    one_cluster = cc.select("cluster").distinct().count()
    dt = time.time() - t0
    assert one_cluster == 1 and n_nodes == n_alias + 1
    print(f"cc celebrity star: {n_alias:,} aliases -> 1 component in {dt:.1f}s")

    # end-to-end smush through the dictionary at 100k aliases
    from graphula_spark.graph import Graph
    from graphula_spark.operators.rdfs import OWL_SAMEAS

    n_e2e = 100_000
    links = spark.range(1, n_e2e + 1).select(
        F.lit("ent:celebrity").alias("s"),
        F.lit(OWL_SAMEAS).alias("p"),
        F.concat(F.lit("alias:"), F.col("id")).alias("o"),
    )
    facts = spark.range(1, n_e2e + 1).select(
        F.concat(F.lit("alias:"), F.col("id")).alias("s"),
        F.lit("says").alias("p"),
        F.concat(F.lit("quote:"), F.col("id")).alias("o"),
    )
    g = Graph.from_string_triples(
        spark, links.unionByName(facts), cache=False
    )
    g = Graph(spark, g.triples.localCheckpoint(eager=True), g.dictionary)
    g.dictionary.df.persist().count()
    t0 = time.time()
    sm = g.smush_sameas()
    subj = sm.triples.select("s").distinct().count()
    dt = time.time() - t0
    # every fact subject rewrites to ONE canonical id
    says_subjects = (
        sm.decode(sm.triples, ["p"]).where(F.col("p") == "says")
        .select("s").distinct().count()
    )
    assert says_subjects == 1, says_subjects
    print(
        f"smush e2e: {n_e2e:,} aliases collapsed to 1 canonical "
        f"subject in {dt:.1f}s (distinct subjects after: {subj})"
    )


def _job_shuffle_bytes(spark, run) -> tuple[float, int]:
    """Run `run()` and return (wall seconds, total shuffle-WRITE bytes
    of the jobs it triggered), read from the REST status API — wall
    time on local[32] hides shuffle volume (page-cache speed), but
    bytes moved is exactly what a 1000-executor network pays for."""
    import json as _json
    import time as _t
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def total_bytes() -> int:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            stages = _json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)

    before = total_bytes()
    t0 = _t.time()
    run()
    dt = _t.time() - t0
    return dt, total_bytes() - before


def probe_dataset_rematerialize(spark) -> None:
    """The round-6 lead fix at scale: LANDING a derived set into a
    Dataset's target graph must shuffle derived-sized bytes, not the
    whole quad table. Build ~20M quads + a precomputed derived set,
    then compare the two landing shapes on identical inputs:
    NEW = anti-join against the target graph's slice + narrow union;
    OLD = global dropDuplicates over the full union. Wall time on
    local[32] is page-cache-flattering, so the probe reports SHUFFLE
    BYTES (the cost a real cluster's network pays)."""
    from pyspark.sql import functions as F

    from graphula_spark.dataset import Dataset
    from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS

    n = 5_000_000  # 2 quads per id -> 10M base quads
    data = spark.range(n).select(
        F.concat(F.lit("e:"), F.col("id")).alias("s"),
        F.lit(RDF_TYPE).alias("p"),
        F.concat(F.lit("seg:"), F.col("id") % 25).alias("o"),
        F.lit(None).cast("string").alias("g"),
    ).unionByName(
        spark.range(n).select(
            F.concat(F.lit("e:"), F.col("id")).alias("s"),
            F.lit("linked").alias("p"),
            F.concat(F.lit("e:"), (F.col("id") + 1) % n).alias("o"),
            F.lit(None).cast("string").alias("g"),
        )
    )
    onto = spark.createDataFrame(
        [(f"seg:{i}", RDFS_SUBCLASS, "Segment", "http://ex/onto") for i in range(25)]
        + [("Segment", RDFS_SUBCLASS, "Thing", "http://ex/onto")],
        ["s", "p", "o", "g"],
    )
    ds = Dataset.from_string_quads(spark, data.unionByName(onto))
    ds2 = ds.materialize_rdfs("http://ex/onto", "http://ex/inf")
    quads = ds2.quads.localCheckpoint(eager=True)
    n_quads = quads.count()
    gid_row = (
        Dataset(spark, quads, ds2.dictionary)
        .dictionary.lookup_terms(["http://ex/inf"])
    )
    gid = gid_row["http://ex/inf"]
    # a derived set to land: a small slice of the target graph
    # (already present, so both shapes produce the same final count) —
    # the realistic shape, where a re-derivation is tiny next to the
    # corpus
    derived = (
        quads.where(F.col("g") == gid).select("s", "p", "o").limit(50_000)
    )
    derived = derived.localCheckpoint(eager=True)
    n_derived = derived.count()

    def land_new():
        # mirrors Dataset.materialize_rdfs: semi-join the overlap out
        # of the target slice (broadcast-able derived), then a
        # derived-bounded anti-join — a direct derived-ANTI-existing
        # would shuffle the whole slice (LEFT ANTI can only broadcast
        # its right side)
        existing = quads.where(F.col("g") == F.lit(gid)).select("s", "p", "o")
        present = existing.join(derived, ["s", "p", "o"], "left_semi")
        fresh = derived.join(present, ["s", "p", "o"], "left_anti")
        out = quads.unionByName(
            fresh.withColumn("g", F.lit(gid).cast("long")).select(
                "s", "p", "o", "g"
            )
        )
        assert out.count() == n_quads

    def land_old():
        out = quads.unionByName(
            derived.withColumn("g", F.lit(gid).cast("long")).select(
                "s", "p", "o", "g"
            )
        ).dropDuplicates(["s", "p", "o", "g"])
        assert out.count() == n_quads

    new_s, new_b = _job_shuffle_bytes(spark, land_new)
    old_s, old_b = _job_shuffle_bytes(spark, land_old)
    print(
        f"dataset rematerialize landing @ {n_quads:,} quads, "
        f"{n_derived:,} derived: NEW(anti-join+append) "
        f"{new_s:.1f}s / {new_b/1e6:.0f} MB shuffled vs "
        f"OLD(global dedup) {old_s:.1f}s / {old_b/1e6:.0f} MB shuffled"
    )


if __name__ == "__main__":
    spark = get_spark("probe-r6")
    spark.sparkContext.setLogLevel("ERROR")
    probe_pagerank_powerlaw(spark)
    probe_smush_celebrity(spark)
    probe_rdfs_30m(spark)
    probe_dataset_rematerialize(spark)
