#!/usr/bin/env python
"""Round-9 probe: shuffle bytes of INCREMENTAL OWL maintenance at
~18M triples (VERDICT r8 #1 done-gate: "a probe row proving shuffle is
O(batch ∪ affected), not O(corpus)").

Setup: a graph holding a pre-CLOSED owl:TransitiveProperty relation —
1M disjoint chains of 4 nodes each, all 6 closed pairs per chain
synthesized directly (6M suborg pairs; materialize_owl would add
nothing, by construction) — plus 12M filler edges no rule touches and
the one TransitiveProperty declaration.

Measured:
  1. NEW — `Graph.add_materialized_rdfs(batch, owl=True)` with a
     1000-edge batch bridging 1000 chain tails to 1000 other chains'
     heads: each bridge makes 4×4 = 16 new closure pairs (16k total).
     Expected shuffle: batch/affected-sized (a few MB at most) — the
     T = (I ∪ G_p) ∘ Δ ∘ (I ∪ G_p) joins broadcast Δ and STREAM the
     6M-pair corpus relation.
  2. OLD — the pre-r9 fallback: land the batch, re-run the full
     `materialize_owl` fixpoint. Expected: corpus-sized shuffles (the
     semi-naive closure loop re-joins the whole 6M-pair relation).

Counts must agree row-exact (the equivalence the test suite asserts
on randomized + LUBM graphs; here it doubles as the probe's sanity
check). BYTES MOVED is the metric — wall time on local[32] hides
shuffle volume at page-cache speed. Results go in ROADMAP.md's probe
table.

Run:  PYTHONPATH=/root/repo python tools/probe_r9.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from tools.probe_r8 import get_probe_spark, measure  # noqa: E402

N_CHAINS = 1_000_000
CHAIN = 4  # nodes per chain
N_FILLER = 12_000_000
N_BRIDGES = 1_000

SUBORG = "org:subOrg"


def build_closed_graph(spark):
    """Graph with the suborg relation ALREADY transitively closed:
    per chain k with nodes n:{4k..4k+3}, all i<j pairs (6 per chain)."""
    from graphula_spark.graph import Graph
    from graphula_spark.operators.rdfs import OWL_TRANSITIVE, RDF_TYPE

    pairs = [(i, j) for i in range(CHAIN) for j in range(CHAIN) if i < j]
    chains = spark.range(N_CHAINS)
    closed = None
    for i, j in pairs:
        part = chains.select(
            F.concat(F.lit("n:"), F.col("id") * CHAIN + i).alias("s"),
            F.lit(SUBORG).alias("p"),
            F.concat(F.lit("n:"), F.col("id") * CHAIN + j).alias("o"),
        )
        closed = part if closed is None else closed.unionByName(part)
    filler = spark.range(N_FILLER).select(
        F.concat(F.lit("e:"), F.col("id")).alias("s"),
        F.lit("linked").alias("p"),
        F.concat(F.lit("e:"), (F.col("id") + 1) % N_FILLER).alias("o"),
    )
    schema = spark.createDataFrame(
        [(SUBORG, RDF_TYPE, OWL_TRANSITIVE)], ["s", "p", "o"]
    )
    strings = closed.unionByName(filler).unionByName(schema)
    g = Graph.from_string_triples(spark, strings, cache=False)
    g = type(g)(spark, g.triples.localCheckpoint(eager=True), g.dictionary)
    g.dictionary.df.persist().count()
    return g


def bridge_batch(spark):
    """1000 edges, each from chain k's TAIL (node 4k+3) to chain
    (k + N_CHAINS//2)'s HEAD — merges disjoint chains, 16 new closure
    pairs per bridge."""
    return spark.range(N_BRIDGES).select(
        F.concat(F.lit("n:"), F.col("id") * CHAIN + (CHAIN - 1)).alias("s"),
        F.lit(SUBORG).alias("p"),
        F.concat(
            F.lit("n:"), (F.col("id") + N_CHAINS // 2) * CHAIN
        ).alias("o"),
    )


def delete_batch(spark):
    """1000 DERIVED closure pairs (the per-chain head→tail pair
    n:4k → n:4k+3, which the chain re-derives via its surviving 2-step
    decompositions) from chains untouched by the insert probe —
    victims that all REDERIVE, the maximal rederive-work case."""
    return spark.range(N_BRIDGES).select(
        F.concat(
            F.lit("n:"), (F.col("id") + 100_000) * CHAIN
        ).alias("s"),
        F.lit(SUBORG).alias("p"),
        F.concat(
            F.lit("n:"), (F.col("id") + 100_000) * CHAIN + (CHAIN - 1)
        ).alias("o"),
    )


def main() -> None:
    from graphula_spark.operators.rdfs import materialize_owl

    spark = get_probe_spark()
    spark.sparkContext.setLogLevel("ERROR")
    g = build_closed_graph(spark)
    n_in = g.triples.count()
    batch = bridge_batch(spark).localCheckpoint(eager=True)
    print(
        f"=== incremental OWL maintenance: {n_in:,} triples, "
        f"{N_BRIDGES} bridge edges, expect {N_BRIDGES * 16:,} new "
        f"closure pairs ==="
    )

    counts = {}

    def run_new():
        inc = g.add_materialized_rdfs(batch, owl=True)
        counts["inc"] = inc.triples.count()

    def run_old():
        g2 = g.add_string_triples(batch)
        full = materialize_owl(g2)
        counts["full"] = full.triples.count()
        full.triples.unpersist()

    new_s, new_b = measure(
        spark, "NEW (derive_owl_delta incremental path)", run_new
    )
    n_new = counts["inc"] - n_in
    print(
        f"  ({n_new:,} rows added = batch {N_BRIDGES} + derived "
        f"{n_new - N_BRIDGES:,})"
    )
    old_s, old_b = measure(
        spark, "OLD (full materialize_owl fallback)", run_old
    )
    assert counts["inc"] == counts["full"], (
        f"equivalence FAILED: inc {counts['inc']:,} != "
        f"full {counts['full']:,}"
    )
    per_row = new_b / max(n_new, 1)
    print(
        f"\nOWL-delta verdict: NEW shuffles {new_b/1e6:.1f} MB "
        f"({per_row:.0f} B/new row) vs OLD {old_b/1e6:.1f} MB — "
        f"{old_b/max(new_b,1):.0f}x less; counts agree "
        f"({counts['inc']:,}). O(batch ∪ affected) claim "
        f"{'HOLDS' if new_b * 5 < old_b else 'FAILS'}."
    )

    # ---- decremental path (round-9 extra) ---------------------------
    dbatch = delete_batch(spark).localCheckpoint(eager=True)
    print(
        f"\n=== decremental OWL maintenance: delete {N_BRIDGES} "
        f"derived pairs (all rederivable) ==="
    )

    def run_delete():
        out = g.delete_materialized_rdfs(dbatch, owl=True)
        counts["del"] = out.triples.count()

    del_s, del_b = measure(
        spark, "delete_materialized_rdfs (victim-keyed)", run_delete
    )
    # every victim rederives: the closure is UNCHANGED
    assert counts["del"] == n_in, (counts["del"], n_in)
    print(
        f"\nDecremental verdict: {del_b/1e6:.1f} MB shuffled to judge "
        f"{N_BRIDGES} victims against an {n_in:,}-row store "
        f"(closure unchanged — all rederived). Victim-keyed claim "
        f"{'HOLDS' if del_b * 5 < old_b else 'FAILS'} vs the "
        f"{old_b/1e6:.0f} MB full-rebuild yardstick."
    )


if __name__ == "__main__":
    main()
