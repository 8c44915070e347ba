"""Property paths / transitive closure via semi-naive iterative joins.

The reference declares property paths but throws at runtime
(sparql/.../Sparql.scala:130-134 — Graph.find is unimplemented); the
divide-and-conquer execution this engine uses instead is the classic
semi-naive datalog iteration: each round joins only the *new* frontier
against the base edges, unions, dedups, and stops at a fixed point.

Scale notes: every iteration is one shuffle join on the frontier; the
accumulated path set is persisted per round and the previous round
unpersisted, so memory stays bounded by |closure|. At 100 TB you bound
rounds with max_iter (graph diameter) and the frontier shrinks
monotonically once the closure saturates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """All pairs (src, dst) connected by a path of >= 1 edges."""
    # localCheckpoint (not persist) per round: the semi-naive loop's
    # logical plan otherwise grows with every iteration and Catalyst
    # re-analyzes the whole history each round (see cluster.py)
    base = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct().localCheckpoint(eager=True)
    paths = base
    frontier = base
    for _ in range(max_iter):
        grown = (
            frontier.alias("f")
            .join(base.alias("b"), F.col("f.dst") == F.col("b.src"))
            .select(F.col("f.src").alias("src"), F.col("b.dst").alias("dst"))
            .distinct()
        )
        new = grown.join(paths, ["src", "dst"], "left_anti").localCheckpoint(
            eager=True
        )
        if new.limit(1).count() == 0:
            break
        # union accumulators use persist, not localCheckpoint: Spark's
        # Union constraint-rewrite chokes on unions of checkpointed
        # frames (key-not-found on remapped attribute ids); the lineage
        # stays shallow because every union INPUT is checkpointed flat
        old = paths
        paths = paths.unionByName(new).persist()
        paths.count()
        if old is not base:
            old.unpersist()
        frontier = new
    # the final accumulator stays persisted for the caller's consumption;
    # track() lets scoped callers (derive_owl_delta's per-round scope,
    # long ingest loops) release it instead of leaking a cache entry per
    # closure call — a no-op for unscoped one-shot callers
    from graphula_spark.scratch import track

    return track(paths)


def reachable_from(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """BFS from a seed set: distinct nodes reachable in >= 1 hops.
    Returns (start, node)."""
    base = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct().localCheckpoint(eager=True)
    seeds = sources.select(F.col(sources.columns[0]).alias("start"))
    frontier = (
        seeds.join(base, seeds["start"] == base["src"])
        .select("start", F.col("dst").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seen = frontier
    for _ in range(max_iter):
        grown = (
            frontier.alias("f")
            .join(base.alias("b"), F.col("f.node") == F.col("b.src"))
            .select(F.col("f.start").alias("start"), F.col("b.dst").alias("node"))
            .distinct()
        )
        new = grown.join(seen, ["start", "node"], "left_anti").localCheckpoint(
            eager=True
        )
        if new.limit(1).count() == 0:
            break
        old = seen
        seen = seen.unionByName(new).persist()
        seen.count()
        old.unpersist()
        frontier = new
    return seen
