"""Graph analytics over the triple store's edge view.

The reference sketches exactly this direction: a fully written but
commented-out `randomWalk` operator (core/.../Graphula.scala:509-658
in the reference — dead code, never shipped). This module implements
that operator for real, plus PageRank, both as iterative DataFrame
programs (joins + aggregations, localCheckpoint-truncated lineage —
see cluster.py for why).

Edges are any (src, dst) DataFrame — `Graph.triples.select("s", "o")`
(optionally filtered to one predicate) is the natural feed.

Scale shape: each step/iteration is one join keyed on the frontier
node id plus a bounded aggregation; nothing is ever collected to the
driver, and walks/ranks advance for all sources simultaneously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: truncate iterative-loop lineage every this many iterations — each
#: eager localCheckpoint is a full job (the local job floor dominates
#: small iterative workloads), while a 4-iteration join/agg plan is
#: still far inside Catalyst's analyzer budget (round 14)
_CHECKPOINT_EVERY = 4


def random_walks(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_steps: int = 3,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """Deterministic seeded random walk from every start node (default:
    every distinct source), one walk per start.

    At each step the walker at node v picks outgoing edge number
    `xxhash64(seed, walk_id, step, v) mod out_degree(v)` — a pure
    function of (seed, walk, step, position), so walks are reproducible
    across runs and cluster shapes (the reference's sketch used
    ThreadLocalRandom — not reproducible). Walks that reach a sink
    (no outgoing edge) stop early.

    Returns (walk_id, step, node): step 0 is the start node.
    """
    e = edges.select(F.col(src).alias("v"), F.col(dst).alias("w"))
    # number each node's outgoing edges 0..deg-1 (deterministic order)
    from pyspark.sql.window import Window

    numbered = e.withColumn(
        "idx",
        F.row_number().over(Window.partitionBy("v").orderBy("w")) - 1,
    )
    degrees = e.groupBy("v").agg(F.count("*").alias("deg"))
    numbered = numbered.join(degrees, "v").localCheckpoint(eager=True)

    if starts is None:
        starts = e.select(F.col("v")).distinct()
    frontier = starts.select(
        F.col(starts.columns[0]).alias("walk_id"),
        F.col(starts.columns[0]).alias("node"),
    )
    out = frontier.withColumn("step", F.lit(0))
    for step in range(1, n_steps + 1):
        pick = (
            frontier.join(degrees, frontier["node"] == degrees["v"])
            .withColumn(
                "idx",
                F.pmod(
                    F.xxhash64(
                        F.lit(seed).cast("long"),
                        F.col("walk_id"),
                        F.lit(step).cast("long"),
                        F.col("node"),
                    ),
                    F.col("deg"),
                ),
            )
            .select("walk_id", "node", "idx")
        )
        stepped = (
            pick.join(
                numbered.select("v", "w", "idx"),
                (pick["node"] == numbered["v"]) & (pick["idx"] == numbered["idx"]),
            )
            .select("walk_id", F.col("w").alias("node"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(stepped.withColumn("step", F.lit(step)))
        frontier = stepped
    return out.select("walk_id", "step", "node")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank by power iteration: rank_{t+1}(v) = (1-d)/N +
    d * (sum of rank_t(u)/deg(u) over in-neighbors u + dangling mass
    redistributed uniformly).

    Each iteration is one join (edge list × current ranks) + one
    aggregation keyed on the destination, with the dangling-node mass
    folded in via a one-row broadcast — the standard distributed
    formulation. Returns (node, rank); ranks sum to ~1.

    Round 14 (guide §1.2 step 1 — remove work the loop repeats):

    * the dangling-node SET is loop-invariant, so it is computed once
      before the loop; when it is EMPTY (every node has an out-edge —
      e.g. any ring-augmented graph) the per-iteration dangling-mass
      aggregate, its broadcast build and the crossJoin are skipped
      entirely (dm ≡ 0), removing one broadcast-exchange sub-job per
      iteration. Non-empty sets keep the exact same per-iteration
      mass aggregate (now a semi-join against the precomputed set
      instead of a re-planned anti-join against deg).
    * lineage is truncated every `_CHECKPOINT_EVERY` iterations
      instead of every iteration: each eager localCheckpoint is a full
      job, and a 4-iteration join/agg plan is still trivially within
      Catalyst's analyzer budget. Results are identical — checkpoint
      placement never changes values.

    Measured on the bench's 100-node ring+chords graph (5 iters):
    2.87 → 1.67 s, ranks bit-identical (incl. a dangling-node case).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = e.groupBy("u").agg(F.count("*").alias("deg"))
    out_edges = e.join(deg, "u").localCheckpoint(eager=True)
    # NOT checkpointed: both inputs are already checkpointed flat, so
    # the anti-join plan is shallow, and the common no-dangling case
    # pays only the one emptiness probe (an eager checkpoint here
    # would be one more full job)
    dangling_nodes = nodes.join(
        out_edges.select(F.col("u").alias("node")), "node", "left_anti"
    )
    has_dangling = dangling_nodes.limit(1).count() > 0
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(n_iter):
        contribs = (
            out_edges.join(ranks, out_edges["u"] == ranks["node"])
            .select("v", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("inflow"))
        )
        inflow = F.coalesce(F.col("inflow"), F.lit(0.0))
        updated = nodes.join(contribs, nodes["node"] == contribs["v"], "left")
        if has_dangling:
            # dangling nodes (no out-edges) spread their rank uniformly
            dangling = (
                ranks.join(dangling_nodes, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            updated = updated.crossJoin(F.broadcast(dangling)).select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (inflow + F.col("dm") / F.lit(float(n)))
                ).alias("rank"),
            )
        else:
            updated = updated.select(
                "node",
                (
                    F.lit((1.0 - damping) / n) + F.lit(damping) * inflow
                ).alias("rank"),
            )
        if (it + 1) % _CHECKPOINT_EVERY == 0 and it != n_iter - 1:
            updated = updated.localCheckpoint(eager=True)
        ranks = updated
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global + per-node triangle counts via the node-iterator join.

    Edges are undirected: each is canonicalized to (lo, hi) and
    deduplicated, so the input may carry either or both directions.
    Triangles = wedge join (two edges sharing `lo`) matched against the
    closing edge — two equi-joins on bounded keys, the standard
    distributed formulation (no adjacency lists on the driver). At
    scale the wedge explosion is bounded per node by degree^2; skewed
    hub nodes are exactly what AQE's skew-join handling splits.

    Returns (node, n_triangles) for nodes in >=1 triangle; the global
    count is sum(n_triangles) / 3.
    """
    e = (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    # wedges centered at a: (a, b1, b2) with b1 < b2 (both neighbors of a)
    left = e.select(F.col("a"), F.col("b").alias("b1"))
    right = e.select(F.col("a"), F.col("b").alias("b2"))
    wedges = left.join(right, "a").where(F.col("b1") < F.col("b2"))
    closing = e.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    tris = wedges.join(closing, ["b1", "b2"])
    per_node = (
        tris.select(F.explode(F.array("a", "b1", "b2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node
