"""Connected components + dedup clustering over near-duplicate pairs.

A 100 TB dedup pipeline doesn't stop at emitting near-dup PAIRS (see
operators/dedup.py): transitively-linked documents must collapse into
one cluster, and exactly one representative per cluster survives.
Pair-only dedup either over-deletes (drop both ends) or under-deletes
(keep one end of every pair, so a chain A-B-C keeps A and C).

Reference parity: the reference has no dedup at all — this family is a
driver-mandated extension (BASELINE.json). The algorithm is min-label
propagation with pointer-jumping, the DataFrame analogue of the
MapReduce CC algorithms in Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC'14).

Scale notes:
- Each round is two shuffle joins on the node id — no all-pairs stage,
  no driver-side graph. Memory is bounded by |V| labels + |E| edges.
- Plain propagation needs O(diameter) rounds; the pointer-jumping step
  (label := label of label) halves the remaining diameter per round,
  giving O(log d) convergence — near-dup graphs have tiny components,
  so 2-4 rounds in practice.
- Labels are the MIN node id reachable, so cluster ids are
  deterministic and oracle-reproducible (a recursive CTE computes the
  same min-reachable fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: edge count under which the component computation collapses to a
#: driver-side union-find over one bounded collect. The distributed
#: min-label loop pays ~2 shuffle joins × O(log d) rounds × the
#:  per-job floor — at toy scale that is SECONDS of fixed cost to
#: label a graph Python folds in milliseconds. 100 TB inputs (edges
#: past the gate) keep the distributed loop; the gate is one count on
#: an already-checkpointed frame. Labels return through ONE Arrow
#: createDataFrame (a single Python-worker task, off every hot path).
CC_DRIVER_MAX_EDGES = 200_000


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster) for every node incident to an edge; cluster is
    the minimum node id in the component.

    Min-label propagation needs only an ORDERING on node ids, so any
    orderable id type works (string doc ids included — ADVICE r9).
    Integral ids are normalized to long (the historical contract:
    callers join the labels back against long keys); other types pass
    through natively."""
    integral = {"tinyint", "smallint", "int", "bigint"}
    dt = dict(edges.dtypes)
    sc = F.col(src).cast("long") if dt.get(src) in integral else F.col(src)
    dc = F.col(dst).cast("long") if dt.get(dst) in integral else F.col(dst)
    e = edges.select(sc.alias("a"), dc.alias("b")).where(
        F.col("a") != F.col("b")
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # localCheckpoint (not persist): an iterative loop must TRUNCATE the
    # logical plan each round, or Catalyst re-analyzes a tree that grows
    # with every iteration times the (possibly huge) upstream lineage —
    # caching alone only short-circuits execution, not analysis.
    # Trade-off: checkpointed blocks are not recomputable, so executor
    # loss mid-job fails the query instead of recomputing; on a cluster
    # with preemptible executors set spark.checkpoint.dir and swap in
    # reliable .checkpoint() here. Superseded rounds' blocks are freed
    # by the ContextCleaner once unreferenced.
    sym = sym.localCheckpoint(eager=True)

    if sym.count() <= 2 * CC_DRIVER_MAX_EDGES:  # sym carries both directions
        return _driver_union_find(edges.sparkSession, sym)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # propagate: candidate label = min over neighbours' labels
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # pointer-jump: label := label's label (halves remaining depth)
        lref = prop.select(
            F.col("node").alias("ref_node"), F.col("label").alias("ref_label")
        )
        jumped = (
            prop.join(lref, prop["label"] == lref["ref_node"], "left")
            .select(
                "node",
                F.coalesce(F.col("ref_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster"))


def _driver_union_find(spark, sym: DataFrame) -> DataFrame:
    """Exact (node, cluster) labels of a BOUNDED symmetric edge frame
    via one collect + path-compressed union-find — the small-graph
    fast path of `connected_components` (gate: CC_DRIVER_MAX_EDGES).
    Cluster = min node id in the component, identical to the
    distributed loop's labels."""
    rows = sym.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r["a"], r["b"]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id keeps the root the component minimum
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    labels = [(n, find(n)) for n in parent]
    if not labels:
        return sym.select(
            F.col("a").alias("node"), F.col("b").alias("cluster")
        ).limit(0)
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(labels, columns=["node", "cluster"])
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Collapse near-dup pairs into clusters over the full corpus.

    Returns one row per input document:
      (id_col, cluster_id, cluster_size, keep)
    cluster_id = min doc id in the component (singletons: own id);
    keep = this doc is the cluster's canonical representative.
    """
    comp = connected_components(pairs, src=id_a, dst=id_b)
    ids = df.select(F.col(id_col).cast("long").alias("doc"))
    assigned = ids.join(comp, ids["doc"] == comp["node"], "left").select(
        F.col("doc"),
        F.coalesce(F.col("cluster"), F.col("doc")).alias("cluster_id"),
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        assigned.join(sizes, "cluster_id")
        .select(
            F.col("doc").alias(id_col),
            "cluster_id",
            "cluster_size",
            (F.col("doc") == F.col("cluster_id")).alias("keep"),
        )
    )
