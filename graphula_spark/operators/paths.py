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


#: edge count under which iterative path operators collapse to one
#: driver-side semi-naive fold over a bounded collect: the distributed
#: loop pays 2 joins × O(path length) rounds × the per-job floor —
#: seconds of fixed latency to close graphs Python folds in
#: milliseconds (the cluster.py CC fast-path argument). Inputs past
#: the gate — the 100 TB regime, e.g. the 6M-pair relation in the
#: OWL-delta probe — keep the distributed loop unchanged. The gate is
#: one count on an already-checkpointed frame.
PATH_DRIVER_MAX_EDGES = 20_000
#: densities where even a small edge set explodes quadratically fall
#: back to the distributed loop mid-fold
PATH_DRIVER_MAX_PAIRS = 2_000_000


def prepare_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct + eagerly checkpointed (src, dst) edge frame — the
    shared preparation both iterative path operators run on entry.
    Callers driving SEVERAL path operators over the same edge set
    (closure + seeded reachability is the common pair) prepare once
    and pass ``prepared=True`` so the distinct shuffle + checkpoint
    job run once instead of per operator (round 14)."""
    return (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def _bounded_rows(base: DataFrame):
    """ONE probe job replacing the former count() + collect() pair:
    collect at most PATH_DRIVER_MAX_EDGES+1 rows; a full result means
    the frame is over the driver-path gate (round 14 — each extra job
    on the checkpointed base costs a full local job floor)."""
    rows = base.limit(PATH_DRIVER_MAX_EDGES + 1).collect()
    return rows if len(rows) <= PATH_DRIVER_MAX_EDGES else None


def _driver_closure(spark, rows):
    """Driver-side transitive closure over BOUNDED collected edge rows;
    None if the closure outgrows PATH_DRIVER_MAX_PAIRS mid-fold."""
    succ: dict = {}
    for r in rows:
        succ.setdefault(r["src"], set()).add(r["dst"])
    reached = {a: set(bs) for a, bs in succ.items()}
    frontier = {a: set(bs) for a, bs in succ.items()}
    total = sum(len(v) for v in reached.values())
    while frontier:
        nf: dict = {}
        for a, bs in frontier.items():
            step: set = set()
            for b in bs:
                step |= succ.get(b, set())
            fresh = step - reached[a]
            if fresh:
                reached[a] |= fresh
                nf[a] = fresh
                total += len(fresh)
                if total > PATH_DRIVER_MAX_PAIRS:
                    return None
        frontier = nf
    import pandas as pd

    # NO persist: the frame's data lives on the driver (Arrow local
    # relation) — recomputation is a local copy, and the persist's
    # materialization job would cost more than every re-read
    pairs = [(a, b) for a, bs in reached.items() for b in bs]
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    prepared: bool = False,
) -> DataFrame:
    """All pairs (src, dst) connected by a path of >= 1 edges.

    ``prepared=True`` asserts `edges` already came through
    `prepare_edges` (distinct (src, dst) columns, checkpointed) and
    skips the re-preparation shuffle + checkpoint job."""
    # localCheckpoint (not persist) per round: the semi-naive loop's
    # logical plan otherwise grows with every iteration and Catalyst
    # re-analyzes the whole history each round (see cluster.py)
    base = edges if prepared else prepare_edges(edges, src, dst)
    rows = _bounded_rows(base)
    if rows is not None:
        if not rows:
            return base
        out = _driver_closure(edges.sparkSession, rows)
        if out is not None:
            return out
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


def _driver_reach(spark, rows, seeds: DataFrame):
    """Driver-side BFS over BOUNDED collected edge rows; None when the
    seed set is itself unbounded, the result explodes, or no seed
    reaches anything (the distributed loop handles the empty case
    lazily)."""
    seed_rows = seeds.limit(PATH_DRIVER_MAX_EDGES + 1).collect()
    if len(seed_rows) > PATH_DRIVER_MAX_EDGES:
        return None
    succ: dict = {}
    for r in rows:
        succ.setdefault(r["src"], set()).add(r["dst"])
    total = 0
    pairs = []
    for sr in seed_rows:
        start = sr["start"]
        reached: set = set()
        frontier = set(succ.get(start, ()))
        while frontier:
            reached |= frontier
            total += len(frontier)
            if total > PATH_DRIVER_MAX_PAIRS:
                return None
            nxt: set = set()
            for n in frontier:
                nxt |= succ.get(n, set())
            frontier = nxt - reached
        pairs.extend((start, n) for n in reached)
    if not pairs:
        return None
    import pandas as pd

    # NO persist — driver-local Arrow relation, see _driver_closure
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["start", "node"]))


def reachable_from(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    prepared: bool = False,
) -> DataFrame:
    """BFS from a seed set: distinct nodes reachable in >= 1 hops.
    Returns (start, node).

    ``prepared=True`` asserts `edges` already came through
    `prepare_edges` (distinct (src, dst) columns, checkpointed) and
    skips the re-preparation shuffle + checkpoint job."""
    base = edges if prepared else prepare_edges(edges, src, dst)
    seeds = sources.select(F.col(sources.columns[0]).alias("start"))
    rows = _bounded_rows(base)
    if rows is not None:
        out = _driver_reach(edges.sparkSession, rows, seeds)
        if out is not None:
            return out
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
