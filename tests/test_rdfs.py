"""RDFS materialization vs an independent plain-Python fixpoint."""

import pytest
from pyspark.sql import functions as F

from graphula_spark import Graph
from graphula_spark.operators.rdfs import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
)


def _py_rdfs_closure(triples: set[tuple]) -> set[tuple]:
    """Naive rule-at-a-time fixpoint over string triples — the
    textbook formulation, used only as the oracle."""
    out = set(triples)
    changed = True
    while changed:
        changed = False
        new = set()
        sp = {(s, o) for s, p, o in out if p == RDFS_SUBPROP}
        sc = {(s, o) for s, p, o in out if p == RDFS_SUBCLASS}
        dom = {(s, o) for s, p, o in out if p == RDFS_DOMAIN}
        rng = {(s, o) for s, p, o in out if p == RDFS_RANGE}
        for a, b in sp:
            for c, d in sp:
                if b == c:
                    new.add((a, RDFS_SUBPROP, d))
        for a, b in sc:
            for c, d in sc:
                if b == c:
                    new.add((a, RDFS_SUBCLASS, d))
        for s, p, o in out:
            for a, b in sp:
                if p == a:
                    new.add((s, b, o))
            for a, c in dom:
                if p == a:
                    new.add((s, RDF_TYPE, c))
            for a, c in rng:
                if p == a:
                    new.add((o, RDF_TYPE, c))
            if p == RDF_TYPE:
                for a, b in sc:
                    if o == a:
                        new.add((s, RDF_TYPE, b))
        if not new <= out:
            out |= new
            changed = True
    return out


ONTOLOGY = [
    ("ex:Professor", RDFS_SUBCLASS, "ex:Faculty"),
    ("ex:Faculty", RDFS_SUBCLASS, "ex:Person"),
    ("ex:Person", RDFS_SUBCLASS, "ex:Agent"),
    ("ex:headOf", RDFS_SUBPROP, "ex:worksFor"),
    ("ex:worksFor", RDFS_SUBPROP, "ex:memberOf"),
    ("ex:teacherOf", RDFS_DOMAIN, "ex:Faculty"),
    ("ex:teacherOf", RDFS_RANGE, "ex:Course"),
    ("ex:headOf", RDFS_DOMAIN, "ex:Professor"),
]

DATA = [
    ("ex:alice", RDF_TYPE, "ex:Professor"),
    ("ex:alice", "ex:headOf", "ex:dept1"),
    ("ex:bob", "ex:teacherOf", "ex:cs101"),
    ("ex:carol", "ex:worksFor", "ex:dept2"),
]


@pytest.fixture(scope="module")
def closed(spark):
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(ONTOLOGY + DATA, ["s", "p", "o"])
    )
    mg = g.materialize_rdfs()
    got = {
        (r.s, r.p, r.o)
        for r in mg.decode(mg.triples.select("s", "p", "o"), ["s", "p", "o"]).collect()
    }
    return mg, got


def test_matches_python_fixpoint(closed):
    _, got = closed
    assert got == _py_rdfs_closure(set(ONTOLOGY + DATA))


def test_expected_inferences_present(closed):
    _, got = closed
    # class chain: alice is Professor -> Faculty -> Person -> Agent
    for c in ("ex:Faculty", "ex:Person", "ex:Agent"):
        assert ("ex:alice", RDF_TYPE, c) in got
    # property chain: headOf -> worksFor -> memberOf
    assert ("ex:alice", "ex:worksFor", "ex:dept1") in got
    assert ("ex:alice", "ex:memberOf", "ex:dept1") in got
    assert ("ex:carol", "ex:memberOf", "ex:dept2") in got
    # domain/range through the data
    assert ("ex:bob", RDF_TYPE, "ex:Faculty") in got
    assert ("ex:cs101", RDF_TYPE, "ex:Course") in got
    # domain attached to the SUB-property still fires
    assert ("ex:alice", RDF_TYPE, "ex:Professor") in got
    # and bob climbs the class chain from the domain-derived type
    assert ("ex:bob", RDF_TYPE, "ex:Person") in got


def test_idempotent(spark, closed):
    mg, got = closed
    again = mg.materialize_rdfs()
    n1 = mg.triples.count()
    assert again.triples.count() == n1  # closure of a closure adds nothing


def test_no_schema_is_identity(spark):
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(DATA, ["s", "p", "o"])
    )
    assert g.materialize_rdfs() is g


def test_queries_over_materialized_graph(spark, closed):
    """The point of the exercise: a BGP over an inferred type works."""
    mg, _ = closed
    rows = mg.sparql(
        "SELECT ?x WHERE { ?x "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <ex:Person> }"
    ).collect()
    assert sorted(r.x for r in rows) == ["ex:alice", "ex:bob"]


def test_domain_rule_without_any_asserted_type(spark):
    """Data with zero rdf:type triples still gains types from domain/
    range rules (the type term enters the dictionary on demand)."""
    rows = [
        ("ex:teacherOf", RDFS_DOMAIN, "ex:Faculty"),
        ("ex:bob", "ex:teacherOf", "ex:cs101"),
    ]
    g = Graph.from_string_triples(spark, spark.createDataFrame(rows, ["s", "p", "o"]))
    mg = g.materialize_rdfs()
    got = {
        (r.s, r.p, r.o)
        for r in mg.decode(mg.triples.select("s", "p", "o"), ["s", "p", "o"]).collect()
    }
    assert ("ex:bob", RDF_TYPE, "ex:Faculty") in got
    assert got == _py_rdfs_closure(set(rows))


def test_random_graphs_match_fixpoint(spark):
    """Randomized schema+data graphs agree with the naive fixpoint."""
    import random

    rnd = random.Random(11)
    classes = [f"ex:C{i}" for i in range(6)]
    props = [f"ex:p{i}" for i in range(5)]
    nodes = [f"ex:n{i}" for i in range(8)]
    for trial in range(5):
        triples = set()
        for _ in range(4):
            a, b = rnd.sample(classes, 2)
            triples.add((a, RDFS_SUBCLASS, b))
        for _ in range(3):
            a, b = rnd.sample(props, 2)
            triples.add((a, RDFS_SUBPROP, b))
        for _ in range(2):
            triples.add((rnd.choice(props), RDFS_DOMAIN, rnd.choice(classes)))
            triples.add((rnd.choice(props), RDFS_RANGE, rnd.choice(classes)))
        for _ in range(10):
            triples.add((rnd.choice(nodes), rnd.choice(props), rnd.choice(nodes)))
            triples.add((rnd.choice(nodes), RDF_TYPE, rnd.choice(classes)))
        g = Graph.from_string_triples(
            spark, spark.createDataFrame(sorted(triples), ["s", "p", "o"])
        )
        mg = g.materialize_rdfs()
        got = {
            (r.s, r.p, r.o)
            for r in mg.decode(
                mg.triples.select("s", "p", "o"), ["s", "p", "o"]
            ).collect()
        }
        assert got == _py_rdfs_closure(triples), f"trial {trial}"


def test_derive_rdfs_invariant_on_random_graphs(spark):
    """The public `derive_rdfs` contract, asserted directly (VERDICT
    r7 What's-wrong #2): on randomized schema+data graphs,
    `materialize(g).triples == g.triples ∪ derive_rdfs(g)` row-exact,
    the derived frame is disjoint from the asserted triples, and it
    carries no duplicate rows."""
    import random

    from graphula_spark.operators.rdfs import derive_rdfs

    rnd = random.Random(29)
    classes = [f"ex:C{i}" for i in range(6)]
    props = [f"ex:p{i}" for i in range(5)]
    nodes = [f"ex:n{i}" for i in range(8)]
    for trial in range(3):
        triples = set()
        for _ in range(4):
            a, b = rnd.sample(classes, 2)
            triples.add((a, RDFS_SUBCLASS, b))
        for _ in range(3):
            a, b = rnd.sample(props, 2)
            triples.add((a, RDFS_SUBPROP, b))
        for _ in range(2):
            triples.add((rnd.choice(props), RDFS_DOMAIN, rnd.choice(classes)))
            triples.add((rnd.choice(props), RDFS_RANGE, rnd.choice(classes)))
        for _ in range(10):
            triples.add((rnd.choice(nodes), rnd.choice(props), rnd.choice(nodes)))
            triples.add((rnd.choice(nodes), RDF_TYPE, rnd.choice(classes)))
        g = Graph.from_string_triples(
            spark, spark.createDataFrame(sorted(triples), ["s", "p", "o"])
        )
        derived = derive_rdfs(g)
        assert derived.columns == ["s", "p", "o"]
        d_rows = [tuple(r) for r in derived.collect()]
        d_set = set(d_rows)
        assert len(d_rows) == len(d_set), f"trial {trial}: duplicate rows"
        asserted = {
            tuple(r) for r in g.triples.select("s", "p", "o").collect()
        }
        assert not (asserted & d_set), f"trial {trial}: not derived-only"
        closed = {
            tuple(r)
            for r in g.materialize_rdfs()
            .triples.select("s", "p", "o")
            .collect()
        }
        assert closed == asserted | d_set, f"trial {trial}"


def test_derive_rdfs_empty_on_schema_free_graph(spark):
    """No schema loaded -> an EMPTY (s, p, o) frame with the id
    schema, not None and not an error."""
    from graphula_spark.operators.rdfs import derive_rdfs

    g = Graph.from_string_triples(
        spark, spark.createDataFrame(DATA, ["s", "p", "o"])
    )
    d = derive_rdfs(g)
    assert d.columns == ["s", "p", "o"]
    assert [f.dataType.simpleString() for f in d.schema.fields] == [
        "bigint",
        "bigint",
        "bigint",
    ]
    assert d.count() == 0


def test_derive_rdfs_dedups_overlapping_rules_and_excludes_asserted(spark):
    """Two rule families deriving the SAME triple yield one row; a
    derivation the graph already asserts is excluded entirely."""
    from graphula_spark.operators.rdfs import derive_rdfs

    rows = [
        ("ex:p", RDFS_DOMAIN, "ex:C"),
        ("ex:p", RDFS_RANGE, "ex:C"),
        ("ex:n", "ex:p", "ex:n"),  # domain AND range both derive (n type C)
    ]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    )
    assert derive_rdfs(g).count() == 1
    # now assert the would-be derivation up front: nothing left to add
    rows2 = rows + [("ex:n", RDF_TYPE, "ex:C")]
    g2 = Graph.from_string_triples(
        spark, spark.createDataFrame(rows2, ["s", "p", "o"])
    )
    assert derive_rdfs(g2).count() == 0
    assert g2.materialize_rdfs().triples.count() == g2.triples.count()


def test_small_derivation_plan_broadcasts_never_shuffles_corpus(spark):
    """The round-8 gate, plan-asserted: below BROADCAST_DERIVED_MAX_ROWS
    the corpus-overlap semi/anti pair must plan as BroadcastHashJoin
    (probed at 20M triples: 10 MB vs 359 MB shuffled, tools/probe_r8.py)
    — a SortMergeJoin here means the corpus map side shuffle-writes
    before AQE can convert anything."""
    from graphula_spark.operators.rdfs import derive_rdfs

    g = Graph.from_string_triples(
        spark, spark.createDataFrame(ONTOLOGY + DATA, ["s", "p", "o"])
    )
    plan = (
        derive_rdfs(g)._jdf.queryExecution().executedPlan().toString()
    )
    semi_anti = [
        ln
        for ln in plan.splitlines()
        if ("LeftSemi" in ln or "LeftAnti" in ln) and "Join" in ln
    ]
    assert semi_anti, plan
    for ln in semi_anti:
        assert "BroadcastHashJoin" in ln, ln


def test_insert_batch_plan_broadcasts_never_shuffles_corpus(spark):
    """Same gate on the O2/O3 insert path: a small batch's overlap
    removal must broadcast the batch, not sort-merge the corpus
    (probed: 0.6 MB vs 349 MB for a 10k insert at 20M triples)."""
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(DATA, ["s", "p", "o"])
    )
    g2 = g.add_string_triples(
        spark.createDataFrame(
            [("ex:new", "ex:likes", "ex:alice")], ["s", "p", "o"]
        )
    )
    plan = g2.triples._jdf.queryExecution().executedPlan().toString()
    semi_anti = [
        ln
        for ln in plan.splitlines()
        if ("LeftSemi" in ln or "LeftAnti" in ln) and "Join" in ln
    ]
    assert semi_anti, plan
    for ln in semi_anti:
        assert "BroadcastHashJoin" in ln, ln


def test_insert_large_batch_fallback_same_result(spark, monkeypatch):
    """Above INSERT_BROADCAST_MAX_ROWS the insert takes the shuffle
    anti-join branch; both branches must produce the identical
    set-semantics snapshot (dedup within batch + against corpus)."""
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(DATA, ["s", "p", "o"])
    )
    batch = spark.createDataFrame(
        [
            ("ex:new", "ex:likes", "ex:alice"),
            ("ex:new", "ex:likes", "ex:alice"),  # intra-batch dup
            ("ex:alice", RDF_TYPE, "ex:Professor"),  # already asserted
        ],
        ["s", "p", "o"],
    )

    def snapshot(graph):
        return {
            (r.s, r.p, r.o)
            for r in graph.decode(
                graph.triples.select("s", "p", "o"), ["s", "p", "o"]
            ).collect()
        }

    broadcast_path = snapshot(g.add_string_triples(batch))
    monkeypatch.setattr(Graph, "INSERT_BROADCAST_MAX_ROWS", 0)
    shuffle_path = snapshot(g.add_string_triples(batch))
    want = set(DATA) | {("ex:new", "ex:likes", "ex:alice")}
    assert broadcast_path == shuffle_path == want


def _snapshot(graph):
    return {
        (r.s, r.p, r.o)
        for r in graph.decode(
            graph.triples.select("s", "p", "o"), ["s", "p", "o"]
        ).collect()
    }


@pytest.mark.slowtail


def test_incremental_materialize_equals_full_on_random_batches(spark):
    """`add_materialized_rdfs` (delta maintenance) must produce the
    SAME closure as a full re-materialization of the extended graph,
    on randomized closed corpora and schema-free random batches —
    sound because every ρdf rule has exactly one data atom."""
    import random

    rnd = random.Random(47)
    classes = [f"ex:C{i}" for i in range(6)]
    props = [f"ex:p{i}" for i in range(4)]
    nodes = [f"ex:n{i}" for i in range(8)]
    for trial in range(3):
        base = set()
        for _ in range(4):
            a, b = rnd.sample(classes, 2)
            base.add((a, RDFS_SUBCLASS, b))
        for _ in range(2):
            a, b = rnd.sample(props, 2)
            base.add((a, RDFS_SUBPROP, b))
            base.add((rnd.choice(props), RDFS_DOMAIN, rnd.choice(classes)))
            base.add((rnd.choice(props), RDFS_RANGE, rnd.choice(classes)))
        for _ in range(8):
            base.add((rnd.choice(nodes), rnd.choice(props), rnd.choice(nodes)))
            base.add((rnd.choice(nodes), RDF_TYPE, rnd.choice(classes)))
        closed = Graph.from_string_triples(
            spark, spark.createDataFrame(sorted(base), ["s", "p", "o"])
        ).materialize_rdfs()
        batch = sorted(
            {
                (rnd.choice(nodes + ["ex:fresh1", "ex:fresh2"]),
                 rnd.choice(props),
                 rnd.choice(nodes))
                for _ in range(4)
            }
            | {("ex:fresh1", RDF_TYPE, rnd.choice(classes))}
        )
        batch_df = spark.createDataFrame(batch, ["s", "p", "o"])
        incremental = closed.add_materialized_rdfs(batch_df)
        full = closed.add_string_triples(batch_df).materialize_rdfs()
        assert _snapshot(incremental) == _snapshot(full), f"trial {trial}"
        # and both equal the independent Python fixpoint
        assert _snapshot(incremental) == _py_rdfs_closure(
            base | set(batch)
        ), f"trial {trial}"


@pytest.mark.slowtail


def test_incremental_materialize_schema_batch_falls_back_or_raises(spark):
    """A batch carrying a NEW subClassOf edge must trigger the full
    re-materialization (its rules fire over corpus data the delta
    never sees) — and the fallback result is the true closure;
    on_schema_change='error' raises instead."""
    import pytest as _pytest

    base = [
        ("ex:A", RDFS_SUBCLASS, "ex:B"),
        ("ex:x", RDF_TYPE, "ex:A"),
        ("ex:y", RDF_TYPE, "ex:B"),
    ]
    closed = Graph.from_string_triples(
        spark, spark.createDataFrame(base, ["s", "p", "o"])
    ).materialize_rdfs()
    batch = spark.createDataFrame(
        [("ex:B", RDFS_SUBCLASS, "ex:C")], ["s", "p", "o"]
    )
    out = closed.add_materialized_rdfs(batch)
    got = _snapshot(out)
    # the new schema edge retypes CORPUS individuals x and y
    assert ("ex:x", RDF_TYPE, "ex:C") in got
    assert ("ex:y", RDF_TYPE, "ex:C") in got
    assert got == _py_rdfs_closure(
        set(base) | {("ex:B", RDFS_SUBCLASS, "ex:C")}
    )
    with _pytest.raises(ValueError, match="schema"):
        closed.add_materialized_rdfs(batch, on_schema_change="error")


def test_derive_rdfs_delta_is_batch_bounded_and_disjoint(spark):
    """The delta primitive directly: derivations come only from the
    batch's consequences, disjoint from graph ∪ batch."""
    from graphula_spark.operators.rdfs import derive_rdfs_delta

    base = [
        ("ex:Prof", RDFS_SUBCLASS, "ex:Person"),
        ("ex:teaches", RDFS_DOMAIN, "ex:Prof"),
        ("ex:ann", RDF_TYPE, "ex:Prof"),
    ]
    closed = Graph.from_string_triples(
        spark, spark.createDataFrame(base, ["s", "p", "o"])
    ).materialize_rdfs()
    # batch: bob teaches a course -> bob is Prof -> bob is Person
    enc = spark.createDataFrame(
        [("ex:bob", "ex:teaches", "ex:cs1")], ["s", "p", "o"]
    )
    g2 = closed.add_string_triples(enc)
    batch = enc
    for c in ("s", "p", "o"):
        batch = g2.dictionary.encode_col(batch, c, f"{c}_id")
    batch = batch.select(
        F.col("s_id").alias("s"),
        F.col("p_id").alias("p"),
        F.col("o_id").alias("o"),
    )
    delta = derive_rdfs_delta(g2, batch)
    decoded = {
        (r.s, r.p, r.o)
        for r in g2.decode(delta, ["s", "p", "o"]).collect()
    }
    assert decoded == {
        ("ex:bob", RDF_TYPE, "ex:Prof"),
        ("ex:bob", RDF_TYPE, "ex:Person"),
    }


def test_owl_constructs(spark):
    from graphula_spark.operators.rdfs import (
        OWL_INVERSE,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
    )

    rows = [
        ("ex:degreeFrom", OWL_INVERSE, "ex:hasAlumnus"),
        ("ex:subOrg", RDF_TYPE, OWL_TRANSITIVE),
        ("ex:colleague", RDF_TYPE, OWL_SYMMETRIC),
        ("ex:alice", "ex:degreeFrom", "ex:uni1"),
        ("ex:dept1", "ex:subOrg", "ex:college1"),
        ("ex:college1", "ex:subOrg", "ex:uni1"),
        ("ex:bob", "ex:colleague", "ex:carol"),
        # inverse feeds transitivity: uni1 hasSubOrg is NOT transitive,
        # but an inverseOf-pair on subOrg is: declare it and check the
        # inverse edges close transitively too
        ("ex:subOrg", OWL_INVERSE, "ex:hasSubOrg"),
        ("ex:hasSubOrg", RDF_TYPE, OWL_TRANSITIVE),
    ]
    g = Graph.from_string_triples(spark, spark.createDataFrame(rows, ["s", "p", "o"]))
    mg = g.materialize_rdfs(owl=True)
    got = {
        (r.s, r.p, r.o)
        for r in mg.decode(mg.triples.select("s", "p", "o"), ["s", "p", "o"]).collect()
    }
    assert ("ex:uni1", "ex:hasAlumnus", "ex:alice") in got  # inverseOf
    assert ("ex:carol", "ex:colleague", "ex:bob") in got  # symmetric
    assert ("ex:dept1", "ex:subOrg", "ex:uni1") in got  # transitive
    assert ("ex:college1", "ex:hasSubOrg", "ex:dept1") in got  # inverse edge
    assert ("ex:uni1", "ex:hasSubOrg", "ex:dept1") in got  # inverse + transitive
    # fixed point: a second owl pass adds nothing
    assert mg.materialize_rdfs(owl=True).triples.count() == mg.triples.count()


@pytest.mark.slowtail


def test_reduce_is_inverse_of_materialize_on_lubm_subset(spark):
    """Strip the derivable triples from 3 files of the reference's
    pre-materialized LUBM data, reconstruct with the OWL closure, and
    demand set equality with the original — plus equivalence-cycle
    types (owl:equivalentClass as mutual subClassOf) must survive the
    reduction."""
    import glob

    paths = sorted(glob.glob("/root/reference/benchmarks/data/university0_*.nt"))[:3]
    if not paths:
        pytest.skip("reference LUBM data not present")
    # the shipped subset is NOT itself a fixed point (the generator
    # omitted universal-class types), so the round-trip law is stated
    # on the closure: materialize(reduce(closure(G))) == closure(G)
    g = Graph.from_ntriples(spark, paths).materialize_rdfs(owl=True)
    base = g.reduce_rdfs(owl=True)
    n_full, n_base = g.triples.count(), base.triples.count()
    assert n_base < 0.6 * n_full  # a large derivable fraction strips
    rebuilt = base.materialize_rdfs(owl=True)
    missing = g.triples.join(
        rebuilt.triples.select("s", "p", "o"), ["s", "p", "o"], "left_anti"
    ).count()
    extra = rebuilt.triples.select("s", "p", "o").join(
        g.triples, ["s", "p", "o"], "left_anti"
    ).count()
    assert missing == 0 and extra == 0, (missing, extra, n_full, n_base)


def test_equivalence_cycle_types_survive_reduction(spark):
    rows = [
        ("ex:Chair", RDFS_SUBCLASS, "ex:Restriction1"),
        ("ex:Restriction1", RDFS_SUBCLASS, "ex:Chair"),  # equivalence cycle
        ("ex:alice", RDF_TYPE, "ex:Chair"),
        ("ex:alice", RDF_TYPE, "ex:Restriction1"),
    ]
    g = Graph.from_string_triples(spark, spark.createDataFrame(rows, ["s", "p", "o"]))
    base = g.reduce_rdfs()
    rebuilt = base.materialize_rdfs(owl=True)
    got = {
        (r.s, r.p, r.o)
        for r in rebuilt.decode(
            rebuilt.triples.select("s", "p", "o"), ["s", "p", "o"]
        ).collect()
    }
    assert ("ex:alice", RDF_TYPE, "ex:Chair") in got
    assert ("ex:alice", RDF_TYPE, "ex:Restriction1") in got


def test_cyclic_transitive_property_survives_reduction(spark):
    """A materialized CYCLIC transitive relation must round-trip: the
    old 2-hop rule removed every cycle edge simultaneously (all are
    2-hop decomposable in a closure), silently losing the cycle. The
    SCC-aware reduction keeps a ring per component."""
    from graphula_spark.operators.rdfs import OWL_TRANSITIVE

    rows = [
        ("ex:linked", RDF_TYPE, OWL_TRANSITIVE),
        # a 3-cycle feeding a 2-chain tail
        ("ex:a", "ex:linked", "ex:b"),
        ("ex:b", "ex:linked", "ex:c"),
        ("ex:c", "ex:linked", "ex:a"),
        ("ex:c", "ex:linked", "ex:d"),
        ("ex:d", "ex:linked", "ex:e"),
    ]
    g = Graph.from_string_triples(spark, spark.createDataFrame(rows, ["s", "p", "o"]))
    closed = g.materialize_rdfs(owl=True)
    base = closed.reduce_rdfs(owl=True)
    n_closed, n_base = closed.triples.count(), base.triples.count()
    assert n_base < n_closed  # something actually strips
    rebuilt = base.materialize_rdfs(owl=True)
    missing = closed.triples.join(
        rebuilt.triples.select("s", "p", "o"), ["s", "p", "o"], "left_anti"
    ).count()
    extra = rebuilt.triples.select("s", "p", "o").join(
        closed.triples, ["s", "p", "o"], "left_anti"
    ).count()
    assert missing == 0 and extra == 0, (missing, extra, n_closed, n_base)


def test_unclosed_cyclic_transitive_property_raises(spark):
    """Bidirectional edges WITHOUT the full closure make min-partner
    SCC labeling unsound — reduce_graph must refuse loudly instead of
    silently dropping non-derivable edges."""
    from graphula_spark.operators.rdfs import OWL_TRANSITIVE

    rows = [
        ("ex:linked", RDF_TYPE, OWL_TRANSITIVE),
        ("ex:a", "ex:linked", "ex:b"),
        ("ex:b", "ex:linked", "ex:a"),
        ("ex:b", "ex:linked", "ex:c"),
        ("ex:c", "ex:linked", "ex:b"),
        # missing: a<->c, self-loops — NOT a transitive closure
    ]
    g = Graph.from_string_triples(spark, spark.createDataFrame(rows, ["s", "p", "o"]))
    with pytest.raises(ValueError, match="not a transitive closure"):
        g.reduce_rdfs(owl=True)


def test_schema_collects_are_bounded(spark, monkeypatch):
    """A data-shaped predicate masquerading as schema must raise from
    the limit(MAX+1) guard instead of collecting everything to the
    driver first — in materialize AND in reduce_graph."""
    from graphula_spark.operators import rdfs as R

    monkeypatch.setattr(R, "MAX_SCHEMA_EDGES", 10)
    rows = [(f"ex:c{i}", RDFS_SUBCLASS, f"ex:c{i + 1}") for i in range(25)]
    g = Graph.from_string_triples(spark, spark.createDataFrame(rows, ["s", "p", "o"]))
    with pytest.raises(ValueError, match="more than 10"):
        R.materialize(g)
    with pytest.raises(ValueError, match="more than 10"):
        R.reduce_graph(g)


class TestSameAsSmushing:
    SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

    def _graph(self, spark):
        rows = [
            # two sameAs chains: {a1,a2,a3} and {b1,b2}
            ("ex:a1", self.SAMEAS, "ex:a2"),
            ("ex:a2", self.SAMEAS, "ex:a3"),
            ("ex:b1", self.SAMEAS, "ex:b2"),
            # facts spread across the aliases
            ("ex:a1", "ex:worksAt", "ex:dept"),
            ("ex:a2", RDF_TYPE, "ex:Person"),
            ("ex:a3", "ex:knows", "ex:b2"),
            ("ex:c", "ex:knows", "ex:a3"),
            ("ex:b1", RDF_TYPE, "ex:Person"),
        ]
        return Graph.from_string_triples(
            spark, spark.createDataFrame(rows, ["s", "p", "o"])
        )

    def _decoded(self, g):
        return {
            (r.s, r.p, r.o)
            for r in g.decode(
                g.triples.select("s", "p", "o"), ["s", "p", "o"]
            ).collect()
        }

    def test_facts_merge_onto_one_representative(self, spark):
        g = self._graph(spark)
        sm = g.smush_sameas()
        got = self._decoded(sm)
        # exactly one alias carries all the a-facts now
        subs = {s for (s, p, o) in got if p in ("ex:worksAt", "ex:knows") or o == "ex:Person"}
        a_reps = {s for s in subs if s.startswith("ex:a")}
        assert len(a_reps) == 1, got
        rep = a_reps.pop()
        b_rep = next(o for (s, p, o) in got if s == rep and p == "ex:knows" and o.startswith("ex:b"))
        assert (rep, "ex:worksAt", "ex:dept") in got
        assert (rep, RDF_TYPE, "ex:Person") in got
        assert ("ex:c", "ex:knows", rep) in got  # objects rewritten too
        assert (b_rep, RDF_TYPE, "ex:Person") in got
        # canonical->member links kept so original ids stay queryable
        assert sum(1 for (s, p, o) in got if p == self.SAMEAS and s == rep) == 2

    def test_pure_canonical_mode_and_idempotence(self, spark):
        g = self._graph(spark)
        sm = g.smush_sameas(keep_links=False)
        got = self._decoded(sm)
        assert not any(p == self.SAMEAS for (_, p, _) in got)
        again = sm.smush_sameas(keep_links=False)
        assert self._decoded(again) == got

    def test_no_sameas_is_identity(self, spark):
        g = Graph.from_string_triples(
            spark,
            spark.createDataFrame([("ex:x", "ex:p", "ex:y")], ["s", "p", "o"]),
        )
        assert g.smush_sameas() is g


# ---------------------------------------------------------------------
# incremental OWL maintenance (VERDICT r8 #1)
# ---------------------------------------------------------------------

def _owl_ns():
    from graphula_spark.operators.rdfs import (
        OWL_INVERSE,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
    )

    return OWL_INVERSE, OWL_SYMMETRIC, OWL_TRANSITIVE


def test_incremental_owl_bridging_edge_closes_through_corpus(spark):
    """The case plain batch-input rules CANNOT derive: a single new
    edge bridges two already-closed corpus chains, and every cross
    pair (corpus-node -> corpus-node THROUGH the new edge) must
    appear — including pairs needing TWO new edges separated by a
    corpus segment (the T+ chaining case)."""
    OWL_INVERSE, _S, OWL_TRANSITIVE = _owl_ns()
    rows = [
        ("ex:part", RDF_TYPE, OWL_TRANSITIVE),
        ("ex:a", "ex:part", "ex:b"),
        ("ex:b", "ex:part", "ex:c"),
        ("ex:x", "ex:part", "ex:y"),
        ("ex:y", "ex:part", "ex:z"),
    ]
    closed = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    ).materialize_rdfs(owl=True)
    # two new edges: c->x bridges the chains; z->w extends the far end.
    # a->w needs (corpus a->c) (new c->x) (corpus x->z) (new z->w).
    batch = spark.createDataFrame(
        [("ex:c", "ex:part", "ex:x"), ("ex:z", "ex:part", "ex:w")],
        ["s", "p", "o"],
    )
    inc = closed.add_materialized_rdfs(batch, owl=True)
    full = closed.add_string_triples(batch).materialize_rdfs(owl=True)
    got, want = _snapshot(inc), _snapshot(full)
    assert ("ex:a", "ex:part", "ex:w") in got
    assert ("ex:b", "ex:part", "ex:z") in got
    assert got == want


@pytest.mark.slowtail


def test_incremental_owl_equals_full_on_random_batches(spark):
    """add_materialized_rdfs(owl=True) == full materialize_owl of the
    extended graph, row-exact, on randomized corpora mixing all three
    OWL constructs with the ρdf schema (the VERDICT r8 #1 gate)."""
    import random

    OWL_INVERSE, OWL_SYMMETRIC, OWL_TRANSITIVE = _owl_ns()
    rnd = random.Random(83)
    classes = [f"ex:C{i}" for i in range(4)]
    tprops = ["ex:t0", "ex:t1"]
    oprops = ["ex:q0", "ex:q1"]
    nodes = [f"ex:n{i}" for i in range(8)]
    for trial in range(3):
        base = {
            ("ex:t0", RDF_TYPE, OWL_TRANSITIVE),
            ("ex:t1", RDF_TYPE, OWL_TRANSITIVE),
            ("ex:q0", RDF_TYPE, OWL_SYMMETRIC),
            ("ex:q1", OWL_INVERSE, "ex:t0"),  # inverse feeds transitive
            ("ex:t1", RDFS_SUBPROP, "ex:q0"),  # rdfs feeds symmetric
            ("ex:t0", RDFS_DOMAIN, rnd.choice(classes)),
            (rnd.choice(classes), RDFS_SUBCLASS, rnd.choice(classes)),
        }
        for _ in range(8):
            base.add(
                (rnd.choice(nodes), rnd.choice(tprops + oprops),
                 rnd.choice(nodes))
            )
        closed = Graph.from_string_triples(
            spark, spark.createDataFrame(sorted(base), ["s", "p", "o"])
        ).materialize_rdfs(owl=True)
        batch = sorted(
            {
                (rnd.choice(nodes + ["ex:new1", "ex:new2"]),
                 rnd.choice(tprops + oprops),
                 rnd.choice(nodes + ["ex:new3"]))
                for _ in range(4)
            }
        )
        batch_df = spark.createDataFrame(batch, ["s", "p", "o"])
        inc = closed.add_materialized_rdfs(batch_df, owl=True)
        full = closed.add_string_triples(batch_df).materialize_rdfs(
            owl=True
        )
        assert _snapshot(inc) == _snapshot(full), f"trial {trial}"
        # idempotence: re-adding the same batch derives nothing new
        again = inc.add_materialized_rdfs(batch_df, owl=True)
        assert _snapshot(again) == _snapshot(inc), f"trial {trial}"


def test_incremental_owl_schema_batch_falls_back_or_raises(spark):
    """A batch declaring a NEW TransitiveProperty (or inverseOf pair)
    changes the rule program: the default falls back to the full
    materialize_owl (and matches it); on_schema_change='error'
    raises."""
    OWL_INVERSE, _S, OWL_TRANSITIVE = _owl_ns()
    rows = [
        ("ex:a", "ex:part", "ex:b"),
        ("ex:b", "ex:part", "ex:c"),
    ]
    closed = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    ).materialize_rdfs(owl=True)
    batch = spark.createDataFrame(
        [("ex:part", RDF_TYPE, OWL_TRANSITIVE)], ["s", "p", "o"]
    )
    out = closed.add_materialized_rdfs(batch, owl=True)
    got = _snapshot(out)
    assert ("ex:a", "ex:part", "ex:c") in got  # corpus data re-closed
    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema"):
        closed.add_materialized_rdfs(
            batch, owl=True, on_schema_change="error"
        )
    # an inverseOf assertion is OWL schema too
    inv_batch = spark.createDataFrame(
        [("ex:part", OWL_INVERSE, "ex:hasPart")], ["s", "p", "o"]
    )
    with _pytest.raises(ValueError, match="schema"):
        closed.add_materialized_rdfs(
            inv_batch, owl=True, on_schema_change="error"
        )


@pytest.mark.slowtail


def test_incremental_owl_equals_full_on_lubm_store(spark):
    """The VERDICT r8 #1 done-gate on REAL data: close one university
    file of the reference's LUBM data under the OWL pass (univ-bench
    declares owl:TransitiveProperty suborganizationOf — the construct
    that used to force the full-rematerialize fallback), ingest a
    data-only slice of a second file through the incremental path, and
    demand row-exact equality with the full re-materialization."""
    import glob

    from graphula_spark.operators.rdfs import (
        OWL_INVERSE,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
        RDFS_DOMAIN,
        RDFS_RANGE,
    )

    paths = sorted(
        glob.glob("/root/reference/benchmarks/data/university0_*.nt")
    )
    if len(paths) < 2:
        pytest.skip("reference LUBM data not present")
    from graphula_spark.sources.ntriples import read_ntriples

    closed = Graph.from_ntriples(spark, paths[:1]).materialize_rdfs(
        owl=True
    )
    # data-only slice: LUBM files carry schema inline, so strip every
    # schema-predicate row (ρdf + OWL) — the delta path's precondition
    second = read_ntriples(spark, paths[1:2])
    schema_terms = [
        RDFS_SUBCLASS,
        RDFS_SUBPROP,
        RDFS_DOMAIN,
        RDFS_RANGE,
        OWL_INVERSE,
    ]
    decl_terms = [OWL_TRANSITIVE, OWL_SYMMETRIC]
    batch = second.where(
        ~F.col("p").isin(schema_terms)
        & ~(
            (F.col("p") == RDF_TYPE) & F.col("o").isin(decl_terms)
        )
    ).limit(2000)
    batch = spark.createDataFrame(
        batch.collect(), ["s", "p", "o"]
    )  # pin the slice (limit is not deterministic across jobs)
    inc = closed.add_materialized_rdfs(batch, owl=True)
    full = closed.add_string_triples(batch).materialize_rdfs(owl=True)
    n_inc, n_full = inc.triples.count(), full.triples.count()
    missing = full.triples.select("s", "p", "o").join(
        inc.triples.select("s", "p", "o"), ["s", "p", "o"], "left_anti"
    ).count()
    extra = inc.triples.select("s", "p", "o").join(
        full.triples.select("s", "p", "o"), ["s", "p", "o"], "left_anti"
    ).count()
    assert missing == 0 and extra == 0, (missing, extra, n_inc, n_full)


@pytest.mark.slowtail


def test_dataset_reduce_rdfs_roundtrip_multigraph(spark):
    """VERDICT r8 #6: per-graph reduce_rdfs at the Dataset level.
    Two data graphs + a shared ontology graph; reduction strips the
    derivable rows from each data graph (ontology kept verbatim), and
    re-materializing each reduced graph against the ontology
    reconstructs the original closure exactly."""
    from graphula_spark.dataset import Dataset
    from graphula_spark.operators.rdfs import OWL_TRANSITIVE

    ONTO = "http://ex/onto"
    G1, G2 = "http://ex/g1", "http://ex/g2"
    quads = [
        # ontology: class chain + transitive property — PRE-CLOSED
        # (rdfs11 edge asserted) so the data-graph round-trip is exact:
        # an unclosed ontology would land its own closure in the target
        ("ex:Prof", RDFS_SUBCLASS, "ex:Faculty", ONTO),
        ("ex:Faculty", RDFS_SUBCLASS, "ex:Person", ONTO),
        ("ex:Prof", RDFS_SUBCLASS, "ex:Person", ONTO),
        ("ex:subOrg", RDF_TYPE, OWL_TRANSITIVE, ONTO),
        # g1: CLOSED data (type chain fully asserted)
        ("ex:ann", RDF_TYPE, "ex:Prof", G1),
        ("ex:ann", RDF_TYPE, "ex:Faculty", G1),
        ("ex:ann", RDF_TYPE, "ex:Person", G1),
        # g2: CLOSED transitive chain
        ("ex:d", "ex:subOrg", "ex:c", G2),
        ("ex:c", "ex:subOrg", "ex:u", G2),
        ("ex:d", "ex:subOrg", "ex:u", G2),
    ]
    ds = Dataset.from_string_quads(
        spark, spark.createDataFrame(quads, ["s", "p", "o", "g"])
    )
    red = ds.reduce_rdfs(owl=True, ontology=ONTO)
    # derivable rows stripped per graph
    assert red.graph(G1).triples.count() == 1  # only (ann type Prof)
    assert red.graph(G2).triples.count() == 2  # d->c, c->u
    # ontology verbatim
    assert red.graph(ONTO).triples.count() == 4

    def snap(d, name):
        g = d.graph(name)
        return {
            (r.s, r.p, r.o)
            for r in g.decode(
                g.triples.select("s", "p", "o"), ["s", "p", "o"]
            ).collect()
        }

    # round trip: rematerializing each reduced graph against the
    # ontology reconstructs the original (data ∪ derived lands in a
    # fresh target; compare data∪target against the original slice)
    for gname in (G1, G2):
        out = red.materialize_rdfs(ONTO, "http://ex/t", data=gname, owl=True)
        rebuilt = snap(out, gname) | snap(out, "http://ex/t")
        assert rebuilt == snap(ds, gname), gname
    # per-graph independence: g1's reduction never references g2 rows
    # (nothing cross-graph) — reduced quads stay in their graphs
    red_pairs = {
        (r["g"],)
        for r in red.quads.select("g").distinct().collect()
    }
    assert len(red_pairs) == 3


def test_delete_batch_plan_broadcasts_never_shuffles_corpus(spark):
    """The delete twin of the insert gate (round 9): a small delete
    set must broadcast into the LEFT ANTI (the corpus streams) —
    un-hinted, Catalyst cannot size the user batch and sort-merges
    the whole corpus to delete one row."""
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(DATA, ["s", "p", "o"])
    )
    g2 = g.delete_string_triples(
        spark.createDataFrame(
            [("ex:alice", RDF_TYPE, "ex:Professor")], ["s", "p", "o"]
        )
    )
    plan = g2.triples._jdf.queryExecution().executedPlan().toString()
    anti = [
        ln
        for ln in plan.splitlines()
        if "LeftAnti" in ln and "Join" in ln
    ]
    assert anti, plan
    for ln in anti:
        assert "BroadcastHashJoin" in ln, ln
    # and the row is gone, everything else kept
    assert g2.triples.count() == g.triples.count() - 1


# ---------------------------------------------------------------------
# decremental maintenance: delete_materialized_rdfs (round 9)
# ---------------------------------------------------------------------

def test_delete_materialized_rederivable_victim_survives(spark):
    """Deleting a triple that the remainder still derives is a no-op
    on the closure (set semantics: the fact is re-derived); deleting
    its last derivation source actually removes both."""
    rows = [
        ("ex:Prof", RDFS_SUBCLASS, "ex:Person"),
        ("ex:ann", RDF_TYPE, "ex:Prof"),
    ]
    closed = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    ).materialize_rdfs()
    # (ann type Person) is derived; deleting it alone re-derives it
    out = closed.delete_materialized_rdfs(
        spark.createDataFrame(
            [("ex:ann", RDF_TYPE, "ex:Person")], ["s", "p", "o"]
        )
    )
    assert _snapshot(out) == _snapshot(closed)
    # deleting the SOURCE fact removes the whole chain
    out2 = closed.delete_materialized_rdfs(
        spark.createDataFrame(
            [("ex:ann", RDF_TYPE, "ex:Prof")], ["s", "p", "o"]
        )
    )
    got = _snapshot(out2)
    assert ("ex:ann", RDF_TYPE, "ex:Prof") not in got
    assert ("ex:ann", RDF_TYPE, "ex:Person") in got  # still a member
    # ...because set semantics keep derived members; it equals the
    # full re-materialization of the remainder
    full = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [
                ("ex:Prof", RDFS_SUBCLASS, "ex:Person"),
                ("ex:ann", RDF_TYPE, "ex:Person"),
            ],
            ["s", "p", "o"],
        ),
    ).materialize_rdfs()
    assert got == _snapshot(full)


@pytest.mark.slowtail


def test_delete_materialized_equals_full_on_random_graphs(spark):
    """delete_materialized_rdfs == materialize(G ∖ V) row-exact on
    randomized closed graphs and random victim subsets — including
    schema victims (no fallback needed: the remainder keeps derived
    members and the rule program reads the remaining schema)."""
    import random

    rnd = random.Random(59)
    classes = [f"ex:C{i}" for i in range(5)]
    props = [f"ex:p{i}" for i in range(4)]
    nodes = [f"ex:n{i}" for i in range(7)]
    for trial in range(3):
        base = set()
        for _ in range(4):
            a, b = rnd.sample(classes, 2)
            base.add((a, RDFS_SUBCLASS, b))
        for _ in range(2):
            a, b = rnd.sample(props, 2)
            base.add((a, RDFS_SUBPROP, b))
            base.add((rnd.choice(props), RDFS_DOMAIN, rnd.choice(classes)))
            base.add((rnd.choice(props), RDFS_RANGE, rnd.choice(classes)))
        for _ in range(10):
            base.add((rnd.choice(nodes), rnd.choice(props), rnd.choice(nodes)))
            base.add((rnd.choice(nodes), RDF_TYPE, rnd.choice(classes)))
        closed = Graph.from_string_triples(
            spark, spark.createDataFrame(sorted(base), ["s", "p", "o"])
        ).materialize_rdfs()
        all_rows = sorted(_snapshot(closed))
        victims = rnd.sample(all_rows, min(5, len(all_rows)))
        vdf = spark.createDataFrame(victims, ["s", "p", "o"])
        inc = closed.delete_materialized_rdfs(vdf)
        remainder = [r for r in all_rows if r not in set(victims)]
        full = Graph.from_string_triples(
            spark, spark.createDataFrame(remainder, ["s", "p", "o"])
        ).materialize_rdfs()
        assert _snapshot(inc) == _snapshot(full), f"trial {trial}"


def test_delete_materialized_owl_transitive_equals_full(spark):
    """OWL mode: deleting closure pairs of a transitive relation —
    pairs with a surviving 2-step decomposition come back, pairs whose
    last path died stay gone; row-exact vs materialize_owl(G ∖ V)."""
    _I, _S, OWL_TRANSITIVE = _owl_ns()
    rows = [
        ("ex:part", RDF_TYPE, OWL_TRANSITIVE),
        ("ex:a", "ex:part", "ex:b"),
        ("ex:b", "ex:part", "ex:c"),
        ("ex:c", "ex:part", "ex:d"),
    ]
    closed = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    ).materialize_rdfs(owl=True)
    # delete the derived a->c (2-step path a->b->c survives: comes
    # back) and the base edge c->d (a->d, b->d lose their only path
    # THROUGH c->d... but a->d decomposes as a->c,c->d — also dead —
    # so they survive only if another decomposition exists)
    vic = spark.createDataFrame(
        [("ex:a", "ex:part", "ex:c"), ("ex:c", "ex:part", "ex:d")],
        ["s", "p", "o"],
    )
    inc = closed.delete_materialized_rdfs(vic, owl=True)
    all_rows = sorted(_snapshot(closed))
    remainder = [
        r
        for r in all_rows
        if r not in {("ex:a", "ex:part", "ex:c"), ("ex:c", "ex:part", "ex:d")}
    ]
    full = Graph.from_string_triples(
        spark, spark.createDataFrame(remainder, ["s", "p", "o"])
    ).materialize_rdfs(owl=True)
    got = _snapshot(inc)
    assert got == _snapshot(full)
    assert ("ex:a", "ex:part", "ex:c") in got  # rederived via a->b->c
    # a->d survives too: decomposition a->b, b->d with b->d a member
    assert ("ex:a", "ex:part", "ex:d") in got


def test_delete_materialized_owl_chained_rederivation(spark):
    """A victim whose only 2-step decomposition goes THROUGH another
    kept victim needs the keep-set fixpoint's second round: delete
    {a->c, a->d} from the closed chain a->b->c->d — a->c comes back
    via a->b,b->c (round 1), then a->d via the KEPT a->c with c->d
    (round 2; also via a->b,b->d in round 1 here, so ALSO delete b->d
    to force the chain)."""
    _I, _S, OWL_TRANSITIVE = _owl_ns()
    rows = [
        ("ex:part", RDF_TYPE, OWL_TRANSITIVE),
        ("ex:a", "ex:part", "ex:b"),
        ("ex:b", "ex:part", "ex:c"),
        ("ex:c", "ex:part", "ex:d"),
    ]
    closed = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    ).materialize_rdfs(owl=True)
    vic = [
        ("ex:a", "ex:part", "ex:c"),
        ("ex:a", "ex:part", "ex:d"),
        ("ex:b", "ex:part", "ex:d"),
    ]
    inc = closed.delete_materialized_rdfs(
        spark.createDataFrame(vic, ["s", "p", "o"]), owl=True
    )
    remainder = [r for r in sorted(_snapshot(closed)) if r not in set(vic)]
    full = Graph.from_string_triples(
        spark, spark.createDataFrame(remainder, ["s", "p", "o"])
    ).materialize_rdfs(owl=True)
    got = _snapshot(inc)
    assert got == _snapshot(full)
    # every victim is rederivable here (the base chain survives)
    for v in vic:
        assert v in got, v


def _enc_triples(g, rows_df):
    enc = rows_df
    for c in ("s", "p", "o"):
        enc = g.dictionary.encode_col(enc, c, f"{c}_id")
    return enc.select(
        F.col("s_id").alias("s"),
        F.col("p_id").alias("p"),
        F.col("o_id").alias("o"),
    )


def test_derive_rdfs_delete_raises_when_rounds_exhausted(spark):
    """ADVICE r9: a victim-dependency chain deeper than the round
    budget must RAISE (mirroring derive_owl_delta), not silently drop
    rederivable triples. Deleting every span≥2 pair of a closed
    transitive chain rederives ~doubling spans per round — 2 rounds
    cannot finish an 8-edge chain; the default budget can (and keeps
    every victim, since the base chain survives)."""
    from graphula_spark.operators import rdfs as R

    _I, _S, OWL_TRANSITIVE = _owl_ns()
    n = 8
    rows = [("ex:part", RDF_TYPE, OWL_TRANSITIVE)] + [
        (f"ex:a{i}", "ex:part", f"ex:a{i + 1}") for i in range(n)
    ]
    closed = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    ).materialize_rdfs(owl=True)
    vic_rows = [
        (f"ex:a{i}", "ex:part", f"ex:a{j}")
        for i in range(n + 1)
        for j in range(i + 2, n + 1)
    ]
    victims = _enc_triples(
        closed, spark.createDataFrame(vic_rows, ["s", "p", "o"])
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        R.derive_rdfs_delete(closed, victims, owl=True, max_rounds=2)
    kept = R.derive_rdfs_delete(closed, victims, owl=True)
    assert kept.count() == len(vic_rows)


def test_overdelete_rdfs_raises_when_rounds_exhausted(spark):
    """ADVICE r9, the overdeletion twin: a consequence chain longer
    than the round budget raises instead of leaving stale target
    rows. Deleting a mid-chain base edge of a closed transitive
    relation overdeletes hop-by-hop outward (round 0 reaches the
    victim's direct extensions, round 1 the two-sided spans, round 2
    verifies the fixpoint) — a 2-round budget exhausts mid-frontier."""
    from graphula_spark.operators import rdfs as R

    _I, _S, OWL_TRANSITIVE = _owl_ns()
    n = 5
    rows = [("ex:part", RDF_TYPE, OWL_TRANSITIVE)] + [
        (f"ex:a{i}", "ex:part", f"ex:a{i + 1}") for i in range(n)
    ]
    closed = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    ).materialize_rdfs(owl=True)
    derived_rows = [
        (f"ex:a{i}", "ex:part", f"ex:a{j}")
        for i in range(n + 1)
        for j in range(i + 2, n + 1)
    ]
    target = _enc_triples(
        closed, spark.createDataFrame(derived_rows, ["s", "p", "o"])
    )
    victims = _enc_triples(
        closed,
        spark.createDataFrame(
            [("ex:a2", "ex:part", "ex:a3")], ["s", "p", "o"]
        ),
    )
    full = closed.triples.select("s", "p", "o")
    with pytest.raises(RuntimeError, match="fixpoint"):
        R.overdelete_rdfs(
            closed, full, target, victims, owl=True, max_rounds=2
        )
    over = R.overdelete_rdfs(closed, full, target, victims, owl=True)
    # every derived pair whose span crosses the deleted edge: s ≤ a2,
    # o ≥ a3, minus the base victim itself
    assert over.count() == 8


@pytest.mark.slowtail


def test_dataset_reduce_rdfs_on_lubm_multigraph(spark):
    """Dataset.reduce_rdfs at LUBM scale: one university file split
    into two named data graphs + the schema slice as the shared
    ontology graph, each data graph closed per-graph first (the
    round-trip law is stated on closed graphs). Reduction strips a
    large derivable fraction per graph; re-materializing each reduced
    graph against the ontology reconstructs it exactly."""
    import glob

    from graphula_spark.dataset import Dataset
    from graphula_spark.operators.rdfs import (
        RDFS_DOMAIN,
        RDFS_RANGE,
    )
    from graphula_spark.sources.ntriples import read_ntriples

    paths = sorted(
        glob.glob("/root/reference/benchmarks/data/university0_*.nt")
    )
    if not paths:
        pytest.skip("reference LUBM data not present")
    tr_full = read_ntriples(spark, paths[:1])
    ONTO, G1, G2 = "http://ex/onto", "http://ex/g1", "http://ex/g2"
    schema_preds = [RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE]
    is_schema = F.col("p").isin(schema_preds)
    # deterministic ~1/6 data sample (schema kept whole): six
    # materialize passes at full file size put the test past the CI
    # budget; the law under test is scale-free
    tr = tr_full.where(
        is_schema | (F.abs(F.xxhash64("s")) % 6 == 0)
    )
    quads = tr.select(
        "s",
        "p",
        "o",
        F.when(is_schema, F.lit(ONTO))
        .when(F.abs(F.xxhash64("s")) % 2 == 0, F.lit(G1))
        .otherwise(F.lit(G2))
        .alias("g"),
    )
    ds = Dataset.from_string_quads(spark, quads)
    # close each data graph against the shared ontology (owl=True —
    # univ-bench declares TransitiveProperty/inverseOf)
    for gname, tgt in ((G1, "http://ex/t1"), (G2, "http://ex/t2")):
        ds = ds.materialize_rdfs(ONTO, gname, data=gname, owl=True)
        # fold the per-graph closure INTO the graph so each graph is
        # closed in place (target == data graph): materialize_rdfs
        # with target=data appends the derived rows to the graph
    red = ds.reduce_rdfs(owl=True, ontology=ONTO)

    def gsnap(d, name):
        g = d.graph(name)
        return {
            tuple(r)
            for r in g.decode(
                g.triples.select("s", "p", "o"), ["s", "p", "o"]
            ).collect()
        }

    for gname in (G1, G2):
        n_full = ds.graph(gname).triples.count()
        n_red = red.graph(gname).triples.count()
        assert n_red < 0.75 * n_full, (gname, n_red, n_full)
        out = red.materialize_rdfs(
            ONTO, "http://ex/rt", data=gname, owl=True
        )
        rebuilt = gsnap(out, gname) | gsnap(out, "http://ex/rt")
        # the rebuilt closure must contain the original graph exactly
        # up to ontology-closure rows that live in the target
        orig = gsnap(ds, gname)
        missing = orig - rebuilt
        assert not missing, (gname, sorted(missing)[:5])
    # ontology kept verbatim
    assert red.graph(ONTO).triples.count() == ds.graph(ONTO).triples.count()


def test_reduce_rdfs_batched_schema_matches_per_graph(spark):
    """Round 15: Dataset.reduce_rdfs collects every graph's schema in
    ONE quads-wide job and hands reduce_graph_removals per-slice
    subsets (was: one schema-collect job per graph). Pin the reduced
    output on a two-graph dataset with a shared ontology: derivable
    types stripped from BOTH data graphs, ontology kept verbatim —
    exactly what the per-graph collect path produced."""
    from graphula_spark.dataset import Dataset
    from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS

    quads = [
        ("a", RDF_TYPE, "Car", "g:x"),
        ("a", RDF_TYPE, "Vehicle", "g:x"),  # derivable via subClassOf
        ("b", RDF_TYPE, "Car", "g:y"),
        ("b", RDF_TYPE, "Vehicle", "g:y"),
        ("b", RDF_TYPE, "Thing", "g:y"),
        ("Car", RDFS_SUBCLASS, "Vehicle", "g:onto"),
        ("Vehicle", RDFS_SUBCLASS, "Thing", "g:onto"),
    ]
    ds = Dataset.from_string_quads(
        spark, spark.createDataFrame(quads, ["s", "p", "o", "g"])
    )
    reduced = ds.reduce_rdfs(ontology="g:onto")
    d = ds.dictionary
    out = reduced.quads
    for c in ("s", "p", "o", "g"):
        out = d.decode_col(out, c)
    got = {tuple(r) for r in out.select("s", "p", "o", "g").collect()}
    assert got == {
        ("a", RDF_TYPE, "Car", "g:x"),
        ("b", RDF_TYPE, "Car", "g:y"),
        ("Car", RDFS_SUBCLASS, "Vehicle", "g:onto"),
        ("Vehicle", RDFS_SUBCLASS, "Thing", "g:onto"),
    }
