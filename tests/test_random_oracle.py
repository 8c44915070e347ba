"""Randomized cross-engine oracle: for random tiny graphs, run randomly
parameterized SPARQL queries through the engine AND the equivalent SQL
over the raw triple table in DuckDB; results must match exactly.

This plays the role the reference's ScalaCheck suites play (randomized
equivalence against an independent model), but checks the *whole* query
path — parser, planner, joins, filters, aggregation, decode.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphula_spark.graph import Graph

subjects = st.sampled_from([f"s{i}" for i in range(5)])
preds = st.sampled_from(["p1", "p2", "p3"])
values = st.sampled_from([str(n) for n in (1, 5, 9, 10, 25, 100)])
triple = st.tuples(subjects, preds, values)
graphs = st.lists(triple, min_size=2, max_size=25, unique=True)
thresholds = st.sampled_from([2, 9, 26])


def duck(triples):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR, p VARCHAR, o VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", triples)
    return con


@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(graphs, thresholds)
def test_filter_join_vs_duckdb(spark, triples, thr):
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(triples, ["s", "p", "o"]), cache=False
    )
    got = {
        (r["x"], r["v"])
        for r in g.sparql(
            f"SELECT ?x ?v WHERE {{ ?x <p1> ?v . FILTER(?v > {thr}) }}"
        ).collect()
    }
    con = duck(triples)
    want = {
        (s, o)
        for s, o in con.execute(
            f"SELECT s, o FROM t WHERE p = 'p1' AND CAST(o AS DOUBLE) > {thr}"
        ).fetchall()
    }
    assert got == want


@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(graphs)
def test_join_agg_vs_duckdb(spark, triples):
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(triples, ["s", "p", "o"]), cache=False
    )
    got = {
        (r["x"], r["n"])
        for r in g.sparql(
            "SELECT ?x (COUNT(?v) AS ?n) WHERE { ?x <p1> ?u . ?x <p2> ?v } GROUP BY ?x"
        ).collect()
    }
    con = duck(triples)
    # SPARQL multiset semantics: COUNT counts *solutions*, i.e. the
    # cross product of a subject's p1 and p2 bindings — no DISTINCT
    want = {
        (s, n)
        for s, n in con.execute(
            """SELECT a.s, count(*) FROM (SELECT s, o FROM t WHERE p='p1') a
               JOIN (SELECT s, o FROM t WHERE p='p2') b ON a.s = b.s GROUP BY a.s"""
        ).fetchall()
    }
    assert got == want


@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(graphs)
def test_optional_vs_duckdb(spark, triples):
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(triples, ["s", "p", "o"]), cache=False
    )
    got = {
        (r["x"], r["w"])
        for r in g.sparql(
            "SELECT ?x ?w WHERE { ?x <p1> ?v . OPTIONAL { ?x <p3> ?w } }"
        ).collect()
    }
    con = duck(triples)
    want = {
        (s, w)
        for s, w in con.execute(
            """SELECT a.s, b.o FROM (SELECT DISTINCT s FROM t WHERE p='p1') a
               LEFT JOIN (SELECT s, o FROM t WHERE p='p3') b ON a.s = b.s"""
        ).fetchall()
    }
    assert got == want
