"""Tiny hand-built graph BGP tests.

Ported behaviorally from the reference's GraphulaSpec
(core/src/test/scala/com/graphula/GraphulaSpec.scala:11-117): a 3-hop
chain join, a star without parallelism, and a dense 2x2x2 cross.
"""

import pytest

from graphula_spark.graph import Graph
from graphula_spark.plans.bgp import TriplePattern, Var


def make_graph(spark, triples):
    df = spark.createDataFrame(triples, ["s", "p", "o"])
    return Graph.from_string_triples(spark, df, cache=False)


X, Y, Z = Var("X"), Var("Y"), Var("Z")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestChainJoin:
    def test_three_hop_chain(self, spark):
        # a -knows-> b -knows-> c -knows-> d  (GraphulaSpec chain join)
        g = make_graph(
            spark,
            [
                ("a", "knows", "b"),
                ("b", "knows", "c"),
                ("c", "knows", "d"),
            ],
        )
        res = g.execute_bgp_decoded(
            [
                TriplePattern(X, "knows", Y),
                TriplePattern(Y, "knows", Z),
            ]
        )
        assert sorted(res.columns) == ["X", "Y", "Z"]
        got = {tuple(r[c] for c in ["X", "Y", "Z"]) for r in res.collect()}
        assert got == {("a", "b", "c"), ("b", "c", "d")}

    def test_star(self, spark):
        g = make_graph(
            spark,
            [
                ("hub", "likes", "a"),
                ("hub", "likes", "b"),
                ("hub", "hates", "c"),
            ],
        )
        res = g.execute_bgp_decoded([TriplePattern("hub", "likes", X)])
        assert {r["X"] for r in res.collect()} == {"a", "b"}

    def test_dense_cross(self, spark):
        # 2x2x2 dense graph: every (s,p,o) in {s1,s2}x{p1,p2}x{o1,o2}
        triples = [
            (f"s{i}", f"p{j}", f"o{k}")
            for i in (1, 2)
            for j in (1, 2)
            for k in (1, 2)
        ]
        g = make_graph(spark, triples)
        res = g.execute_bgp([TriplePattern(X, Y, Z)])
        assert res.count() == 8

    def test_repeated_variable(self, spark):
        g = make_graph(
            spark,
            [("a", "knows", "a"), ("a", "knows", "b"), ("c", "knows", "c")],
        )
        res = g.execute_bgp_decoded([TriplePattern(X, "knows", X)])
        assert {r["X"] for r in res.collect()} == {"a", "c"}


class TestShortCircuits:
    def test_unknown_constant_empty(self, spark):
        g = make_graph(spark, [("a", "knows", "b")])
        res = g.execute_bgp([TriplePattern(X, "nosuchpred", Y)])
        assert res.count() == 0
        assert sorted(res.columns) == ["X", "Y"]

    def test_fully_bound_existence(self, spark):
        g = make_graph(spark, [("a", "knows", "b"), ("b", "knows", "c")])
        assert g.exists("a", "knows", "b")
        assert not g.exists("a", "knows", "c")
        # fully-bound pattern inside a BGP acts as a gate
        res = g.execute_bgp(
            [TriplePattern(X, "knows", Y), TriplePattern("a", "knows", "b")]
        )
        assert res.count() == 2
        res2 = g.execute_bgp(
            [TriplePattern(X, "knows", Y), TriplePattern("a", "knows", "zzz")]
        )
        assert res2.count() == 0

    def test_count_fast_path(self, spark):
        g = make_graph(
            spark, [("a", "knows", "b"), ("b", "knows", "c"), ("a", "likes", "b")]
        )
        assert g.count_bgp([TriplePattern(X, "knows", Y)]) == 2
        assert g.count_bgp([TriplePattern(X, "likes", Y)]) == 1
        assert (
            g.count_bgp([TriplePattern(X, "knows", Y), TriplePattern(Y, "knows", Z)])
            == 1
        )


class TestIndexEquivalents:
    def test_values_predicate_first(self, spark):
        g = make_graph(
            spark, [("a", "knows", "b"), ("a", "likes", "c"), ("a", "knows", "d")]
        )
        # values of (s=a, ?, ?) enumerates predicates first (p priority)
        vals = {r["v"] for r in g.values("a", None, None).collect()}
        assert vals == {"knows", "likes"}
        vals2 = {r["v"] for r in g.values("a", "knows", None).collect()}
        assert vals2 == {"b", "d"}
        assert g.value_count("a", "knows", None) == 2

    def test_set_semantics_dedup(self, spark):
        df = spark.createDataFrame(
            [("a", "knows", "b")] * 5 + [("b", "knows", "c")], ["s", "p", "o"]
        )
        g = Graph.from_string_triples(spark, df, cache=False)
        assert g.triples.count() == 2


def test_sql_views_interop(spark):
    g = make_graph(
        spark, [("a", "knows", "b"), ("b", "knows", "c"), ("a", "likes", "x")]
    )
    g.create_views("tv")
    n = spark.sql("SELECT count(*) AS n FROM tv_triples").collect()[0]["n"]
    assert n == 3
    rows = spark.sql(
        "SELECT s, o FROM tv_spo WHERE p = 'knows' ORDER BY s"
    ).collect()
    assert [(r["s"], r["o"]) for r in rows] == [("a", "b"), ("b", "c")]
    # join through the dict view round-trips ids
    m = spark.sql(
        """SELECT d.value AS subj FROM tv_triples t JOIN tv_dict d ON t.s = d.id
           GROUP BY d.value ORDER BY subj"""
    ).collect()
    assert [r["subj"] for r in m] == ["a", "b"]


def test_basic_graph_patterns_cube_parity(spark):
    """Mirror of the reference's BasicGraphPatterns JMH benchmark
    (benchmarks/.../BasicGraphPatterns.scala:12-54): a dense
    20x20x20 cube with the 3-pattern chain
    (?a <1> ?b)(?b <2> ?c)(?c <3> <4>). Every node value 1..20 appears
    as both subject and object, so the chain cardinality is exactly
    20^3 = 8000 (the final pattern's o=4 constraint always holds)."""
    from graphula_spark.graph import Graph
    from graphula_spark.plans.bgp import TriplePattern, Var

    n = 20
    rows = [
        (f"n{s}", f"e{p}", f"n{o}")
        for s in range(1, n + 1)
        for p in range(1, n + 1)
        for o in range(1, n + 1)
    ]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"]), cache=False
    )
    A, B, C = Var("a"), Var("b"), Var("c")
    res = g.execute_bgp(
        [
            TriplePattern(A, "e1", B),
            TriplePattern(B, "e2", C),
            TriplePattern(C, "e3", "n4"),
        ]
    )
    assert res.count() == n * n * n
