"""Unit tests for the greedy BGP planner (reference: Graphula.optimize,
core/.../Graphula.scala:120-190) — pure driver-side logic, no Spark jobs."""

from graphula_spark.plans.bgp import BgpPlanner, BgpStats, TriplePattern, Var

X, Y, Z = Var("X"), Var("Y"), Var("Z")

# predicates: type is huge (rdf:type-like), email is small
STATS = BgpStats(
    by_pred={
        1: (100_000, 50_000, 10),  # p=type: many triples, few classes
        2: (500, 500, 500),  # p=email: few triples
        3: (20_000, 10_000, 5_000),  # p=memberOf
    },
    total=120_500,
)
IDS = {"type": 1, "email": 2, "memberOf": 3, "Student": 101, "Dept": 102}


def order_of(patterns):
    return [pat for pat, _ in BgpPlanner(STATS).order(patterns, IDS)]


def test_selective_pattern_first():
    pats = [
        TriplePattern(X, "type", "Student"),
        TriplePattern(X, "email", Y),
    ]
    assert order_of(pats)[0].p == "email"


def test_connectivity_avoids_cartesian():
    # Z is disconnected from X/Y until the memberOf pattern binds it —
    # the planner must not schedule the Z-only pattern before a
    # connected one unless forced
    pats = [
        TriplePattern(X, "email", Y),
        TriplePattern(Z, "type", "Dept"),
        TriplePattern(X, "memberOf", Z),
    ]
    ordered = order_of(pats)
    pos = {id(p): i for i, p in enumerate(ordered)}
    member_idx = next(i for i, p in enumerate(ordered) if p.p == "memberOf")
    z_type_idx = next(i for i, p in enumerate(ordered) if p.p == "type")
    assert member_idx < z_type_idx


def test_bound_object_lowers_estimate():
    est_unbound = STATS.estimate(False, 1, False)
    est_bound_o = STATS.estimate(False, 1, True)
    assert est_bound_o < est_unbound


def test_unknown_predicate_zero():
    assert STATS.estimate(False, 99, False) == 0.0


def test_fail_fast_empty_relation(spark):
    # a zero-cardinality pattern must produce an empty result without
    # running the other patterns' joins
    from graphula_spark.graph import Graph

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame([("a", "knows", "b")], ["s", "p", "o"]),
        cache=False,
    )
    df = g.execute_bgp(
        [TriplePattern(X, "knows", Y), TriplePattern(Y, "nosuch", Z)]
    )
    assert df.count() == 0


def test_heavy_hitter_exact_estimates():
    stats = BgpStats(
        by_pred={1: (100_000, 50_000, 10)},
        total=100_000,
        po_top={(1, 77): 15, (1, 88): 90_000},
    )
    # heavy-hitter object: exact count instead of cnt/nd_o
    assert stats.estimate(False, 1, True, 77) == 15.0
    assert stats.estimate(False, 1, True, 88) == 90_000.0
    # unknown object falls back to the uniform estimate
    assert stats.estimate(False, 1, True, 999) == 100_000 / 10


def test_skew_join_hot_cold_split(spark, monkeypatch):
    """Stats-identified heavy-hitter join keys trigger the hot/cold
    salted join: results identical to the plain join, and the executed
    plan carries the salt column + union of the two branches."""
    import graphula_spark.plans.bgp as B
    from graphula_spark.graph import Graph

    # skewed membership: 90% of entities belong to one hot group, so a
    # self-join on the group variable explodes on that single key
    rows = [
        (f"e{i}", "memberOf", "BigGroup" if i < 90 else f"g{i % 5}")
        for i in range(100
        )
    ]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"]), cache=False
    )

    pats = [
        TriplePattern(X, "memberOf", Z),
        TriplePattern(Y, "memberOf", Z),
    ]
    expected = {tuple(r) for r in g.execute_bgp(pats).collect()}
    assert len(expected) == 90 * 90 + 2 * 2 * 5

    monkeypatch.setattr(B, "SKEW_HOT_THRESHOLD", 50)
    monkeypatch.setattr(B, "SKEW_MIN_RESULT_EST", 1)
    df = g.execute_bgp(pats)
    got = {tuple(r) for r in df.collect()}
    assert got == expected
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, "hot branch must be salted"
    assert "Union" in plan, "plan must union hot + cold branches"


def test_skew_threshold_not_tripped_on_small_graphs(spark):
    """Default thresholds must leave small-graph plans salt-free."""
    from graphula_spark.graph import Graph

    rows = [(f"e{i}", "type", "T") for i in range(50)]
    rows += [(f"e{i}", "linked", f"e{(i + 1) % 50}") for i in range(50)]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"]), cache=False
    )
    df = g.execute_bgp(
        [TriplePattern(X, "linked", Y), TriplePattern(Y, "type", Z)]
    )
    assert "__salt" not in df._jdf.queryExecution().executedPlan().toString()
    assert df.count() == 50


def test_wide_predicate_stats_capped(spark, monkeypatch):
    """A graph with more predicates than the collection cap must not
    bloat the driver: stats truncate to the heaviest predicates, and an
    uncollected predicate estimates via the residual average instead of
    fail-fasting the whole BGP to empty."""
    import graphula_spark.plans.bgp as B
    from graphula_spark.graph import Graph

    monkeypatch.setattr(B.BgpStats, "MAX_PREDICATES", 10)
    monkeypatch.setattr(B.BgpStats, "PO_PRED_CAP", 5)
    # 30 predicates; p0 is heavy (40 triples), the rest have 2 each
    rows = [(f"s{i}", "p0", f"o{i % 4}") for i in range(40)]
    for p in range(1, 30):
        rows += [(f"s{i}", f"p{p}", f"o{i}") for i in range(2)]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"]), cache=False
    )
    stats = g.stats
    assert len(stats.by_pred) == 10
    assert not stats.complete
    assert stats.total == 40 + 29 * 2
    assert stats.residual_avg > 0
    # po_top limited to the heaviest 5 predicates
    assert len({p for (p, _o) in stats.po_top}) <= 5
    # a query on an UNCOLLECTED predicate still returns its rows
    # (p29 is among the lightest, certainly truncated)
    res = g.execute_bgp([TriplePattern(X, "p29", Y)])
    assert res.count() == 2
    # serialization round-trips the truncation marker
    obj = stats.to_obj()
    rt = B.BgpStats.from_obj(obj)
    assert rt.complete is False and rt.residual_avg == stats.residual_avg


class TestDpJoinOrder:
    """Selinger-style DP vs greedy: the DP must see through the chain."""

    # A: (?x pa ca) standalone 10 — greedy's favorite first pick — but
    # ?x fans out 1000x through pb; C: (?y pc cc) standalone 20, and
    # pb collapses to 1 row per bound object. Optimal order starts with
    # the LARGER standalone pattern C.
    STATS = BgpStats(
        by_pred={
            11: (1_000, 1_000, 100),  # pa
            12: (1_000_000, 1_000, 1_000_000),  # pb: 1000/subject, 1/object
            13: (2_000, 2_000, 100),  # pc
        },
        total=1_003_000,
        po_top={(11, 201): 10, (13, 202): 20},
    )
    IDS = {"pa": 11, "pb": 12, "pc": 13, "ca": 201, "cc": 202}

    def pats(self):
        return [
            TriplePattern(X, "pa", "ca"),
            TriplePattern(X, "pb", Y),
            TriplePattern(Y, "pc", "cc"),
        ]

    def test_dp_starts_with_chain_collapser(self):
        ordered = BgpPlanner(self.STATS).order(self.pats(), self.IDS)
        assert [p.p for p, _ in ordered] == ["pc", "pb", "pa"]

    def test_greedy_would_pick_locally_smallest(self):
        ordered = BgpPlanner(self.STATS)._order_greedy(self.pats(), self.IDS)
        assert ordered[0][0].p == "pa"  # the local trap the DP avoids

    def test_dp_cost_not_worse_than_greedy(self):
        # modeled cost of the DP order must be <= greedy's on its own
        # cost model, for a pile of shapes
        planner = BgpPlanner(self.STATS)

        def modeled_cost(order):
            bound, rows, cost = set(), None, 0.0
            for pat, _ in order:
                per = planner._est(pat, bound, self.IDS)
                rows = per if rows is None else rows * max(per, 0.001)
                cost += rows
                bound |= {v for _, v in pat.vars()}
            return cost

        shapes = [
            self.pats(),
            [
                TriplePattern(X, "pa", "ca"),
                TriplePattern(X, "pb", Y),
                TriplePattern(Y, "pb", Z),
                TriplePattern(Z, "pc", "cc"),
            ],
            [
                TriplePattern(X, "pb", Y),
                TriplePattern(X, "pa", Y),
                TriplePattern(Y, "pc", "cc"),
            ],
        ]
        for pats in shapes:
            dp = planner._order_dp(pats, self.IDS)
            greedy = planner._order_greedy(pats, self.IDS)
            assert modeled_cost(dp) <= modeled_cost(greedy) + 1e-9

    def test_two_patterns_stay_greedy(self):
        pats = [
            TriplePattern(X, "pa", "ca"),
            TriplePattern(X, "pb", Y),
        ]
        ordered = BgpPlanner(self.STATS).order(pats, self.IDS)
        assert ordered[0][0].p == "pa"

    def test_disconnected_graph_still_completes(self):
        pats = [
            TriplePattern(X, "pa", "ca"),
            TriplePattern(Y, "pc", "cc"),
            TriplePattern(Z, "pb", Var("W")),
        ]
        ordered = BgpPlanner(self.STATS).order(pats, self.IDS)
        assert len(ordered) == 3


class TestBushyDp:
    """Bushy join trees (DPsub over connected subsets) for the shape
    left-deep orders cannot express: two selective ends of a chain of
    huge relations, where joining both ends first keeps every
    intermediate small."""

    @staticmethod
    def _chain():
        a, x, y, z, b = Var("a"), Var("x"), Var("y"), Var("z"), Var("b")
        patterns = [
            TriplePattern(a, "rare1", x),
            TriplePattern(x, "big1", y),
            TriplePattern(y, "big2", z),
            TriplePattern(z, "rare2", b),
        ]
        stats = BgpStats(
            {
                1: (5, 5, 5),
                2: (10_000_000, 1_000, 1_000),
                3: (10_000_000, 1_000, 1_000),
                4: (5, 5, 5),
            },
            20_000_010,
        )
        const_ids = {"rare1": 1, "big1": 2, "big2": 3, "rare2": 4}
        return patterns, stats, const_ids

    def test_selective_ends_pick_bushy(self):
        patterns, stats, const_ids = self._chain()
        tree = BgpPlanner(stats).bushy_tree(patterns, const_ids)
        assert tree is not None

        def leaves(node):
            if isinstance(node, int):
                return {node}
            return leaves(node[0]) | leaves(node[1])

        l, r = leaves(tree[0]), leaves(tree[1])
        # both ends join their neighbor first; the huge middle join
        # happens once, between two small intermediates
        assert {frozenset(l), frozenset(r)} == {
            frozenset({0, 1}),
            frozenset({2, 3}),
        }

    def test_star_stays_left_deep(self):
        """A star BGP gains nothing from bushy trees — the gate must
        keep it on the proven left-deep path."""
        s = Var("s")
        patterns = [
            TriplePattern(s, "p1", Var("v1")),
            TriplePattern(s, "p2", Var("v2")),
            TriplePattern(s, "p3", Var("v3")),
            TriplePattern(s, "p4", Var("v4")),
        ]
        stats = BgpStats(
            {i: (1000 * i, 100, 100) for i in range(1, 5)}, 10_000
        )
        const_ids = {f"p{i}": i for i in range(1, 5)}
        assert BgpPlanner(stats).bushy_tree(patterns, const_ids) is None

    def test_bushy_execution_matches_linear(self, spark):
        """execute_bgp with crafted stats that trip the bushy gate must
        return exactly the rows the stats-free (greedy linear) path
        returns."""
        import random

        from graphula_spark.graph import Graph
        from graphula_spark.plans import bgp as B

        rng = random.Random(7)
        triples = []
        # chain data: a -rare1-> x -big1-> y -big2-> z -rare2-> b
        xs = [f"x{i}" for i in range(10)]
        ys = [f"y{i}" for i in range(20)]
        zs = [f"z{i}" for i in range(20)]
        triples += [(f"a{i}", "rare1", rng.choice(xs)) for i in range(5)]
        triples += [
            (rng.choice(xs), "big1", rng.choice(ys)) for _ in range(200)
        ]
        triples += [
            (rng.choice(ys), "big2", rng.choice(zs)) for _ in range(200)
        ]
        triples += [(rng.choice(zs), "rare2", f"b{i}") for i in range(5)]
        g = Graph.from_string_triples(
            spark, spark.createDataFrame(triples, ["s", "p", "o"])
        )
        patterns, stats, _ = self._chain()
        const_ids = g._const_ids(patterns)
        pid = {t: const_ids[t] for t in ("rare1", "big1", "big2", "rare2")}
        crafted = BgpStats(
            {
                pid["rare1"]: (5, 5, 5),
                pid["big1"]: (10_000_000, 1_000, 1_000),
                pid["big2"]: (10_000_000, 1_000, 1_000),
                pid["rare2"]: (5, 5, 5),
            },
            20_000_010,
        )
        assert BgpPlanner(crafted).bushy_tree(patterns, const_ids) is not None
        bushy = B.execute_bgp(
            g.triples, patterns, const_ids, stats=crafted
        )
        linear = B.execute_bgp(g.triples, patterns, const_ids, stats=None)
        key = lambda r: tuple(r[c] for c in sorted(bushy.columns))
        assert sorted(map(key, bushy.collect())) == sorted(
            map(key, linear.collect())
        )
        assert len(bushy.collect()) > 0
