"""SPARQL feature tests for the surface the reference delegates to Jena
ARQ (SURVEY.md §2.2) — all our own code here."""

import pytest

from graphula_spark.graph import Graph

TRIPLES = [
    # people with ages (bare numeric literals) and optional emails
    ("alice", "age", "30"),
    ("bob", "age", "25"),
    ("carol", "age", "35"),
    ("dave", "age", "9"),
    ("alice", "email", "alice@x.org"),
    ("carol", "email", "carol@x.org"),
    ("alice", "knows", "bob"),
    ("bob", "knows", "carol"),
    ("carol", "knows", "alice"),
    ("alice", "likes", "pizza"),
    ("bob", "likes", "sushi"),
    ("alice", "city", "zurich"),
    ("bob", "city", "zurich"),
    ("carol", "city", "bern"),
    ("dave", "city", "bern"),
]


@pytest.fixture(scope="module")
def g(spark):
    df = spark.createDataFrame(TRIPLES, ["s", "p", "o"])
    gr = Graph.from_string_triples(spark, df)
    yield gr
    gr.triples.unpersist()
    gr.dictionary.df.unpersist()


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_filter_numeric(g):
    df = g.sparql("SELECT ?x WHERE { ?x <age> ?a . FILTER(?a > 26) }")
    assert {r["x"] for r in df.collect()} == {"alice", "carol"}


def test_filter_numeric_not_lexicographic(g):
    # "9" > "25" lexicographically — numeric semantics must win
    df = g.sparql("SELECT ?x WHERE { ?x <age> ?a . FILTER(?a < 26) }")
    assert {r["x"] for r in df.collect()} == {"bob", "dave"}


def test_filter_regex_and_logic(g):
    df = g.sparql(
        'SELECT ?x WHERE { ?x <age> ?a . FILTER(REGEX(STR(?x), "^[ab]") && ?a >= 25) }'
    )
    assert {r["x"] for r in df.collect()} == {"alice", "bob"}


def test_optional(g):
    df = g.sparql(
        "SELECT ?x ?e WHERE { ?x <age> ?a . OPTIONAL { ?x <email> ?e } }"
    )
    got = {(r["x"], r["e"]) for r in df.collect()}
    assert got == {
        ("alice", "alice@x.org"),
        ("bob", None),
        ("carol", "carol@x.org"),
        ("dave", None),
    }


def test_optional_with_bound_filter(g):
    df = g.sparql(
        "SELECT ?x WHERE { ?x <age> ?a . OPTIONAL { ?x <email> ?e } FILTER(!BOUND(?e)) }"
    )
    assert {r["x"] for r in df.collect()} == {"bob", "dave"}


def test_optional_correlated_filter(g):
    # LeftJoin condition referencing an OUTER variable: pairs (x, y)
    # where y is x's friend, keeping the friend only if y's age exceeds
    # x's age — x rows always survive (SPARQL LeftJoin semantics)
    df = g.sparql(
        """SELECT ?x ?y WHERE {
             ?x <age> ?a .
             OPTIONAL { ?x <knows> ?y . ?y <age> ?b . FILTER(?b > ?a) } }"""
    )
    got = {(r["x"], r["y"]) for r in df.collect()}
    # alice(30) knows bob(25): filter fails -> alice kept with null;
    # bob(25) knows carol(35): kept; carol(35) knows alice(30): fails
    assert got == {
        ("alice", None),
        ("bob", "carol"),
        ("carol", None),
        ("dave", None),
    }


def test_optional_correlated_filter_multiset(g):
    # ARQ is multiset-exact: duplicate identical left rows (built here
    # with a self-UNION) must each survive the correlated LeftJoin —
    # matched rows AND unmatched null-extended rows appear per-duplicate.
    df = g.sparql(
        """SELECT ?x ?y WHERE {
             { ?x <age> ?a } UNION { ?x <age> ?a }
             OPTIONAL { ?x <knows> ?y . ?y <age> ?b . FILTER(?b > ?a) } }"""
    )
    got = sorted((r["x"], r["y"]) for r in df.collect())
    assert got == sorted(
        [
            ("alice", None), ("alice", None),
            ("bob", "carol"), ("bob", "carol"),
            ("carol", None), ("carol", None),
            ("dave", None), ("dave", None),
        ]
    )


def test_union(g):
    df = g.sparql(
        "SELECT ?x WHERE { { ?x <likes> <pizza> } UNION { ?x <likes> <sushi> } }"
    )
    assert {r["x"] for r in df.collect()} == {"alice", "bob"}


def test_minus(g):
    df = g.sparql("SELECT ?x WHERE { ?x <age> ?a . MINUS { ?x <email> ?e } }")
    assert {r["x"] for r in df.collect()} == {"bob", "dave"}


def test_not_exists(g):
    df = g.sparql(
        "SELECT ?x WHERE { ?x <age> ?a . FILTER NOT EXISTS { ?x <email> ?e } }"
    )
    assert {r["x"] for r in df.collect()} == {"bob", "dave"}


def test_exists(g):
    df = g.sparql(
        "SELECT ?x WHERE { ?x <age> ?a . FILTER EXISTS { ?x <email> ?e } }"
    )
    assert {r["x"] for r in df.collect()} == {"alice", "carol"}


def test_distinct(g):
    df = g.sparql("SELECT DISTINCT ?c WHERE { ?x <city> ?c }")
    assert sorted(r["c"] for r in df.collect()) == ["bern", "zurich"]


def test_order_limit_offset(g):
    df = g.sparql(
        "SELECT ?x ?a WHERE { ?x <age> ?a } ORDER BY DESC(?a) LIMIT 2"
    )
    assert [r["x"] for r in df.collect()] == ["carol", "alice"]
    df2 = g.sparql(
        "SELECT ?x WHERE { ?x <age> ?a } ORDER BY ?a LIMIT 2 OFFSET 1"
    )
    assert [r["x"] for r in df2.collect()] == ["bob", "alice"]


def test_group_by_aggregates(g):
    df = g.sparql(
        """SELECT ?c (COUNT(?x) AS ?n) (AVG(?a) AS ?avg_age) (MAX(?a) AS ?max_age)
           WHERE { ?x <city> ?c . ?x <age> ?a } GROUP BY ?c"""
    )
    got = {(r["c"], r["n"], r["avg_age"], r["max_age"]) for r in df.collect()}
    assert got == {("zurich", 2, 27.5, "30"), ("bern", 2, 22.0, "35")}


def test_group_by_having(g):
    df = g.sparql(
        """SELECT ?c (COUNT(?x) AS ?n) WHERE { ?x <city> ?c . ?x <email> ?m }
           GROUP BY ?c HAVING (COUNT(?x) < 2)"""
    )
    got = {(r["c"], r["n"]) for r in df.collect()}
    assert got == {("zurich", 1), ("bern", 1)}


def test_implicit_group(g):
    df = g.sparql("SELECT (COUNT(?x) AS ?n) (SUM(?a) AS ?total) WHERE { ?x <age> ?a }")
    r = df.collect()[0]
    assert r["n"] == 4 and r["total"] == 99.0


def test_count_distinct(g):
    df = g.sparql("SELECT (COUNT(DISTINCT ?c) AS ?n) WHERE { ?x <city> ?c }")
    assert df.collect()[0]["n"] == 2


def test_bind(g):
    df = g.sparql(
        "SELECT ?x ?a2 WHERE { ?x <age> ?a . BIND(?a * 2 AS ?a2) FILTER(?a2 > 60) }"
    )
    got = {(r["x"], r["a2"]) for r in df.collect()}
    assert got == {("carol", 70.0)}


def test_values(g):
    df = g.sparql(
        "SELECT ?x ?a WHERE { VALUES ?x { <alice> <dave> } ?x <age> ?a }"
    )
    got = {(r["x"], r["a"]) for r in df.collect()}
    assert got == {("alice", "30"), ("dave", "9")}


def test_ask(g):
    assert g.sparql("ASK { <alice> <knows> <bob> }").collect()[0]["ask"] is True
    assert g.sparql("ASK { <alice> <knows> <carol> }").collect()[0]["ask"] is False


def test_select_star(g):
    df = g.sparql("SELECT * WHERE { ?x <likes> ?f }")
    assert sorted(df.columns) == ["f", "x"]
    assert len(df.collect()) == 2


def test_select_expression(g):
    df = g.sparql(
        'SELECT ?x (CONCAT(STR(?x), "!") AS ?bang) WHERE { ?x <likes> <pizza> }'
    )
    assert rows(df) == [("alice", "alice!")]


def test_property_path_plus(g):
    # extension: the reference throws on paths (Sparql.scala:130-134);
    # we run them via semi-naive transitive closure.
    # knows edges: alice->bob->carol->alice (a 3-cycle)
    df = g.sparql("SELECT ?y WHERE { <alice> <knows>+ ?y }")
    assert {r["y"] for r in df.collect()} == {"alice", "bob", "carol"}


def test_property_path_star(g):
    df = g.sparql("SELECT ?y WHERE { <dave> <knows>* ?y }")
    # dave has no knows edges, but the zero-length match pairs the
    # BOUND term with itself (§9.3 — round 10 fix; the documented
    # incident-nodes deviation now applies only to the both-var case)
    assert {r["y"] for r in df.collect()} == {"dave"}
    df2 = g.sparql("SELECT ?y WHERE { <bob> <knows>* ?y }")
    assert {r["y"] for r in df2.collect()} == {"alice", "bob", "carol"}


def test_property_path_joined(g):
    df = g.sparql(
        "SELECT DISTINCT ?x WHERE { ?x <knows>+ ?y . ?y <email> ?e }"
    )
    # everyone in the cycle reaches alice and carol (who have emails)
    assert {r["x"] for r in df.collect()} == {"alice", "bob", "carol"}


def test_group_concat_sample(g):
    df = g.sparql(
        """SELECT ?c (GROUP_CONCAT(?x ; SEPARATOR = ",") AS ?who)
                  (SAMPLE(?x) AS ?one)
           WHERE { ?x <city> ?c } GROUP BY ?c"""
    )
    got = {(r["c"], r["who"]) for r in df.collect()}
    assert got == {("zurich", "alice,bob"), ("bern", "carol,dave")}
    ones = {r["one"] for r in df.collect()}
    assert ones <= {"alice", "bob", "carol", "dave"}


def test_in_coalesce_if(g):
    df = g.sparql(
        """SELECT ?x ?grp WHERE {
             ?x <age> ?a . OPTIONAL { ?x <email> ?e }
             BIND(IF(?a >= 30, "senior", "junior") AS ?grp)
             FILTER(?x IN (<alice>, <dave>)) }"""
    )
    got = {(r["x"], r["grp"]) for r in df.collect()}
    assert got == {("alice", "senior"), ("dave", "junior")}


def test_isiri_isliteral(g):
    df = g.sparql(
        "SELECT ?x WHERE { ?x <age> ?a . FILTER(ISIRI(?x) && ISLITERAL(?a) = false) }"
    )
    # bare-term graph: ages are not quoted literals, so all pass
    assert df.count() == 4


def test_subquery_aggregate_join(g):
    # SPARQL 1.1 subquery: cities with their resident count, joined back
    # to residents of cities having 2 people with emails... simpler:
    # count per city in a subquery, join to people in those cities
    df = g.sparql(
        """SELECT ?x ?n WHERE {
             { SELECT ?c (COUNT(?p) AS ?n) WHERE { ?p <city> ?c } GROUP BY ?c }
             ?x <city> ?c . ?x <email> ?e . }"""
    )
    got = {(r["x"], r["n"]) for r in df.collect()}
    assert got == {("alice", 2), ("carol", 2)}


def test_subquery_limit(g):
    df = g.sparql(
        """SELECT ?x ?a WHERE {
             { SELECT ?x WHERE { ?x <age> ?a0 } ORDER BY DESC(?a0) LIMIT 2 }
             ?x <age> ?a . }"""
    )
    got = {(r["x"], r["a"]) for r in df.collect()}
    assert got == {("carol", "35"), ("alice", "30")}


def test_sparql_update_insert_delete(spark):
    from graphula_spark.graph import Graph

    g0 = Graph.from_string_triples(
        spark,
        spark.createDataFrame([("a", "p", "b")], ["s", "p", "o"]),
        cache=False,
    )
    g1 = g0.sparql_update(
        'INSERT DATA { <c> <p> <d> . <c> <name> "carl" . }'
    )
    assert g1.sparql("SELECT ?x WHERE { ?x <p> ?y }").count() == 2
    assert (
        g1.sparql('ASK { <c> <name> "carl" }').collect()[0]["ask"] is True
    )
    g2 = g1.sparql_update("DELETE DATA { <a> <p> <b> . }")
    got = {(r["x"], r["y"]) for r in g2.sparql("SELECT ?x ?y WHERE { ?x <p> ?y }").collect()}
    assert got == {("c", "d")}


def test_sparql_update_pattern_forms(spark):
    from graphula_spark.graph import Graph

    g0 = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [
                ("a", "status", "old"),
                ("b", "status", "old"),
                ("c", "status", "new"),
                ("a", "score", "10"),
            ],
            ["s", "p", "o"],
        ),
        cache=False,
    )

    # DELETE WHERE: pattern doubles as template
    g1 = g0.sparql_update("DELETE WHERE { ?x <status> <old> }")
    got = {
        (r["x"], r["v"])
        for r in g1.sparql("SELECT ?x ?v WHERE { ?x <status> ?v }").collect()
    }
    assert got == {("c", "new")}
    # untouched triples survive
    assert g1.sparql("SELECT ?s WHERE { ?s <score> ?v }").count() == 1

    # DELETE {t} INSERT {t} WHERE {g}: rename a predicate in one update
    g2 = g0.sparql_update(
        """DELETE { ?x <status> ?v } INSERT { ?x <state> ?v }
           WHERE { ?x <status> ?v }"""
    )
    assert g2.sparql("SELECT ?x WHERE { ?x <status> ?v }").count() == 0
    got = {
        (r["x"], r["v"])
        for r in g2.sparql("SELECT ?x ?v WHERE { ?x <state> ?v }").collect()
    }
    assert got == {("a", "old"), ("b", "old"), ("c", "new")}

    # INSERT {t} WHERE {g} with a filter
    g3 = g0.sparql_update(
        """INSERT { ?x <flagged> <true> }
           WHERE { ?x <score> ?s . FILTER(?s >= 5) }"""
    )
    got = {r["x"] for r in g3.sparql("SELECT ?x WHERE { ?x <flagged> <true> }").collect()}
    assert got == {"a"}
    # pre-state untouched in the new snapshot
    assert g3.sparql("SELECT ?x ?v WHERE { ?x <status> ?v }").count() == 3


def test_sparql_update_clear_and_load(spark, tmp_path):
    from graphula_spark.graph import Graph

    g0 = Graph.from_string_triples(
        spark,
        spark.createDataFrame([("a", "p", "b")], ["s", "p", "o"]),
        cache=False,
    )
    g1 = g0.sparql_update("CLEAR DEFAULT")
    assert g1.triples.count() == 0

    nt = tmp_path / "feed.nt"
    nt.write_text(
        "<http://e/x> <http://e/p> <http://e/y> .\n"
        "<http://e/y> <http://e/p> <http://e/z> .\n"
    )
    g2 = g0.sparql_update(f"LOAD <file://{nt}>")
    assert g2.sparql("SELECT ?s WHERE { ?s <http://e/p> ?o }").count() == 2
    # original triple still present
    assert g2.sparql("ASK { <a> <p> <b> }").collect()[0]["ask"] is True


def test_construct(g):
    # reference throws on CONSTRUCT (CustomQueryExecution.scala:218-239)
    df = g.sparql(
        """CONSTRUCT { ?x <rich> <yes> . ?x <hasAge> ?a }
           WHERE { ?x <age> ?a . FILTER(?a >= 30) }"""
    )
    got = {(r["s"], r["p"], r["o"]) for r in df.collect()}
    assert got == {
        ("alice", "rich", "yes"),
        ("carol", "rich", "yes"),
        ("alice", "hasAge", "30"),
        ("carol", "hasAge", "35"),
    }


def test_describe_iri(g):
    df = g.sparql("DESCRIBE <alice>")
    got = {(r["p"], r["o"]) for r in df.collect()}
    assert ("age", "30") in got and ("likes", "pizza") in got
    assert all(r["s"] == "alice" for r in df.collect())


def test_describe_var(g):
    df = g.sparql("DESCRIBE ?x WHERE { ?x <city> <bern> }")
    subs = {r["s"] for r in df.collect()}
    assert subs == {"carol", "dave"}


def test_str_functions(g):
    df = g.sparql(
        """SELECT ?x (STRAFTER(STR(?x), "a") AS ?after)
                  (STRBEFORE(STR(?x), "l") AS ?before)
                  (MD5(STR(?x)) AS ?h)
           WHERE { ?x <likes> <pizza> }"""
    )
    import hashlib

    r = df.collect()[0]
    assert r["after"] == "lice" and r["before"] == "a"
    assert r["h"] == hashlib.md5(b"alice").hexdigest()


def test_subquery_group_semantics(g):
    df = g.sparql(
        """SELECT ?x WHERE {
             { ?x <city> <zurich> . ?x <email> ?e }
           }"""
    )
    assert {r["x"] for r in df.collect()} == {"alice"}


def test_numeric_literal_in_data_position(spark):
    """SPARQL `5` in a triple pattern is `"5"^^xsd:integer`; it must
    match NT-style typed literals AND (via the bare-lexical fallback)
    triple-ized relational data (round-1 advice item)."""
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    typed = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [("a", "age", f'"30"^^<{xsd_int}>'), ("b", "age", f'"9"^^<{xsd_int}>')],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    assert rows(typed.sparql("SELECT ?x WHERE { ?x <age> 30 . }")) == [("a",)]

    bare = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [("a", "age", "30"), ("b", "age", "9")], ["s", "p", "o"]
        ),
        cache=False,
    )
    assert rows(bare.sparql("SELECT ?x WHERE { ?x <age> 30 . }")) == [("a",)]


def test_boolean_literal_in_data_position(spark):
    xsd_bool = "http://www.w3.org/2001/XMLSchema#boolean"
    g2 = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [("a", "ok", f'"true"^^<{xsd_bool}>'), ("b", "ok", f'"false"^^<{xsd_bool}>')],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    assert rows(g2.sparql("SELECT ?x WHERE { ?x <ok> true . }")) == [("a",)]


def test_insert_data_numeric_stores_typed_form(spark):
    g0 = Graph.from_string_triples(
        spark,
        spark.createDataFrame([("seed", "p", "o")], ["s", "p", "o"]),
        cache=False,
    )
    g1 = g0.sparql_update('INSERT DATA { <x> <age> 42 . }')
    # stored in the NT typed convention, so both query spellings match
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    assert rows(g1.sparql("SELECT ?s WHERE { ?s <age> 42 . }")) == [("x",)]
    assert rows(
        g1.sparql(f'SELECT ?s WHERE {{ ?s <age> "42"^^<{xsd_int}> . }}')
    ) == [("x",)]


def test_values_undef_compat_join(g):
    """UNDEF in VALUES is an unbound binding: compatible with anything
    on that var (ARQ semantics; round-1 gap — null-rejecting equi-joins
    dropped these rows)."""
    out = rows(g.sparql(
        """SELECT ?x ?city WHERE {
             ?x <city> ?city .
             VALUES (?x ?city) { (<alice> UNDEF) (UNDEF <bern>) } }"""
    ))
    assert out == [("alice", "zurich"), ("carol", "bern"), ("dave", "bern")]


def test_optional_var_joined_downstream(g):
    """A var bound only in some rows (OPTIONAL) later joined against
    VALUES must keep the unbound-left rows and adopt the binding."""
    out = rows(g.sparql(
        """SELECT ?x ?e WHERE {
             ?x <knows> ?y .
             OPTIONAL { ?x <email> ?e }
             VALUES ?e { <alice@x.org> } }"""
    ))
    # alice binds e=alice@x.org (equal -> kept); bob has no email ->
    # unbound e is compatible and adopts the VALUES binding; carol's
    # email differs -> dropped
    assert out == [("alice", "alice@x.org"), ("bob", "alice@x.org")]


def test_minus_ignores_unbound_shared_var(g):
    """MINUS only removes rows whose bound domains actually intersect:
    a left row with ?e unbound shares nothing with the MINUS group."""
    out = rows(g.sparql(
        """SELECT ?x WHERE {
             ?x <city> ?c .
             OPTIONAL { ?x <email> ?e }
             MINUS { ?m <email> ?e } }"""
    ))
    assert out == [("bob",), ("dave",)]


@pytest.fixture(scope="module")
def lang_graph(spark):
    triples = [
        ("a", "label", '"hello"@en'),
        ("b", "label", '"hallo"@de-CH'),
        ("c", "label", '"plain"'),
        ("a", "alt", '"hello"@en'),
        ("b", "alt", '"servus"@de'),
        ("e", "when", '"2011-01-10T14:45:13.815-05:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>'),
        ("f", "when", '"2020-06-01T03:04:05Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>'),
    ]
    gr = Graph.from_string_triples(
        spark, spark.createDataFrame(triples, ["s", "p", "o"]), cache=False
    )
    return gr


def test_langmatches(lang_graph):
    q = """SELECT ?x WHERE {{ ?x <label> ?l . FILTER(LANGMATCHES(LANG(?l), "{r}")) }}"""
    assert rows(lang_graph.sparql(q.format(r="en"))) == [("a",)]
    assert rows(lang_graph.sparql(q.format(r="de"))) == [("b",)]  # de matches de-CH
    assert rows(lang_graph.sparql(q.format(r="*"))) == [("a",), ("b",)]


def test_sameterm(lang_graph):
    out = rows(lang_graph.sparql(
        """SELECT ?x WHERE { ?x <label> ?l . ?x <alt> ?m .
             FILTER(SAMETERM(?l, ?m)) }"""
    ))
    assert out == [("a",)]


def test_iri_constructor_and_hash_functions(g):
    out = rows(g.sparql(
        """SELECT ?u ?h WHERE {
             ?x <city> <zurich> . ?x <likes> ?f .
             BIND(IRI(CONCAT("food:", STR(?f))) AS ?u)
             BIND(SHA256(STR(?f)) AS ?h) }"""
    ))
    import hashlib
    expect = sorted(
        (f"food:{f}", hashlib.sha256(f.encode()).hexdigest())
        for f in ("pizza", "sushi")
    )
    assert out == expect


def test_datetime_accessors(lang_graph):
    out = rows(lang_graph.sparql(
        """SELECT ?x ?h ?mi ?sec ?tz WHERE {
             ?x <when> ?w .
             BIND(HOURS(?w) AS ?h) BIND(MINUTES(?w) AS ?mi)
             BIND(SECONDS(?w) AS ?sec) BIND(TZ(?w) AS ?tz) }"""
    ))
    assert out == [
        ("e", 14.0, 45.0, 13.815, "-05:00"),
        ("f", 3.0, 4.0, 5.0, "Z"),
    ]


def test_timezone_duration(lang_graph):
    out = rows(lang_graph.sparql(
        """SELECT ?x ?d WHERE { ?x <when> ?w . BIND(TIMEZONE(?w) AS ?d) }"""
    ))
    assert out == [("e", "-PT5H"), ("f", "PT0S")]


def test_uuid_strdt_strlang(g):
    out = g.sparql(
        """SELECT ?u ?su ?t WHERE {
             ?x <city> <bern> .
             BIND(UUID() AS ?u) BIND(STRUUID() AS ?su)
             BIND(STRLEN(STR(?x)) AS ?t) }"""
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["u"].startswith("urn:uuid:") and len(r["su"]) == 36
    # STRDT/STRLANG produce typed terms visible through DATATYPE/LANG
    out2 = rows(g.sparql(
        """SELECT ?dt ?lg WHERE {
             ?x <city> <bern> . ?x <age> ?a .
             BIND(DATATYPE(STRDT(STR(?a), IRI("http://www.w3.org/2001/XMLSchema#integer"))) AS ?dt)
             BIND(LANG(STRLANG(STR(?x), "en")) AS ?lg) }"""
    ))
    assert out2 == [
        ("http://www.w3.org/2001/XMLSchema#integer", "en"),
    ] * 2


def test_property_path_forms(g):
    """Sequence /, alternation |, optional ?, inverse ^ (round-2
    extension; reference throws on all paths)."""
    # knows cycle: alice->bob->carol->alice
    assert rows(g.sparql(
        "SELECT ?f WHERE { <alice> <knows>/<likes> ?f . }"
    )) == [("sushi",)]  # alice knows bob, bob likes sushi
    assert rows(g.sparql(
        "SELECT ?v WHERE { <bob> <likes>|<city> ?v . }"
    )) == [("sushi",), ("zurich",)]
    assert rows(g.sparql(
        "SELECT ?y WHERE { <carol> ^<knows> ?y . }"
    )) == [("bob",)]
    # zero-or-one over knows from alice: alice itself + bob
    assert rows(g.sparql(
        "SELECT ?y WHERE { <alice> <knows>? ?y . }"
    )) == [("alice",), ("bob",)]
    # closure still works through the general tree: whole cycle
    assert rows(g.sparql(
        "SELECT ?y WHERE { <alice> <knows>+ ?y . }"
    )) == [("alice",), ("bob",), ("carol",)]
    # inverse sequence combo
    assert rows(g.sparql(
        "SELECT ?y WHERE { <bob> (^<knows>)/<likes> ?y . }"
    )) == [("pizza",)]


def test_negated_property_set(g):
    # everything alice relates to EXCEPT via knows/likes
    assert rows(g.sparql(
        "SELECT ?v WHERE { <alice> !(<knows>|<likes>) ?v . }"
    )) == [("30",), ("alice@x.org",), ("zurich",)]
    # single negated predicate
    got = rows(g.sparql("SELECT ?v WHERE { <dave> !<city> ?v . }"))
    assert got == [("9",)]
    # inverse member: who points AT zurich with anything but city
    assert rows(g.sparql(
        "SELECT ?v WHERE { <zurich> !(^<city>) ?v . }"
    )) == []


def test_path_quantifiers(g):
    # knows cycle alice->bob->carol->alice
    assert rows(g.sparql(
        "SELECT ?y WHERE { <alice> <knows>{2} ?y . }"
    )) == [("carol",)]
    assert rows(g.sparql(
        "SELECT ?y WHERE { <alice> <knows>{1,2} ?y . }"
    )) == [("bob",), ("carol",)]
    # unbounded lower-bounded: length >= 2 around the 3-cycle
    assert rows(g.sparql(
        "SELECT ?y WHERE { <alice> <knows>{2,} ?y . }"
    )) == [("alice",), ("bob",), ("carol",)]
    # {0,1} == ? (zero-length binds the node itself)
    assert rows(g.sparql(
        "SELECT ?y WHERE { <alice> <knows>{0,1} ?y . }"
    )) == [("alice",), ("bob",)]


# ---------------------------------------------------------------------
# XSD constructor casts + custom function IRIs (SPARQL §17.5; the
# reference gets both from ARQ via Jena, build.sbt:25-26)
# ---------------------------------------------------------------------

PFX = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"


def test_xsd_integer_cast_truncates(g):
    df = g.sparql(
        PFX + """SELECT ?x ?i WHERE {
            ?x <age> ?a . BIND(xsd:integer(?a / 2) AS ?i) }"""
    )
    got = {(r["x"], r["i"]) for r in df.collect()}
    # bound vars carry the VALUE form; 25/2=12.5 -> 12 (truncation
    # toward zero per XPath casting), and the numeric view stays
    # integral (15, not 15.0)
    assert got == {("alice", 15), ("bob", 12), ("carol", 17), ("dave", 4)}


def test_xsd_double_cast_in_filter(g):
    df = g.sparql(
        PFX + "SELECT ?x WHERE { ?x <age> ?a . FILTER(xsd:double(?a) > 26.0) }"
    )
    assert {r["x"] for r in df.collect()} == {"alice", "carol"}


def test_xsd_boolean_and_string_casts(g):
    df = g.sparql(
        PFX + """SELECT ?x WHERE {
            ?x <age> ?a . FILTER(xsd:boolean(?a)) }"""
    )
    # every age is a nonzero number -> true
    assert df.count() == 4
    df2 = g.sparql(
        PFX + """SELECT ?s WHERE {
            ?x <age> ?a . BIND(xsd:string(?a) AS ?s)
            FILTER(STRLEN(?s) = 2) }"""
    )
    # ages 30/25/35 are two chars; dave's "9" is one
    assert df2.count() == 3


def test_xsd_datetime_cast(spark):
    gr = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [("ev1", "at", "2024-03-01T12:30:00"), ("ev2", "at", "bogus")],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    df = gr.sparql(
        PFX + """SELECT ?x ?t WHERE {
            ?x <at> ?w . BIND(xsd:dateTime(?w) AS ?t) }"""
    )
    got = dict((r["x"], r["t"]) for r in df.collect())
    assert got["ev1"] == "2024-03-01T12:30:00"
    # invalid lexical form -> expression error -> unbound
    assert got["ev2"] is None


def test_custom_function_registry(g):
    from pyspark.sql import functions as F

    from graphula_spark.sparql.compiler import (
        CE,
        register_function,
        unregister_function,
    )

    iri = "http://example.org/fn#shout"
    register_function(iri, lambda args: CE(F.upper(args[0].val)))
    try:
        df = g.sparql(
            f"""SELECT ?u WHERE {{
                ?x <likes> ?f . BIND(<{iri}>(?f) AS ?u) }}"""
        )
        assert {r["u"] for r in df.collect()} == {"PIZZA", "SUSHI"}
    finally:
        unregister_function(iri)


def test_unregistered_function_iri_raises(g):
    with pytest.raises(NotImplementedError):
        g.sparql(
            "SELECT ?u WHERE { ?x <likes> ?f . "
            "BIND(<http://example.org/fn#nope>(?f) AS ?u) }"
        ).collect()


def test_zero_length_path_strict_mode(spark):
    """`<p>?` identity domain: incident nodes by default, ALL graph
    nodes under strict mode (SPARQL 1.1 spec domain)."""
    gr = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [
                ("a", "p", "b"),
                # c/d touch only predicate q — outside p's incident set
                ("c", "q", "d"),
            ],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    q = "SELECT ?x ?y WHERE { ?x <p>? ?y }"
    default = {(r["x"], r["y"]) for r in gr.sparql(q).collect()}
    assert default == {("a", "b"), ("a", "a"), ("b", "b")}

    gr.strict_zero_length_paths = True
    strict = {(r["x"], r["y"]) for r in gr.sparql(q).collect()}
    assert strict == {
        ("a", "b"), ("a", "a"), ("b", "b"), ("c", "c"), ("d", "d"),
    }


class TestNamedGraphs:
    """GRAPH clause over a quad Dataset (SPARQL 1.1 §13.3) — extension;
    the reference's store is triples-only."""

    @staticmethod
    def _dataset(spark):
        from graphula_spark.dataset import Dataset

        rows = [
            ("http://ex/a", "http://ex/knows", "http://ex/b", "http://ex/g1"),
            ("http://ex/b", "http://ex/knows", "http://ex/c", "http://ex/g1"),
            ("http://ex/a", "http://ex/knows", "http://ex/d", "http://ex/g2"),
            ("http://ex/x", "http://ex/type", '"lit"', None),
        ]
        return Dataset.from_string_quads(
            spark, spark.createDataFrame(rows, ["s", "p", "o", "g"])
        )

    def test_default_graph_excludes_named(self, spark):
        ds = self._dataset(spark)
        r = ds.sparql("SELECT ?s ?o WHERE { ?s ?p ?o }").collect()
        assert sorted((x["s"], x["o"]) for x in r) == [
            ("http://ex/x", '"lit"')
        ]

    def test_graph_iri_scopes_patterns(self, spark):
        ds = self._dataset(spark)
        r = ds.sparql(
            "SELECT ?s ?o WHERE { GRAPH <http://ex/g1> "
            "{ ?s <http://ex/knows> ?o } }"
        ).collect()
        assert sorted((x["s"], x["o"]) for x in r) == [
            ("http://ex/a", "http://ex/b"),
            ("http://ex/b", "http://ex/c"),
        ]

    def test_graph_var_enumerates_and_binds(self, spark):
        ds = self._dataset(spark)
        r = ds.sparql(
            "SELECT ?g ?s WHERE { GRAPH ?g { ?s <http://ex/knows> ?o } }"
        ).collect()
        assert sorted((x["g"], x["s"]) for x in r) == [
            ("http://ex/g1", "http://ex/a"),
            ("http://ex/g1", "http://ex/b"),
            ("http://ex/g2", "http://ex/a"),
        ]

    def test_cross_graph_join(self, spark):
        ds = self._dataset(spark)
        r = ds.sparql(
            """SELECT ?s ?o2 WHERE {
                 GRAPH <http://ex/g1> { ?s <http://ex/knows> ?o }
                 GRAPH <http://ex/g2> { ?s <http://ex/knows> ?o2 } }"""
        ).collect()
        assert [(x["s"], x["o2"]) for x in r] == [
            ("http://ex/a", "http://ex/d")
        ]

    def test_unknown_graph_is_empty(self, spark):
        ds = self._dataset(spark)
        assert (
            ds.sparql(
                "SELECT ?s WHERE { GRAPH <http://ex/nope> { ?s ?p ?o } }"
            ).count()
            == 0
        )

    def test_union_graph_merges_all(self, spark):
        ds = self._dataset(spark)
        assert ds.union_graph().triples.count() == 4

    def test_graph_on_plain_store_raises(self, spark):
        import pytest

        from graphula_spark.graph import Graph

        g = Graph.from_string_triples(
            spark,
            spark.createDataFrame([("s", "p", "o")], ["s", "p", "o"]),
            cache=False,
        )
        with pytest.raises(NotImplementedError, match="quad dataset"):
            g.sparql("SELECT ?s WHERE { GRAPH ?g { ?s ?p ?o } }").collect()

    def test_nquads_file_roundtrip(self, spark, tmp_path):
        from graphula_spark.dataset import Dataset

        f = tmp_path / "d.nq"
        f.write_text(
            "<http://ex/s> <http://ex/p> <http://ex/o> <http://ex/g> .\n"
            '<http://ex/s> <http://ex/p> "v" .\n'
        )
        ds = Dataset.from_nquads(spark, str(f))
        assert ds.graph_names() == [
            ("http://ex/g", ds.graph_names()[0][1])
        ]
        assert ds.default_graph.triples.count() == 1
        assert ds.graph("http://ex/g").triples.count() == 1


class TestDatasetClauses:
    """FROM / FROM NAMED (SPARQL 1.1 §13.2) over a quad Dataset."""

    @staticmethod
    def _dataset(spark):
        from graphula_spark.dataset import Dataset

        rows = [
            ("http://ex/a", "http://ex/p", "http://ex/b", "http://ex/g1"),
            ("http://ex/c", "http://ex/p", "http://ex/d", "http://ex/g2"),
            # same triple in both graphs: FROM merge must dedup
            ("http://ex/a", "http://ex/p", "http://ex/b", "http://ex/g2"),
            ("http://ex/x", "http://ex/p", "http://ex/y", None),
        ]
        return Dataset.from_string_quads(
            spark, spark.createDataFrame(rows, ["s", "p", "o", "g"])
        )

    def test_from_merges_named_graphs(self, spark):
        ds = self._dataset(spark)
        r = ds.sparql(
            "SELECT ?s ?o FROM <http://ex/g1> FROM <http://ex/g2> "
            "WHERE { ?s <http://ex/p> ?o }"
        ).collect()
        assert sorted((x["s"], x["o"]) for x in r) == [
            ("http://ex/a", "http://ex/b"),
            ("http://ex/c", "http://ex/d"),
        ]

    def test_from_replaces_store_default_graph(self, spark):
        ds = self._dataset(spark)
        r = ds.sparql(
            "SELECT ?s FROM <http://ex/g1> WHERE { ?s <http://ex/p> ?o }"
        ).collect()
        assert [x["s"] for x in r] == ["http://ex/a"]

    def test_from_named_restricts_graph_var(self, spark):
        ds = self._dataset(spark)
        r = ds.sparql(
            "SELECT ?g ?s FROM NAMED <http://ex/g2> "
            "WHERE { GRAPH ?g { ?s <http://ex/p> ?o } }"
        ).collect()
        assert sorted((x["g"], x["s"]) for x in r) == [
            ("http://ex/g2", "http://ex/a"),
            ("http://ex/g2", "http://ex/c"),
        ]

    def test_from_named_hides_unlisted_graph_iri(self, spark):
        ds = self._dataset(spark)
        assert (
            ds.sparql(
                "SELECT ?s FROM NAMED <http://ex/g2> "
                "WHERE { GRAPH <http://ex/g1> { ?s ?p ?o } }"
            ).count()
            == 0
        )

    def test_from_without_named_empties_graph_enumeration(self, spark):
        ds = self._dataset(spark)
        assert (
            ds.sparql(
                "SELECT ?g FROM <http://ex/g1> WHERE { GRAPH ?g { ?s ?p ?o } }"
            ).count()
            == 0
        )

    def test_ask_with_from(self, spark):
        ds = self._dataset(spark)
        r = ds.sparql(
            "ASK FROM <http://ex/g2> { <http://ex/c> <http://ex/p> ?o }"
        ).collect()
        assert r[0]["ask"] is True


def test_dataset_save_load_roundtrip(spark, tmp_path):
    from graphula_spark.dataset import Dataset

    rows = [
        ("http://ex/a", "http://ex/p", "http://ex/b", "http://ex/g1"),
        ("http://ex/c", "http://ex/p", "http://ex/d", "http://ex/g2"),
        ("http://ex/x", "http://ex/p", "http://ex/y", None),
    ]
    ds = Dataset.from_string_quads(
        spark, spark.createDataFrame(rows, ["s", "p", "o", "g"])
    )
    path = str(tmp_path / "dsstore")
    ds.save(path)
    back = Dataset.load(spark, path)
    assert sorted(n for n, _ in back.graph_names()) == [
        "http://ex/g1", "http://ex/g2",
    ]
    r = back.sparql(
        "SELECT ?g ?s WHERE { GRAPH ?g { ?s <http://ex/p> ?o } }"
    ).collect()
    assert sorted((x["g"], x["s"]) for x in r) == [
        ("http://ex/g1", "http://ex/a"),
        ("http://ex/g2", "http://ex/c"),
    ]
    assert back.default_graph.triples.count() == 1
    # the persisted union graph is loadable as a plain triple store too
    from graphula_spark.graph import Graph

    assert Graph.load(spark, path).triples.count() == 3


class TestDatasetUpdate:
    """Quad-aware SPARQL Update: GRAPH blocks in INSERT/DELETE DATA,
    CLEAR forms, ADD/COPY/MOVE (SPARQL 1.1 Update §3.1-3.2)."""

    @staticmethod
    def _dataset(spark):
        from pyspark.sql.types import StringType, StructField, StructType

        from graphula_spark.dataset import Dataset

        sch = StructType(
            [StructField(c, StringType(), True) for c in ("s", "p", "o", "g")]
        )
        return Dataset.from_string_quads(
            spark,
            spark.createDataFrame(
                [("http://ex/s", "http://ex/p", "http://ex/o", None)], sch
            ),
        )

    def test_insert_delete_with_graph_blocks(self, spark):
        ds = self._dataset(spark)
        ds2 = ds.update(
            """INSERT DATA {
                 <http://ex/d1> <http://ex/p> "v" .
                 GRAPH <http://ex/g1> {
                   <http://ex/a> <http://ex/p> <http://ex/b> .
                   <http://ex/b> <http://ex/p> <http://ex/c> . } }"""
        )
        assert ds2.default_graph.triples.count() == 2
        assert ds2.graph("http://ex/g1").triples.count() == 2
        ds3 = ds2.update(
            "DELETE DATA { GRAPH <http://ex/g1> "
            "{ <http://ex/b> <http://ex/p> <http://ex/c> . } }"
        )
        assert ds3.graph("http://ex/g1").triples.count() == 1
        # default graph untouched by the graph-scoped delete
        assert ds3.default_graph.triples.count() == 2

    def test_add_copy_move_clear(self, spark):
        ds = self._dataset(spark).update(
            """INSERT DATA {
                 GRAPH <http://ex/g1> {
                   <http://ex/a> <http://ex/p> <http://ex/b> . }
                 GRAPH <http://ex/g2> {
                   <http://ex/a> <http://ex/p> <http://ex/z> . } }"""
        )
        added = ds.update("ADD GRAPH <http://ex/g1> TO GRAPH <http://ex/g2>")
        assert added.graph("http://ex/g2").triples.count() == 2
        # COPY clears the destination first (spec §3.2.4)
        copied = added.update("COPY GRAPH <http://ex/g1> TO GRAPH <http://ex/g2>")
        assert copied.graph("http://ex/g2").triples.count() == 1
        # MOVE clears destination AND source (spec §3.2.5)
        moved = added.update("MOVE GRAPH <http://ex/g2> TO DEFAULT")
        assert moved.default_graph.triples.count() == 2
        assert moved.graph("http://ex/g2").triples.count() == 0
        cleared = moved.update("CLEAR NAMED")
        assert cleared.graph_names() == []
        assert cleared.default_graph.triples.count() == 2
        assert moved.update("CLEAR ALL").quads.count() == 0


def test_sparql_results_serialization(spark):
    import json

    from graphula_spark.graph import Graph
    from graphula_spark.sparql.results import (
        ask_to_json,
        to_sparql_csv,
        to_sparql_json,
    )

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [
                ("http://ex/a", "http://ex/name", '"Ann"@en'),
                ("http://ex/a", "http://ex/age",
                 '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'),
                ("_:b0", "http://ex/name", '"Bee"'),
            ],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    df = g.sparql(
        "SELECT ?s ?v WHERE { ?s <http://ex/name> ?v } ORDER BY ?v"
    )
    doc = json.loads(to_sparql_json(df))
    assert doc["head"]["vars"] == ["s", "v"]
    bindings = doc["results"]["bindings"]
    assert bindings[0]["s"] == {"type": "uri", "value": "http://ex/a"}
    assert bindings[0]["v"] == {
        "type": "literal", "value": "Ann", "xml:lang": "en",
    }
    assert bindings[1]["s"]["type"] == "bnode"
    assert bindings[1]["v"] == {"type": "literal", "value": "Bee"}

    df2 = g.sparql("SELECT ?v WHERE { <http://ex/a> <http://ex/age> ?v }")
    doc2 = json.loads(to_sparql_json(df2))
    assert doc2["results"]["bindings"][0]["v"] == {
        "type": "literal", "value": "42",
        "datatype": "http://www.w3.org/2001/XMLSchema#integer",
    }

    csv_text = to_sparql_csv(df)
    lines = csv_text.strip().split("\r\n")
    assert lines[0] == "s,v"
    assert lines[1] == "http://ex/a,Ann"

    assert json.loads(ask_to_json(True)) == {"head": {}, "boolean": True}

    # XML results format round-trips through a real XML parser
    import xml.etree.ElementTree as ET

    from graphula_spark.sparql.results import (
        ask_to_xml,
        to_sparql_tsv,
        to_sparql_xml,
    )

    ns = {"sr": "http://www.w3.org/2005/sparql-results#"}
    root = ET.fromstring(to_sparql_xml(df))
    names = [v.get("name") for v in root.findall("sr:head/sr:variable", ns)]
    assert names == ["s", "v"]
    results = root.findall("sr:results/sr:result", ns)
    assert len(results) == 2
    b0 = {b.get("name"): b for b in results[0].findall("sr:binding", ns)}
    assert b0["s"].find("sr:uri", ns).text == "http://ex/a"
    lit = b0["v"].find("sr:literal", ns)
    assert lit.text == "Ann"
    assert lit.get("{http://www.w3.org/XML/1998/namespace}lang") == "en"
    b1 = {b.get("name"): b for b in results[1].findall("sr:binding", ns)}
    assert b1["s"].find("sr:bnode", ns) is not None
    xml2 = to_sparql_xml(df2)
    lit2 = ET.fromstring(xml2).find(
        "sr:results/sr:result/sr:binding/sr:literal", ns
    )
    assert lit2.text == "42"
    assert lit2.get("datatype").endswith("#integer")
    ask_root = ET.fromstring(ask_to_xml(True))
    assert ask_root.find("sr:boolean", ns).text == "true"

    # TSV keeps full Turtle term syntax (unlike CSV's bare lexical forms)
    tsv = to_sparql_tsv(df).split("\n")
    assert tsv[0] == "?s\t?v"
    assert tsv[1] == '<http://ex/a>\t"Ann"@en'
    assert tsv[2].startswith("_:")
    tsv2 = to_sparql_tsv(df2).split("\n")
    assert tsv2[1] == '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'


def test_trailing_values_clause(spark):
    """Trailing VALUES (SPARQL 1.1 §18.2.4.2) joins the query solutions
    — previously parsed but silently ignored."""
    from graphula_spark.graph import Graph

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [("a", "p", "1"), ("b", "p", "2"), ("c", "p", "3")],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    r = g.sparql(
        "SELECT ?s WHERE { ?s <p> ?o } VALUES ?s { <a> <b> }"
    ).collect()
    assert sorted(x["s"] for x in r) == ["a", "b"]
    # joins AFTER aggregation per spec: the group for c is computed then
    # filtered out by the join, not excluded from grouping
    r2 = g.sparql(
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <p> ?o } "
        "GROUP BY ?s VALUES ?s { <a> }"
    ).collect()
    assert [(x["s"], x["n"]) for x in r2] == [("a", 1)]


def test_parser_rejects_trailing_garbage(spark):
    import pytest

    from graphula_spark.sparql.parser import parse_sparql

    with pytest.raises(SyntaxError, match="trailing input"):
        parse_sparql("SELECT ?s WHERE { ?s <p> ?o } THEN SOME GARBAGE")


def test_multiple_having_conditions(spark):
    from graphula_spark.graph import Graph

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [("a", "p", "1"), ("a", "p", "2"), ("b", "p", "3"),
             ("c", "p", "4"), ("c", "p", "5"), ("c", "p", "6")],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    # a has 2, b has 1, c has 3 → only a satisfies (n > 1) AND (n < 3)
    r = g.sparql(
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <p> ?o } "
        "GROUP BY ?s HAVING (?n > 1) (?n < 3)"
    ).collect()
    assert [(x["s"], x["n"]) for x in r] == [("a", 2)]


def test_construct_describe_limit(spark):
    from graphula_spark.graph import Graph

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [("a", "p", str(i)) for i in range(10)], ["s", "p", "o"]
        ),
        cache=False,
    )
    assert (
        g.sparql(
            "CONSTRUCT { ?s <q> ?o } WHERE { ?s <p> ?o } LIMIT 3"
        ).count()
        == 3
    )
    assert g.sparql("DESCRIBE <a> LIMIT 4").count() == 4


def test_order_by_aggregate_and_bare_subselect(spark):
    """ARQ-parity corners: aggregate expressions in ORDER BY (hoisted
    to hidden agg columns) and a SubSelect directly inside WHERE's
    braces (GroupGraphPattern ::= '{' SubSelect '}')."""
    from graphula_spark.graph import Graph

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [("a", "p", "x"), ("a", "p", "y"), ("b", "p", "x"),
             ("c", "q", "z")],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    rows = g.sparql(
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <p> ?o } "
        "GROUP BY ?s ORDER BY DESC(COUNT(?o)) ?s"
    ).collect()
    assert [tuple(r) for r in rows] == [("a", 2), ("b", 1)]

    # ORDER BY aggregate that is NOT in the projection
    rows = g.sparql(
        "SELECT ?s WHERE { ?s ?p ?o } GROUP BY ?s ORDER BY DESC(COUNT(*)) ?s"
    ).collect()
    assert [r["s"] for r in rows] == ["a", "b", "c"]

    # bare subselect inside WHERE + outer aggregate over it
    rows = g.sparql(
        "SELECT (AVG(?n) AS ?avg_n) WHERE "
        "{ SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s }"
    ).collect()
    assert abs(rows[0]["avg_n"] - 4 / 3) < 1e-9


class TestAggregateExpressions:
    """Aggregates nested inside combining projection expressions —
    SPARQL 1.1 allows arbitrary expressions over aggregates in SELECT."""

    @pytest.fixture()
    def g(self, spark):
        from graphula_spark.graph import Graph

        return Graph.from_string_triples(
            spark,
            spark.createDataFrame(
                [("a", "p", "1"), ("a", "q", "x"), ("b", "p", "2"), ("c", "p", "3")],
                ["s", "p", "o"],
            ),
        )

    def test_sum_plus_count_implicit_group(self, g):
        r = g.sparql(
            "SELECT (SUM(?v) + COUNT(?v) AS ?t) WHERE { ?x <p> ?v }"
        ).collect()
        assert [row["t"] for row in r] == [9.0]

    def test_combined_aggregates_per_group(self, g):
        r = g.sparql(
            """SELECT ?x (SUM(?v) * 2 + COUNT(?v) AS ?t)
               WHERE { ?x <p> ?v } GROUP BY ?x ORDER BY ?x"""
        ).collect()
        assert [(row["x"], row["t"]) for row in r] == [
            ("a", 3.0), ("b", 5.0), ("c", 7.0),
        ]

    def test_conditional_over_aggregate(self, g):
        r = g.sparql(
            'SELECT (IF(COUNT(?v) > 2, "many", "few") AS ?k) WHERE { ?x <p> ?v }'
        ).collect()
        assert [row["k"] for row in r] == ["many"]


class TestDescribeCbd:
    def test_describe_follows_blank_node_closure(self, spark):
        from graphula_spark.graph import Graph

        g = Graph.from_string_triples(
            spark,
            spark.createDataFrame(
                [
                    ("a", "addr", "_:b1"),
                    ("_:b1", "street", '"Main"'),
                    ("_:b1", "city", "_:b2"),
                    ("_:b2", "name", '"Springfield"'),
                    ("a", "knows", "b"),
                    ("b", "name", '"Bob"'),
                ],
                ["s", "p", "o"],
            ),
        )
        rows = {(r["s"], r["p"], r["o"]) for r in g.sparql("DESCRIBE <a>").collect()}
        # outgoing edges of <a> plus the anonymous structure they reach
        assert ("a", "addr", "_:b1") in rows
        assert ("_:b1", "street", '"Main"') in rows
        assert ("_:b2", "name", '"Springfield"') in rows
        # named neighbors are NOT expanded (CBD stops at IRIs)
        assert ("b", "name", '"Bob"') not in rows
        assert len(rows) == 5


class TestService:
    """In-process SERVICE federation (SPARQL 1.1 §13): the IRI resolves
    to another loaded Graph via sparql.service's registry; the group
    executes there and joins back as a value-materialized solution."""

    @staticmethod
    def _graphs(spark):
        from graphula_spark.graph import Graph

        local = Graph.from_string_triples(
            spark,
            spark.createDataFrame(
                [
                    ("alice", "worksFor", "acme"),
                    ("bob", "worksFor", "initech"),
                    ("carol", "worksFor", "acme"),
                ],
                ["s", "p", "o"],
            ),
        )
        remote = Graph.from_string_triples(
            spark,
            spark.createDataFrame(
                [
                    ("acme", "locatedIn", "berlin"),
                    ("initech", "locatedIn", "austin"),
                    ("globex", "locatedIn", "tokyo"),
                ],
                ["s", "p", "o"],
            ),
        )
        return local, remote

    def test_service_join_across_datasets(self, spark):
        from graphula_spark.sparql.service import (
            register_service,
            unregister_service,
        )

        local, remote = self._graphs(spark)
        register_service("http://example.org/hq", remote)
        try:
            rows = {
                (r["who"], r["city"])
                for r in local.sparql(
                    """
                    SELECT ?who ?city WHERE {
                      ?who <worksFor> ?org .
                      SERVICE <http://example.org/hq> {
                        ?org <locatedIn> ?city .
                      }
                    }"""
                ).collect()
            }
        finally:
            unregister_service("http://example.org/hq")
        assert rows == {
            ("alice", "berlin"),
            ("carol", "berlin"),
            ("bob", "austin"),
        }

    def test_service_only_vars_decode_with_service_dictionary(self, spark):
        """A var bound ONLY inside SERVICE must come back as the remote
        graph's term string even when the local dictionary has never
        seen it."""
        from graphula_spark.sparql.service import (
            register_service,
            unregister_service,
        )

        local, remote = self._graphs(spark)
        register_service("http://example.org/hq", remote)
        try:
            cities = {
                r["city"]
                for r in local.sparql(
                    """
                    SELECT ?city WHERE {
                      SERVICE <http://example.org/hq> {
                        ?org <locatedIn> ?city .
                      }
                    }"""
                ).collect()
            }
        finally:
            unregister_service("http://example.org/hq")
        assert cities == {"berlin", "austin", "tokyo"}

    def test_unregistered_service_raises(self, spark):
        import pytest as _pytest

        local, _ = self._graphs(spark)
        with _pytest.raises(NotImplementedError, match="no in-process"):
            local.sparql(
                """
                SELECT ?x WHERE {
                  SERVICE <http://nowhere.example/> { ?x <p> ?y . }
                }"""
            ).collect()

    def test_silent_unregistered_is_unit(self, spark):
        """SERVICE SILENT over a missing endpoint yields the unit
        solution: the rest of the query is unaffected."""
        local, _ = self._graphs(spark)
        rows = {
            r["who"]
            for r in local.sparql(
                """
                SELECT ?who WHERE {
                  ?who <worksFor> ?org .
                  SERVICE SILENT <http://nowhere.example/> {
                    ?org <locatedIn> ?city .
                  }
                }"""
            ).collect()
        }
        assert rows == {"alice", "bob", "carol"}

    def test_variable_endpoint_rejected(self, spark):
        import pytest as _pytest

        local, _ = self._graphs(spark)
        with _pytest.raises(NotImplementedError, match="variable endpoint"):
            local.sparql(
                "SELECT ?x WHERE { SERVICE ?ep { ?x <p> ?y . } }"
            )

    def test_service_against_dataset(self, spark):
        """A registered Dataset serves its default graph, and GRAPH
        clauses inside SERVICE see its named graphs."""
        from graphula_spark.dataset import Dataset
        from graphula_spark.sparql.service import (
            register_service,
            unregister_service,
        )

        local, _ = self._graphs(spark)
        ds = Dataset.from_string_quads(
            spark,
            spark.createDataFrame(
                [
                    ("acme", "locatedIn", "berlin", None),
                    ("initech", "locatedIn", "austin", "http://g/extra"),
                ],
                ["s", "p", "o", "g"],
            ),
        )
        register_service("http://example.org/ds", ds)
        try:
            rows = {
                (r["org"], r["city"])
                for r in local.sparql(
                    """
                    SELECT ?org ?city WHERE {
                      SERVICE <http://example.org/ds> {
                        { ?org <locatedIn> ?city . }
                        UNION
                        { GRAPH <http://g/extra> { ?org <locatedIn> ?city . } }
                      }
                    }"""
                ).collect()
            }
        finally:
            unregister_service("http://example.org/ds")
        assert rows == {("acme", "berlin"), ("initech", "austin")}


class TestServiceTransport:
    """Injectable SERVICE transport: the no-network policy stays, but a
    caller-supplied fetch(endpoint, query_text) -> rows callable
    enables real federation outside the sandbox. The compiler hands it
    the group's VERBATIM SPARQL text with the query's prefixes
    prepended and joins the returned term-string solutions."""

    LOCAL = [
        ("alice", "worksFor", "acme"),
        ("bob", "worksFor", "initech"),
    ]

    def _local(self, spark):
        from graphula_spark.graph import Graph

        return Graph.from_string_triples(
            spark, spark.createDataFrame(self.LOCAL, ["s", "p", "o"])
        )

    def test_transport_receives_verbatim_query_and_joins(self, spark):
        from graphula_spark.sparql.service import (
            register_service,
            unregister_service,
        )

        calls = []

        def fetch(endpoint, query):
            calls.append((endpoint, query))
            return [
                {"org": "acme", "city": "berlin"},
                {"org": "initech", "city": "austin"},
                {"org": "globex", "city": "tokyo"},
            ]

        local = self._local(spark)
        register_service("http://remote.example/sparql", fetch)
        try:
            rows = {
                (r["who"], r["city"])
                for r in local.sparql(
                    """
                    PREFIX ex: <http://example.org/>
                    SELECT ?who ?city WHERE {
                      ?who <worksFor> ?org .
                      SERVICE <http://remote.example/sparql> {
                        ?org <locatedIn> ?city .
                      }
                    }"""
                ).collect()
            }
        finally:
            unregister_service("http://remote.example/sparql")
        assert rows == {("alice", "berlin"), ("bob", "austin")}
        (endpoint, query), = calls
        assert endpoint == "http://remote.example/sparql"
        # verbatim group text with the prologue's prefixes prepended
        assert query.startswith("PREFIX ex: <http://example.org/>")
        assert "SELECT * WHERE {" in query
        assert "?org <locatedIn> ?city ." in query

    def test_default_transport_covers_unregistered_endpoints(self, spark):
        from graphula_spark.sparql.service import (
            clear_services,
            set_default_transport,
        )

        local = self._local(spark)
        set_default_transport(lambda ep, q: [{"org": "acme", "city": "berlin"}])
        try:
            got = {
                (r["who"], r["city"])
                for r in local.sparql(
                    """SELECT ?who ?city WHERE {
                         ?who <worksFor> ?org .
                         SERVICE <http://anywhere.example/> {
                           ?org <locatedIn> ?city . } }"""
                ).collect()
            }
        finally:
            clear_services()
        assert got == {("alice", "berlin")}

    def test_silent_swallows_transport_failure(self, spark):
        from graphula_spark.sparql.service import (
            register_service,
            unregister_service,
        )

        def boom(ep, q):
            raise RuntimeError("connection refused")

        local = self._local(spark)
        register_service("http://down.example/", boom)
        try:
            rows = {
                r["who"]
                for r in local.sparql(
                    """SELECT ?who WHERE {
                         ?who <worksFor> ?org .
                         SERVICE SILENT <http://down.example/> {
                           ?org <locatedIn> ?city . } }"""
                ).collect()
            }
            # non-SILENT propagates
            import pytest as _pt

            with _pt.raises(Exception, match="connection refused"):
                local.sparql(
                    """SELECT ?who WHERE {
                         ?who <worksFor> ?org .
                         SERVICE <http://down.example/> {
                           ?org <locatedIn> ?city . } }"""
                ).collect()
        finally:
            unregister_service("http://down.example/")
        assert rows == {"alice", "bob"}

    def test_transport_empty_result_empties_join(self, spark):
        from graphula_spark.sparql.service import (
            register_service,
            unregister_service,
        )

        local = self._local(spark)
        register_service("http://empty.example/", lambda ep, q: [])
        try:
            got = local.sparql(
                """SELECT ?who WHERE {
                     ?who <worksFor> ?org .
                     SERVICE <http://empty.example/> {
                       ?org <locatedIn> ?city . } }"""
            ).collect()
        finally:
            unregister_service("http://empty.example/")
        assert got == []


class TestHttpService:
    """Real HTTP federation over the injectable-transport seam:
    http_transport POSTs the SERVICE group to a SPARQL 1.1 Protocol
    endpoint and parses SPARQL JSON results back into storage-form
    terms. Driven against an in-process localhost stub (stdlib
    http.server) — no external network."""

    RESULTS = {
        "head": {"vars": ["org", "city", "motto"]},
        "results": {
            "bindings": [
                {
                    "org": {"type": "uri", "value": "acme"},
                    "city": {"type": "uri", "value": "berlin"},
                    "motto": {
                        "type": "literal",
                        "value": 'we "deliver"\nfast',
                        "xml:lang": "en",
                    },
                },
                {
                    "org": {"type": "uri", "value": "initech"},
                    "city": {"type": "uri", "value": "austin"},
                    # unbound motto: var absent from the binding
                },
            ]
        },
    }

    def _serve(self, status=200, body=None):
        """Start a one-shot threaded stub endpoint; returns (url,
        captured-requests list, shutdown-callable)."""
        import http.server
        import json as _json
        import threading

        captured = []
        results = self.RESULTS if body is None else body

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self_h):
                n = int(self_h.headers.get("Content-Length", 0))
                captured.append(
                    {
                        "body": self_h.rfile.read(n).decode(),
                        "accept": self_h.headers.get("Accept"),
                        "ctype": self_h.headers.get("Content-Type"),
                    }
                )
                payload = _json.dumps(results).encode()
                self_h.send_response(status)
                self_h.send_header(
                    "Content-Type", "application/sparql-results+json"
                )
                self_h.send_header("Content-Length", str(len(payload)))
                self_h.end_headers()
                self_h.wfile.write(payload)

            def log_message(self_h, *a):  # keep pytest output clean
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
        return url, captured, srv.shutdown

    def _local(self, spark):
        from graphula_spark.graph import Graph

        return Graph.from_string_triples(
            spark,
            spark.createDataFrame(
                [("alice", "worksFor", "acme"), ("bob", "worksFor", "initech")],
                ["s", "p", "o"],
            ),
        )

    def test_remote_solutions_join_over_http(self, spark):
        from graphula_spark.sparql.http import http_transport
        from graphula_spark.sparql.service import (
            register_service,
            unregister_service,
        )

        url, captured, shutdown = self._serve()
        local = self._local(spark)
        register_service(url, http_transport())
        try:
            rows = {
                tuple(r)
                for r in local.sparql(
                    f"""SELECT ?who ?city ?motto WHERE {{
                          ?who <worksFor> ?org .
                          SERVICE <{url}> {{ ?org <locatedIn> ?city . }}
                        }}"""
                ).collect()
            }
        finally:
            unregister_service(url)
            shutdown()
        assert rows == {
            ("alice", "berlin", '"we \\"deliver\\"\\nfast"@en'),
            ("bob", "austin", None),  # unbound var -> null
        }
        # the protocol request: form-encoded POST of the verbatim group,
        # asking for SPARQL JSON
        assert len(captured) == 1
        assert "query=" in captured[0]["body"]
        assert "locatedIn" in urllib_unquote(captured[0]["body"])
        assert captured[0]["accept"] == "application/sparql-results+json"
        assert "x-www-form-urlencoded" in captured[0]["ctype"]

    def test_silent_swallows_http_failure(self, spark):
        from graphula_spark.sparql.http import http_transport
        from graphula_spark.sparql.service import (
            register_service,
            unregister_service,
        )

        url, _, shutdown = self._serve(status=500)
        local = self._local(spark)
        register_service(url, http_transport())
        try:
            got = local.sparql(
                f"""SELECT ?who WHERE {{
                      ?who <worksFor> ?org .
                      SERVICE SILENT <{url}> {{ ?org <locatedIn> ?c . }}
                    }}"""
            ).count()
            import pytest

            with pytest.raises(Exception):
                local.sparql(
                    f"""SELECT ?who WHERE {{
                          ?who <worksFor> ?org .
                          SERVICE <{url}> {{ ?org <locatedIn> ?c . }}
                        }}"""
                ).count()
        finally:
            unregister_service(url)
            shutdown()
        assert got == 2  # unit solution: local rows pass through

    def test_max_bytes_breach_aborts_mid_body(self):
        """The byte guard fires DURING the chunked read (the body is
        abandoned the moment it crosses max_bytes), raising
        ServiceResponseTooLarge before the JSON parse — the real
        driver-memory guard (VERDICT r7 What's-wrong #1)."""
        import pytest

        from graphula_spark.sparql.http import (
            ServiceResponseTooLarge,
            http_transport,
        )

        # ~40 KB of bindings, comfortably over a 1 KiB cap
        big = {
            "head": {"vars": ["x"]},
            "results": {
                "bindings": [
                    {"x": {"type": "uri", "value": f"http://x/{i:06d}"}}
                    for i in range(800)
                ]
            },
        }
        url, _, shutdown = self._serve(body=big)
        try:
            with pytest.raises(ServiceResponseTooLarge, match="max_bytes"):
                http_transport(max_bytes=1024)(url, "SELECT * WHERE {}")
            # same body under the default cap parses fine
            rows = http_transport()(url, "SELECT * WHERE {}")
            assert len(rows) == 800
        finally:
            shutdown()

    def test_max_rows_breach_post_parse(self):
        """The row guard fires after parse, before the bindings reach
        the compiler: the stock 2-binding response breaches
        max_rows=1."""
        import pytest

        from graphula_spark.sparql.http import (
            ServiceResponseTooLarge,
            http_transport,
        )

        url, _, shutdown = self._serve()
        try:
            with pytest.raises(ServiceResponseTooLarge, match="max_rows"):
                http_transport(max_rows=1)(url, "SELECT * WHERE {}")
            assert len(http_transport(max_rows=2)(url, "SELECT * WHERE {}")) == 2
        finally:
            shutdown()

    def test_silent_swallows_oversized_response(self, spark):
        """Cross-layer contract (http.py docstring): under SERVICE
        SILENT a ServiceResponseTooLarge collapses to the unit
        solution like any transport failure; without SILENT it
        propagates to the caller."""
        import pytest

        from graphula_spark.sparql.http import (
            ServiceResponseTooLarge,
            http_transport,
        )
        from graphula_spark.sparql.service import (
            register_service,
            unregister_service,
        )

        url, _, shutdown = self._serve()  # stock body, ~hundreds of bytes
        local = self._local(spark)
        register_service(url, http_transport(max_bytes=64))
        try:
            got = local.sparql(
                f"""SELECT ?who WHERE {{
                      ?who <worksFor> ?org .
                      SERVICE SILENT <{url}> {{ ?org <locatedIn> ?c . }}
                    }}"""
            ).count()
            with pytest.raises(ServiceResponseTooLarge):
                local.sparql(
                    f"""SELECT ?who WHERE {{
                          ?who <worksFor> ?org .
                          SERVICE <{url}> {{ ?org <locatedIn> ?c . }}
                        }}"""
                ).count()
        finally:
            unregister_service(url)
            shutdown()
        assert got == 2  # unit solution: local rows pass through

    def test_term_conversion_matches_storage_convention(self):
        from graphula_spark.sparql.http import term_to_storage

        assert term_to_storage({"type": "uri", "value": "http://x/a"}) == (
            "http://x/a"
        )
        assert term_to_storage({"type": "bnode", "value": "b0"}) == "_:b0"
        assert term_to_storage({"type": "literal", "value": "hi"}) == '"hi"'
        # RDF 1.1: xsd:string-typed == simple literal (the .nt loader
        # stores the simple form)
        assert (
            term_to_storage(
                {
                    "type": "literal",
                    "value": "hi",
                    "datatype": "http://www.w3.org/2001/XMLSchema#string",
                }
            )
            == '"hi"'
        )
        assert (
            term_to_storage(
                {
                    "type": "typed-literal",
                    "value": "5",
                    "datatype": "http://www.w3.org/2001/XMLSchema#integer",
                }
            )
            == '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'
        )


def urllib_unquote(s: str) -> str:
    import urllib.parse

    return urllib.parse.unquote_plus(s)


def test_service_word_in_literal_stays_cacheable(spark):
    """The cache bypass is a STRUCTURAL flag set by the parser on
    ServicePattern, not a word-match on the query text: a query whose
    literal merely contains the word "service" must hit the plan cache
    on the second call (same DataFrame object back)."""
    from graphula_spark.graph import Graph

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [("ex:a", "ex:label", '"customer service desk"')],
            ["s", "p", "o"],
        ),
    )
    q = 'SELECT ?s WHERE { ?s <ex:label> "customer service desk" . }'
    first = g.sparql(q)
    assert first.count() == 1
    assert g.sparql(q) is first  # cached, despite the word "service"


def test_service_queries_bypass_plan_cache(spark):
    """SERVICE resolves through a mutable registry: the same query text
    must re-resolve per call (a cached plan would freeze the first
    transport fetch / registration forever)."""
    from graphula_spark.graph import Graph
    from graphula_spark.sparql.service import (
        register_service,
        unregister_service,
    )

    local = Graph.from_string_triples(
        spark,
        spark.createDataFrame([("alice", "worksFor", "acme")], ["s", "p", "o"]),
    )
    state = {"city": "berlin"}

    def fetch(ep, q):
        return [{"org": "acme", "city": state["city"]}]

    q = """SELECT ?who ?city WHERE {
             ?who <worksFor> ?org .
             SERVICE <http://mut.example/> { ?org <locatedIn> ?city . } }"""
    register_service("http://mut.example/", fetch)
    try:
        assert [r["city"] for r in local.sparql(q).collect()] == ["berlin"]
        state["city"] = "tokyo"
        assert [r["city"] for r in local.sparql(q).collect()] == ["tokyo"]
    finally:
        unregister_service("http://mut.example/")


class TestDatasetQuadInsert:
    """add_string_quads set semantics via the round-8 counted two-step:
    the overlap joins must be NULL-SAFE on g (default-graph rows carry
    null), intra-batch duplicates collapse, and the above-gate shuffle
    branch produces the identical snapshot."""

    def test_set_semantics_null_safe_both_branches(self, spark, monkeypatch):
        from graphula_spark.dataset import Dataset
        from graphula_spark.graph import Graph

        asserted = [
            ("ex:a", "ex:p", "ex:b", None),  # default graph
            ("ex:a", "ex:p", "ex:b", "ex:g1"),  # same triple, named graph
        ]
        ds = Dataset.from_string_quads(
            spark, spark.createDataFrame(asserted, ["s", "p", "o", "g"])
        )
        batch = spark.createDataFrame(
            asserted
            + [
                ("ex:c", "ex:p", "ex:d", None),
                ("ex:c", "ex:p", "ex:d", None),  # intra-batch dup
            ],
            ["s", "p", "o", "g"],
        )
        for gate in (Graph.INSERT_BROADCAST_MAX_ROWS, 0):
            monkeypatch.setattr(Graph, "INSERT_BROADCAST_MAX_ROWS", gate)
            out = ds.add_string_quads(batch)
            # 2 asserted + exactly 1 new quad: a plain (non-null-safe)
            # equi-join would re-add BOTH null-g rows here
            assert out.quads.count() == 3, f"gate={gate}"
            # idempotent: re-adding the same batch adds nothing
            assert out.add_string_quads(batch).quads.count() == 3


class TestDatasetMaterialization:
    """Per-graph inference: ontology in a named graph, data in the
    default graph, derived-only triples landing in a target named
    graph — queries choose their entailment level by graph selection."""

    ONTO = "http://ex/ontology"
    INF = "http://ex/inferred"

    def _dataset(self, spark):
        from graphula_spark.dataset import Dataset
        from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS

        rows = [
            # data (default graph)
            ("ex:alice", RDF_TYPE, "ex:Professor", None),
            ("ex:bob", RDF_TYPE, "ex:Student", None),
            # ontology (named graph)
            ("ex:Professor", RDFS_SUBCLASS, "ex:Faculty", self.ONTO),
            ("ex:Faculty", RDFS_SUBCLASS, "ex:Person", self.ONTO),
            ("ex:Student", RDFS_SUBCLASS, "ex:Person", self.ONTO),
        ]
        return Dataset.from_string_quads(
            spark, spark.createDataFrame(rows, ["s", "p", "o", "g"])
        )

    def test_derived_triples_land_in_target_graph(self, spark):
        from graphula_spark.operators.rdfs import RDF_TYPE

        ds = self._dataset(spark).materialize_rdfs(self.ONTO, self.INF)
        inf = ds.graph(self.INF)
        got = {
            (r.s, r.o)
            for r in inf.decode(
                inf.triples.select("s", "o"), ["s", "o"]
            ).collect()
            if True
        }
        # type inheritance + the transitive subclass edge
        assert ("ex:alice", "ex:Faculty") in got
        assert ("ex:alice", "ex:Person") in got
        assert ("ex:bob", "ex:Person") in got
        assert ("ex:Professor", "ex:Person") in got  # rdfs11 edge
        # asserted triples do NOT duplicate into the target graph
        assert ("ex:alice", "ex:Professor") not in got

    def test_asserted_graphs_untouched_and_query_by_entailment(self, spark):
        ds0 = self._dataset(spark)
        ds = ds0.materialize_rdfs(self.ONTO, self.INF)
        # default graph unchanged
        assert ds.default_graph.triples.count() == 2
        # ontology graph unchanged
        assert ds.graph(self.ONTO).triples.count() == 3
        # raw query (default graph only) sees no inferences
        raw = ds.sparql(
            "SELECT ?s WHERE { ?s "
            "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?t }"
        ).collect()
        assert len(raw) == 2
        # GRAPH <inferred> exposes exactly the derived types
        inf = ds.sparql(
            f"""SELECT ?s ?t WHERE {{ GRAPH <{self.INF}> {{
                  ?s <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?t
               }} }}"""
        ).collect()
        assert {(r.s, r.t) for r in inf} == {
            ("ex:alice", "ex:Faculty"),
            ("ex:alice", "ex:Person"),
            ("ex:bob", "ex:Person"),
        }

    def _target_snapshot(self, ds):
        inf = ds.graph(self.INF)
        return {
            (r.s, r.p, r.o)
            for r in inf.decode(
                inf.triples.select("s", "p", "o"), ["s", "p", "o"]
            ).collect()
        }

    def test_incremental_quad_ingest_equals_full_rematerialize(self, spark):
        """add_quads_materialized (the Dataset twin of
        Graph.add_materialized_rdfs): a schema-free batch into the
        default graph maintains the target incrementally, and the
        result equals inserting + fully re-materializing."""
        from graphula_spark.operators.rdfs import RDF_TYPE

        ds = self._dataset(spark).materialize_rdfs(self.ONTO, self.INF)
        batch = spark.createDataFrame(
            [
                ("ex:carol", RDF_TYPE, "ex:Professor", None),
                ("ex:dave", RDF_TYPE, "ex:Student", "ex:unrelated"),
            ],
            ["s", "p", "o", "g"],
        )
        inc = ds.add_quads_materialized(batch, self.ONTO, self.INF)
        full = ds.add_string_quads(batch).materialize_rdfs(
            self.ONTO, self.INF
        )
        got = self._target_snapshot(inc)
        assert got == self._target_snapshot(full)
        # carol (default graph) gains the inherited types...
        assert ("ex:carol", RDF_TYPE, "ex:Faculty") in got
        assert ("ex:carol", RDF_TYPE, "ex:Person") in got
        # ...dave's row landed in an UNRELATED graph: inserted, not
        # reasoned over
        assert ("ex:dave", RDF_TYPE, "ex:Person") not in got
        assert inc.graph("ex:unrelated").triples.count() == 1
        # asserted graphs untouched
        assert inc.default_graph.triples.count() == 3
        assert inc.graph(self.ONTO).triples.count() == 3

    def test_incremental_quad_ingest_schema_batch_falls_back(self, spark):
        """A batch asserting a NEW subClassOf edge into the ontology
        graph triggers the full re-materialization (corpus individuals
        retype); on_schema_change='error' raises."""
        from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS

        ds = self._dataset(spark).materialize_rdfs(self.ONTO, self.INF)
        batch = spark.createDataFrame(
            [("ex:Person", RDFS_SUBCLASS, "ex:Agent", self.ONTO)],
            ["s", "p", "o", "g"],
        )
        out = ds.add_quads_materialized(batch, self.ONTO, self.INF)
        got = self._target_snapshot(out)
        # existing individuals climb the NEW edge
        assert ("ex:alice", RDF_TYPE, "ex:Agent") in got
        assert ("ex:bob", RDF_TYPE, "ex:Agent") in got
        with pytest.raises(ValueError, match="schema"):
            ds.add_quads_materialized(
                batch, self.ONTO, self.INF, on_schema_change="error"
            )

    def test_idempotent(self, spark):
        ds = self._dataset(spark).materialize_rdfs(self.ONTO, self.INF)
        again = ds.materialize_rdfs(self.ONTO, self.INF)
        assert again.quads.count() == ds.quads.count()

    def test_rematerialization_never_shuffles_the_quad_table(self, spark):
        """At 100 TB the quad table must never be globally deduped to
        land a derived-only set: the fresh triples anti-join against
        the TARGET graph's quads only, then append via a narrow union.
        The old shape's dropDuplicates(["s","p","o","g"]) over the
        whole union showed as a Deduplicate keyed on g — assert it is
        gone (the only dedups left are the closure's own, keyed on
        s,p,o with no g)."""
        import re

        ds = self._dataset(spark).materialize_rdfs(self.ONTO, self.INF)
        again = ds.materialize_rdfs(self.ONTO, self.INF)
        plan = again.quads._jdf.queryExecution().optimizedPlan().toString()
        assert re.search(r"Deduplicate \[[^\]]*\bg#", plan) is None
        # and the result is still exactly idempotent
        assert again.quads.count() == ds.quads.count()

    # -- incremental OWL maintenance at the Dataset level (VERDICT r8 #1)

    def _owl_dataset(self, spark):
        from graphula_spark.dataset import Dataset
        from graphula_spark.operators.rdfs import (
            OWL_TRANSITIVE,
            RDF_TYPE,
        )

        rows = [
            # data: two disjoint suborg chains (default graph)
            ("ex:dept", "ex:subOrg", "ex:college", None),
            ("ex:college", "ex:subOrg", "ex:uni", None),
            ("ex:lab", "ex:subOrg", "ex:institute", None),
            # ontology: subOrg is transitive
            ("ex:subOrg", RDF_TYPE, OWL_TRANSITIVE, self.ONTO),
        ]
        return Dataset.from_string_quads(
            spark, spark.createDataFrame(rows, ["s", "p", "o", "g"])
        )

    @pytest.mark.slowtail

    def test_incremental_owl_quad_ingest_equals_full(self, spark):
        """owl=True quad ingest: a bridging edge between two closed
        corpus chains derives the cross pairs incrementally, row-exact
        with the full owl re-materialization."""
        ds = self._owl_dataset(spark).materialize_rdfs(
            self.ONTO, self.INF, owl=True
        )
        # the closure of the first chain landed
        assert ("ex:dept", "ex:subOrg", "ex:uni") in self._target_snapshot(
            ds
        )
        batch = spark.createDataFrame(
            [("ex:uni", "ex:subOrg", "ex:lab", None)],
            "s string, p string, o string, g string",
        )
        inc = ds.add_quads_materialized(
            batch, self.ONTO, self.INF, owl=True
        )
        full = ds.add_string_quads(batch).materialize_rdfs(
            self.ONTO, self.INF, owl=True
        )
        got = self._target_snapshot(inc)
        assert got == self._target_snapshot(full)
        # new paths THROUGH the bridge, ending across the corpus chain
        assert ("ex:dept", "ex:subOrg", "ex:lab") in got
        assert ("ex:dept", "ex:subOrg", "ex:institute") in got
        assert ("ex:college", "ex:subOrg", "ex:institute") in got
        # idempotent: re-ingesting the same batch adds nothing
        again = inc.add_quads_materialized(
            batch, self.ONTO, self.INF, owl=True
        )
        assert self._target_snapshot(again) == got

    def test_incremental_owl_quad_schema_batch_falls_back(self, spark):
        """An owl:TransitiveProperty declaration arriving in the batch
        is a schema change: default falls back to the full owl pass
        (corpus edges close), 'error' raises."""
        from graphula_spark.operators.rdfs import (
            OWL_TRANSITIVE,
            RDF_TYPE,
        )

        ds = self._owl_dataset(spark).materialize_rdfs(
            self.ONTO, self.INF, owl=True
        )
        batch = spark.createDataFrame(
            [("ex:memberOf", RDF_TYPE, OWL_TRANSITIVE, self.ONTO)],
            ["s", "p", "o", "g"],
        )
        out = ds.add_quads_materialized(
            batch, self.ONTO, self.INF, owl=True
        )
        # fallback re-closed: first-chain pair still present, no dupes
        snap = self._target_snapshot(out)
        assert ("ex:dept", "ex:subOrg", "ex:uni") in snap
        with pytest.raises(ValueError, match="schema"):
            ds.add_quads_materialized(
                batch, self.ONTO, self.INF, owl=True,
                on_schema_change="error",
            )

    # -- decremental maintenance at the Dataset level (round 9) -------

    def _rebuild_target(self, ds, owl=False):
        """The from-scratch answer: drop the target graph, rematerialize."""
        from pyspark.sql import functions as F

        gid = ds.dictionary.lookup_terms([self.INF]).get(self.INF)
        dropped = ds._filtered(
            F.col("g").isNull() | (F.col("g") != gid)
        ) if gid is not None else ds
        return dropped.materialize_rdfs(self.ONTO, self.INF, owl=owl)

    def test_decremental_quad_delete_equals_rebuild(self, spark):
        """delete_quads_materialized == drop-target + rematerialize,
        row-exact: a victim with surviving support keeps its
        consequences; a chain-killing victim strands target rows that
        overdelete and do NOT rederive."""
        from graphula_spark.operators.rdfs import RDF_TYPE

        ds = self._dataset(spark).materialize_rdfs(self.ONTO, self.INF)
        # alice loses her Professor assertion: (alice type Faculty) and
        # (alice type Person) lose their only support and must leave
        batch = spark.createDataFrame(
            [("ex:alice", RDF_TYPE, "ex:Professor", None)],
            "s string, p string, o string, g string",
        )
        inc = ds.delete_quads_materialized(batch, self.ONTO, self.INF)
        want = self._rebuild_target(ds.delete_string_quads(batch))
        got = self._target_snapshot(inc)
        assert got == self._target_snapshot(want)
        assert ("ex:alice", RDF_TYPE, "ex:Faculty") not in got
        assert ("ex:alice", RDF_TYPE, "ex:Person") not in got
        assert ("ex:bob", RDF_TYPE, "ex:Person") in got  # untouched
        # default graph lost exactly the victim
        assert inc.default_graph.triples.count() == 1

    @pytest.mark.slowtail

    def test_decremental_owl_delete_partial_support_survives(self, spark):
        """OWL: deleting one base edge of a transitive chain
        overdeletes the through-pairs; pairs with an alternative
        decomposition rederive."""
        ds = self._owl_dataset(spark).materialize_rdfs(
            self.ONTO, self.INF, owl=True
        )
        # bridge the two chains first so dept reaches institute
        bridge = spark.createDataFrame(
            [("ex:uni", "ex:subOrg", "ex:lab", None)],
            "s string, p string, o string, g string",
        )
        ds = ds.add_quads_materialized(
            bridge, self.ONTO, self.INF, owl=True
        )
        assert ("ex:dept", "ex:subOrg", "ex:institute") in (
            self._target_snapshot(ds)
        )
        # now delete the bridge: every pair THROUGH it must leave
        inc = ds.delete_quads_materialized(
            bridge, self.ONTO, self.INF, owl=True
        )
        want = self._rebuild_target(
            ds.delete_string_quads(bridge), owl=True
        )
        got = self._target_snapshot(inc)
        assert got == self._target_snapshot(want)
        assert ("ex:dept", "ex:subOrg", "ex:institute") not in got
        assert ("ex:dept", "ex:subOrg", "ex:uni") in got  # own chain

    def test_decremental_delete_schema_victim_falls_back(self, spark):
        """Deleting an ontology edge rebuilds the target (default) or
        raises (on_schema_change='error'); the rebuilt target drops
        every consequence of the removed schema edge."""
        from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS

        ds = self._dataset(spark).materialize_rdfs(self.ONTO, self.INF)
        batch = spark.createDataFrame(
            [("ex:Faculty", RDFS_SUBCLASS, "ex:Person", self.ONTO)],
            ["s", "p", "o", "g"],
        )
        out = ds.delete_quads_materialized(batch, self.ONTO, self.INF)
        got = self._target_snapshot(out)
        # alice no longer reaches Person through Faculty
        assert ("ex:alice", RDF_TYPE, "ex:Person") not in got
        assert ("ex:alice", RDF_TYPE, "ex:Faculty") in got
        assert ("ex:bob", RDF_TYPE, "ex:Person") in got  # own edge
        import pytest as _pytest

        with _pytest.raises(ValueError, match="schema"):
            ds.delete_quads_materialized(
                batch, self.ONTO, self.INF, on_schema_change="error"
            )

    def test_decremental_delete_duplicate_assertion_is_noop(self, spark):
        """A victim triple asserted in BOTH the data and ontology
        graphs: deleting one copy leaves the fact asserted — nothing
        overdeletes."""
        from graphula_spark.dataset import Dataset
        from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS

        rows = [
            ("ex:x", RDF_TYPE, "ex:A", None),
            ("ex:x", RDF_TYPE, "ex:A", self.ONTO),  # duplicate copy
            ("ex:A", RDFS_SUBCLASS, "ex:B", self.ONTO),
        ]
        ds = Dataset.from_string_quads(
            spark,
            spark.createDataFrame(
                rows, "s string, p string, o string, g string"
            ),
        ).materialize_rdfs(self.ONTO, self.INF)
        assert ("ex:x", RDF_TYPE, "ex:B") in self._target_snapshot(ds)
        batch = spark.createDataFrame(
            [("ex:x", RDF_TYPE, "ex:A", None)],
            "s string, p string, o string, g string",
        )
        inc = ds.delete_quads_materialized(batch, self.ONTO, self.INF)
        got = self._target_snapshot(inc)
        assert ("ex:x", RDF_TYPE, "ex:B") in got  # still supported
        assert inc.default_graph.triples.count() == 0  # copy deleted

    def test_decremental_delete_entailed_assertion_moves_to_target(
        self, spark
    ):
        """Deleting an assertion the remainder still ENTAILS: the fact
        leaves the data graph but enters the target (closure minus
        asserted semantics) — exactly what a from-scratch rebuild
        produces."""
        from graphula_spark.dataset import Dataset
        from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS

        rows = [
            ("ex:y", RDF_TYPE, "ex:A", None),
            ("ex:y", RDF_TYPE, "ex:B", None),  # asserted AND derivable
            ("ex:A", RDFS_SUBCLASS, "ex:B", self.ONTO),
        ]
        ds = Dataset.from_string_quads(
            spark,
            spark.createDataFrame(
                rows, "s string, p string, o string, g string"
            ),
        ).materialize_rdfs(self.ONTO, self.INF)
        # while asserted, (y type B) is NOT in the target
        assert ("ex:y", RDF_TYPE, "ex:B") not in self._target_snapshot(ds)
        batch = spark.createDataFrame(
            [("ex:y", RDF_TYPE, "ex:B", None)],
            "s string, p string, o string, g string",
        )
        inc = ds.delete_quads_materialized(batch, self.ONTO, self.INF)
        want = self._rebuild_target(ds.delete_string_quads(batch))
        got = self._target_snapshot(inc)
        assert got == self._target_snapshot(want)
        assert ("ex:y", RDF_TYPE, "ex:B") in got  # moved to target
        assert inc.default_graph.triples.count() == 1  # only (y type A)


def test_exists_as_expression_multiset_exact(spark):
    """EXISTS in BIND/IF/SELECT expressions (round 10, §17.4.1.4):
    per-row flags, DUPLICATE solutions preserved (the row-tag
    discipline), correlated and constant groups, and NOT EXISTS."""
    from graphula_spark.graph import Graph

    rows = [
        ("http://e/a", "http://e/p", "http://e/b"),
        ("http://e/b", "http://e/q", "http://e/c"),
        ("http://e/d", "http://e/p", "http://e/e"),
    ]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    )
    got = sorted(
        tuple(r)
        for r in g.sparql(
            """PREFIX ex: <http://e/>
               SELECT ?s ?has WHERE {
                 ?s ex:p ?o BIND(EXISTS { ?o ex:q ?z } AS ?has) }"""
        ).collect()
    )
    assert got == [("http://e/a", True), ("http://e/d", False)]
    # multiset: a UNION duplicating the left rows must keep BOTH copies
    got2 = sorted(
        tuple(r)
        for r in g.sparql(
            """PREFIX ex: <http://e/>
               SELECT ?s ?has WHERE {
                 { ?s ex:p ?o } UNION { ?s ex:p ?o }
                 BIND(EXISTS { ?o ex:q ?z } AS ?has) }"""
        ).collect()
    )
    assert got2 == [
        ("http://e/a", True), ("http://e/a", True),
        ("http://e/d", False), ("http://e/d", False),
    ]
    # IF + NOT EXISTS + constant group
    got3 = sorted(
        tuple(r)
        for r in g.sparql(
            """PREFIX ex: <http://e/>
               SELECT ?s ?lab ?c WHERE {
                 ?s ex:p ?o
                 BIND(IF(NOT EXISTS { ?o ex:q ?z }, "leaf", "linked") AS ?lab)
                 BIND(EXISTS { ex:b ex:q ex:c } AS ?c) }"""
        ).collect()
    )
    assert got3 == [
        ("http://e/a", "linked", True),
        ("http://e/d", "leaf", True),
    ]


def test_exists_expression_after_optional_null_vars(spark):
    """Round 11 (advisor-reported): EXISTS as an expression evaluated
    over rows that carry UNBOUND (NULL) vars — e.g. after OPTIONAL —
    must still flag true when the group matches. The fan-back join
    used plain equality on the left columns, so any NULL var made the
    flag false."""
    from graphula_spark.graph import Graph

    rows = [
        ("http://e/a", "http://e/email", "http://e/a_at_x"),
        ("http://e/a", "http://e/likes", "http://e/pizza"),
        ("http://e/b", "http://e/likes", "http://e/pasta"),
        ("http://e/c", "http://e/email", "http://e/c_at_x"),
        ("http://e/a", "http://e/type", "http://e/Person"),
        ("http://e/b", "http://e/type", "http://e/Person"),
        ("http://e/c", "http://e/type", "http://e/Person"),
    ]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    )
    got = sorted(
        tuple(r)
        for r in g.sparql(
            """PREFIX ex: <http://e/>
               SELECT ?x ?e ?has WHERE {
                 ?x ex:type ex:Person
                 OPTIONAL { ?x ex:email ?e }
                 BIND(EXISTS { ?x ex:likes ?l } AS ?has) }"""
        ).collect()
    )
    # b has no email (NULL ?e) but DOES like something -> has=True
    assert got == [
        ("http://e/a", "http://e/a_at_x", True),
        ("http://e/b", None, True),
        ("http://e/c", "http://e/c_at_x", False),
    ]
    # NOT EXISTS through the same path, plus an unbound SHARED var:
    # ?e is unbound for b, and unbound is compatible with anything
    got2 = sorted(
        tuple(r)
        for r in g.sparql(
            """PREFIX ex: <http://e/>
               SELECT ?x ?none WHERE {
                 ?x ex:type ex:Person
                 OPTIONAL { ?x ex:email ?e }
                 BIND(NOT EXISTS { ?x ex:likes ?l } AS ?none) }"""
        ).collect()
    )
    assert got2 == [
        ("http://e/a", False),
        ("http://e/b", False),
        ("http://e/c", True),
    ]


def test_having_aggregate_over_typed_literals(spark):
    """Round 10: HAVING referencing an aggregate of a TYPED-literal
    variable (not in the projection) — the val-var numeric view used
    to try_cast the storage term string and NULL out every group."""
    from graphula_spark.graph import Graph

    XI = "http://www.w3.org/2001/XMLSchema#integer"
    rows = [
        ("http://e/a", "http://e/p", f'"2"^^<{XI}>'),
        ("http://e/a", "http://e/p", f'"3"^^<{XI}>'),
        ("http://e/b", "http://e/p", f'"5"^^<{XI}>'),
    ]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    )
    got = sorted(
        (r[0], float(r[1]))
        for r in g.sparql(
            """PREFIX ex: <http://e/>
               SELECT ?s (SUM(?v) AS ?t) WHERE { ?s ex:p ?v }
               GROUP BY ?s HAVING (MAX(?v) > 3)"""
        ).collect()
    )
    assert got == [("http://e/b", 5.0)]


def test_order_by_bare_expression_key(spark):
    """§18.2.5.1 OrderCondition: a bare BuiltInCall is a legal ordering
    key without ASC/DESC or brackets (round 10)."""
    from graphula_spark.graph import Graph

    rows = [
        ("http://e/long-name", "http://e/p", "http://e/x"),
        ("http://e/a", "http://e/p", "http://e/x"),
        ("http://e/mid", "http://e/p", "http://e/x"),
    ]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    )
    got = [
        r["s"]
        for r in g.sparql(
            """PREFIX ex: <http://e/>
               SELECT ?s WHERE { ?s ex:p ?o } ORDER BY STRLEN(STR(?s)) ?s"""
        ).collect()
    ]
    assert got == ["http://e/a", "http://e/mid", "http://e/long-name"]


def test_order_by_then_trailing_values(spark):
    """Round 11 (advisor-reported): a trailing multi-var VALUES clause
    after a bare ORDER BY key must not be consumed as an ordering
    key (VALUES looks like KW followed by '(')."""
    from graphula_spark.graph import Graph

    rows = [
        ("http://e/a", "http://e/p", "http://e/x"),
        ("http://e/b", "http://e/p", "http://e/y"),
        ("http://e/c", "http://e/p", "http://e/z"),
    ]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    )
    got = [
        (r["s"], r["o"])
        for r in g.sparql(
            """PREFIX ex: <http://e/>
               SELECT ?s ?o WHERE { ?s ex:p ?o }
               ORDER BY STRLEN(STR(?s))
               VALUES (?s ?o) {
                 (ex:b ex:y) (ex:a ex:x)
               }"""
        ).collect()
    ]
    assert sorted(got) == [
        ("http://e/a", "http://e/x"),
        ("http://e/b", "http://e/y"),
    ]


def test_zero_length_seq_path_bound_endpoints(spark):
    """Round 11 (advisor-reported): a SEQUENCE path whose parts all
    admit zero length (p?/q?) is itself zero-including, so a bound
    endpoint pairs with itself even when not incident to p/q edges;
    same through inverse (^)."""
    from graphula_spark.graph import Graph

    # ex:z exists in the graph but is NOT incident to p or q edges
    rows = [
        ("http://e/a", "http://e/p", "http://e/b"),
        ("http://e/b", "http://e/q", "http://e/c"),
        ("http://e/z", "http://e/r", "http://e/w"),
    ]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    )
    def ask(q):
        return g.sparql(q).collect()[0]["ask"]

    assert ask("""PREFIX ex: <http://e/>
                  ASK { ex:z (ex:p?/ex:q?) ex:z }""") is True
    # inverse of a zero-including path is zero-including
    assert ask("""PREFIX ex: <http://e/>
                  ASK { ex:z ^(ex:p?) ex:z }""") is True
    # and the non-zero part of the sequence still works
    assert ask("""PREFIX ex: <http://e/>
                  ASK { ex:a (ex:p?/ex:q?) ex:c }""") is True


def test_results_serializers_decode_storage_escapes(spark):
    """Round 12 (found by manifest case csvres05): the storage form
    keeps N-Triples escapes verbatim, but the JSON/XML/CSV results
    formats carry RAW text (each applies its own encoding at write
    time) — a stored \\n must serialize as a real newline, not
    backslash+n. TSV stays verbatim by design (its cells ARE SPARQL
    term syntax)."""
    import csv as _csv
    import io
    import json

    from graphula_spark.graph import Graph
    from graphula_spark.sparql.results import nt_unescape, serialize_results

    assert nt_unescape(r"a\nb") == "a\nb"
    assert nt_unescape(r"say \"hi\"") == 'say "hi"'
    assert nt_unescape(r"x\\ny") == "x\\ny"  # escaped backslash, then n
    assert nt_unescape(r"A\t") == "A\t"

    ttl = r'''@prefix ex: <http://e/> .
ex:a ex:v "line1\nline2" .
ex:a ex:w "say \"hi\"" .
'''
    from graphula_spark.literal import literal_df
    from graphula_spark.sources.turtle import _parse_turtle_text

    rows = _parse_turtle_text(ttl)
    g = Graph.from_string_triples(
        spark, literal_df(spark, rows, "s string, p string, o string")
    )
    df = g.sparql(
        "PREFIX ex: <http://e/> SELECT ?v ?w WHERE "
        "{ ex:a ex:v ?v . ex:a ex:w ?w }"
    )
    j = json.loads(serialize_results(df, "json"))
    b = j["results"]["bindings"][0]
    assert b["v"]["value"] == "line1\nline2"
    assert b["w"]["value"] == 'say "hi"'
    rec = list(_csv.reader(io.StringIO(serialize_results(df, "csv"))))[1]
    assert rec == ["line1\nline2", 'say "hi"']
    assert "line1\nline2" in serialize_results(df, "xml")
    # TSV keeps the escaped SPARQL term syntax verbatim
    tsv = serialize_results(df, "tsv").splitlines()[1]
    assert tsv.split("\t")[0] == '"line1\\nline2"'


def test_rdf_value_decodes_overlapping_escapes(spark):
    """Round 12: FILTER-level lexical view decodes ECHARs in one
    correct left-to-right simulation — an escaped backslash followed
    by 'n' stays backslash+n (the old sequential passes got the order
    right only for quote/backslash)."""
    from pyspark.sql import functions as F

    from graphula_spark.literal import literal_df
    from graphula_spark.sparql.compiler import rdf_value

    rows = [
        (r'"a\nb"',),       # real newline after decode
        (r'"x\\ny"',),      # backslash then literal n
        (r'"t\tab"',),
        (r'"q\"end"',),
        ("plainiri",),
    ]
    df = literal_df(spark, rows, "t string").select(
        F.col("t"), rdf_value(F.col("t")).alias("v")
    )
    got = {r["t"]: r["v"] for r in df.collect()}
    assert got[r'"a\nb"'] == "a\nb"
    assert got[r'"x\\ny"'] == "x\\ny"
    assert got[r'"t\tab"'] == "t\tab"
    assert got[r'"q\"end"'] == 'q"end'
    assert got["plainiri"] == "plainiri"


def test_rdf_value_decodes_u_escapes_jvm_side(spark):
    """Round 13 (ADVICE r12): \\uXXXX / \\UXXXXXXXX decode JVM-side in
    the FILTER value view (UTF-16BE byte decoding stands in for the
    chr() Catalyst lacks), so both sides of CONTAINS/'=' meet at the
    same decoding level whether the escape sits in the query constant
    or in the stored term. Malformed escapes (bad hex, lone
    surrogates, beyond U+10FFFF) stay verbatim — the same contract as
    results.nt_unescape — and decoding is strictly left-to-right:
    decoded backslashes never re-trigger escape parsing."""
    from pyspark.sql import functions as F

    from graphula_spark.literal import literal_df
    from graphula_spark.sparql.compiler import rdf_value

    cases = {
        '"Caf\\u00E9"': "Café",
        '"x\\U0001F600y"': "x\U0001F600y",
        '"\\\\u0041"': "\\u0041",    # escaped backslash: not an escape
        '"\\u005Cn"': "\\n",          # decoded backslash + n, NOT newline
        '"\\u005C\\u0075\\u0030\\u0030\\u0034\\u0031"': "\\u0041",
        '"\\uZZZZ"': "\\uZZZZ",
        '"\\uD800"': "\\uD800",
        '"\\U00110000"': "\\U00110000",
        # \\u0000 stays verbatim on BOTH decode paths (a decoded NUL
        # would collide with the JVM-side backslash sentinel and be
        # silently rewritten to '\'); ADVICE r13
        '"a\\u0000b"': "a\\u0000b",
        '"a\\U00000000b"': "a\\U00000000b",
        '"tab\\tmix\\u00E9\\\\done"': "tab\tmixé\\done",
    }
    df = literal_df(spark, [(t,) for t in cases], "t string").select(
        F.col("t"), rdf_value(F.col("t")).alias("v")
    )
    got = {r["t"]: r["v"] for r in df.collect()}
    assert got == cases


def test_filter_u_escape_symmetry(spark):
    """End-to-end: stored data carries the \\u escape, the query
    constant carries the raw character — and vice versa — and FILTER
    equality/CONTAINS match in both directions."""
    from graphula_spark.graph import Graph

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [
                ("s1", "p", '"Caf\\u00E9"'),
                ("s2", "p", '"Café"'),
                ("s3", "p", '"plain"'),
            ],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    q = 'SELECT ?s WHERE { ?s <p> ?v . FILTER(STR(?v) = "Café") }'
    got = {r["s"] for r in g.sparql(q).collect()}
    assert got == {"s1", "s2"}
    q2 = 'SELECT ?s WHERE { ?s <p> ?v . FILTER(CONTAINS(STR(?v), "af\\u00E9")) }'
    got2 = {r["s"] for r in g.sparql(q2).collect()}
    assert got2 == {"s1", "s2"}


def test_all_nullable_shared_join_decomposes_and_matches(spark):
    """Round 13: when every shared var of a join is null-tolerant
    (maybe-unbound), the old single OR-condition join planned as a
    BroadcastNestedLoopJoin — O(|L|*|R|) in ONE task (279 s at sf0.1
    for the BIND-join-back shape). The pivot decomposition keeps a
    plain equality for the bound-on-both-sides mass (hash-joinable)
    and routes the null slivers through residual branches. This pins
    (1) SPARQL compatibility semantics — an unbound ?x matches every
    right row and takes its value — and (2) that the plan carries a
    hash join on the pivot."""
    from graphula_spark.graph import Graph

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [
                ("a", "type", "thing"),
                ("b", "type", "thing"),
                ("a", "p", "x1"),
                ("x1", "q", "y1"),
                ("x2", "q", "y2"),
            ],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    df = g.sparql(
        """SELECT ?s ?x ?y WHERE {
             ?s <type> <thing> .
             OPTIONAL { ?s <p> ?x }
             ?x <q> ?y }"""
    )
    got = {(r["s"], r["x"], r["y"]) for r in df.collect()}
    assert got == {
        ("a", "x1", "y1"),       # bound ?x equi-matches
        ("b", "x1", "y1"),       # unbound ?x matches every row and
        ("b", "x2", "y2"),       # takes the right side's value
    }
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan[:2000]


def test_all_nullable_shared_left_outer_decomposition(spark):
    """The left_outer (OPTIONAL) variant of the all-nullable join
    decomposition: matched rows come from the three disjoint branches,
    unmatched left rows are null-extended via the uid anti-join (the
    uid is checkpoint-materialized so every branch sees the same
    assignment)."""
    from graphula_spark.graph import Graph

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [
                ("a", "type", "thing"),
                ("b", "type", "thing"),
                ("c", "type", "thing"),
                ("a", "p", "x1"),
                ("c", "p", "lonely"),   # no <q> edge: stays unmatched
                ("x1", "q", "y1"),
                ("x2", "q", "y2"),
            ],
            ["s", "p", "o"],
        ),
        cache=False,
    )
    df = g.sparql(
        """SELECT ?s ?x ?y WHERE {
             ?s <type> <thing> .
             OPTIONAL { ?s <p> ?x }
             OPTIONAL { ?x <q> ?y } }"""
    )
    got = sorted((r["s"], r["x"], r["y"]) for r in df.collect())
    assert got == [
        ("a", "x1", "y1"),
        ("b", "x1", "y1"),      # unbound ?x matches every <q> row
        ("b", "x2", "y2"),
        ("c", "lonely", None),  # bound ?x, no match: null-extended
    ]


def test_nul_escape_agrees_across_decode_paths():
    """ADVICE r13: \\u0000 is the one escape BOTH decode paths must
    refuse — the JVM-side value view (compiler.rdf_value) masks
    backslashes with a NUL sentinel, so a decoded NUL would be
    silently rewritten to a literal backslash. Both rdf_value (pinned
    in test_rdf_value_decodes_u_escapes_jvm_side above) and the
    driver-side results.nt_unescape now leave the escape verbatim, so
    variable-side and constant-side values agree."""
    from graphula_spark.sparql.results import nt_unescape

    assert nt_unescape("a\\u0000b") == "a\\u0000b"
    assert nt_unescape("a\\U00000000b") == "a\\U00000000b"
    # neighbouring escapes still decode
    assert nt_unescape("a\\u0041b") == "aAb"


def test_nested_all_nullable_decomposition_depth(spark):
    """Round 14 (VERDICT r13 #6): a CHAIN of OPTIONALs whose shared
    vars are all maybe-unbound triggers the _compat_join pivot
    decomposition at every level. Each level references its inputs up
    to 3x, so without the _DECOMP_LEAF_BUDGET localCheckpoint guard
    the logical plan grows 3^depth and Catalyst's single-threaded
    analyzer stalls (13+ CPU-minutes observed on one round-13 tree).
    This pins that a 5-level nest compiles AND executes inside a hard
    wall-clock bound with the guard engaged."""
    import time

    from graphula_spark.graph import Graph

    triples = [("s0", "type", "thing"), ("s0", "p0", "x0")]
    # chain: x0 -q1-> x1 -q2-> x2 ... each hop optional, every shared
    # var maybe-unbound once it comes from inside an OPTIONAL
    for i in range(5):
        triples.append((f"x{i}", f"q{i + 1}", f"x{i + 1}"))
    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(triples, ["s", "p", "o"]),
        cache=False,
    )
    body = ["?s <type> <thing> .", "OPTIONAL { ?s <p0> ?x0 }"]
    for i in range(5):
        body.append(f"OPTIONAL {{ ?x{i} <q{i + 1}> ?x{i + 1} }}")
    q = "SELECT ?s ?x5 WHERE { " + " ".join(body) + " }"
    t0 = time.time()
    rows_out = g.sparql(q).collect()
    elapsed = time.time() - t0
    assert {(r["s"], r["x5"]) for r in rows_out} == {("s0", "x5")}
    # generous CI bound: the un-guarded shape never finishes this —
    # the analyzer alone burned 13+ CPU-minutes at depth ~5
    assert elapsed < 120, f"nested decomposition took {elapsed:.1f}s"


def test_term_fns_cartesian_slivers_null_bounded(spark):
    """VERDICT r14 #8: the BIND-join-back entry (sq_term_fns) carries
    two unconditioned CartesianProduct nodes — the all-nullable
    decomposition's null-sliver residual branches. Pin their contract:
    every unconditioned product in the executed plan has exactly one
    side filtered to the NULL-pivot sliver (an `isnull(...)` filter in
    that subtree), and at runtime that sliver side stays within the
    1-row bound the r13 decomposition design promises for this shape
    (an unbounded product in a query path is the r13 281-s BNLJ lesson
    — caught by tests, not luck)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    df = entry_mod.queries()["sq_term_fns"](spark, sf_dir)
    df.count()  # execute so the adaptive final plan carries metrics

    def walk(n, out):
        name = n.nodeName()
        out.append(n)
        if name == "AdaptiveSparkPlan":
            walk(n.executedPlan(), out)
        elif "QueryStage" in name:
            walk(n.plan(), out)
        else:
            ch = n.children()
            for i in range(ch.size()):
                walk(ch.apply(i), out)
        return out

    def first_rows(n):
        for o in walk(n, []):
            m = o.metrics()
            if m.contains("numOutputRows"):
                return m.apply("numOutputRows").value()
        return None

    nodes = walk(df._jdf.queryExecution().executedPlan(), [])
    carts = [n for n in nodes if "CartesianProduct" in n.nodeName()]
    assert carts, "expected the decomposition's sliver products in-plan"
    for cart in carts:
        ch = cart.children()
        sliver_rows = []
        for i in range(ch.size()):
            c = ch.apply(i)
            if "isnull(" in c.toString()[:100_000]:
                sliver_rows.append(first_rows(c))
        assert len(sliver_rows) == 1, (
            "every unconditioned product must have exactly one "
            "null-sliver side"
        )
        assert sliver_rows[0] is not None and sliver_rows[0] <= 1, (
            f"null sliver exceeded its 1-row bound: {sliver_rows[0]} rows"
        )


def test_small_slice_decode_matches_full_decode(spark):
    """Round 15: under a small LIMIT the final dictionary decode runs
    AFTER the slice with the result side broadcast and the dictionary
    streamed (decode_col_small). Pin equivalence against the
    full-decode path (gate forced off) — same rows, same order — and
    that NULL-tolerant (maybe-unbound) projections keep the old path."""
    from graphula_spark.sparql import engine as eng

    triples = [(f"s{i:02d}", "p", f"o{i:02d}") for i in range(20)]
    triples += [("s00", "q", "extra")]
    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(triples, ["s", "p", "o"]),
        cache=False,
    )
    q = "SELECT ?s ?o WHERE { ?s <p> ?o } ORDER BY DESC(?o) LIMIT 7"
    deferred = [tuple(r) for r in g.sparql(q).collect()]
    g2 = Graph(spark, g.triples, g.dictionary)  # fresh plan cache
    old = eng.SMALL_SLICE_DECODE_MAX_ROWS
    try:
        eng.SMALL_SLICE_DECODE_MAX_ROWS = -1  # force the full-decode path
        full = [tuple(r) for r in g2.sparql(q).collect()]
    finally:
        eng.SMALL_SLICE_DECODE_MAX_ROWS = old
    assert deferred == full  # ordered comparison: LIMIT+ORDER semantics
    # maybe-unbound projection (OPTIONAL) stays on the outer-join path
    # and still decodes NULL as unbound
    qo = (
        "SELECT ?s ?x WHERE { ?s <p> ?o . OPTIONAL { ?s <q> ?x } } "
        "ORDER BY ?s LIMIT 3"
    )
    rows = [(r["s"], r["x"]) for r in g.sparql(qo).collect()]
    assert rows == [("s00", "extra"), ("s01", None), ("s02", None)]
