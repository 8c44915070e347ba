"""W3C SPARQL 1.1 query-evaluation conformance subset.

The reference inherits near-full SPARQL 1.1 conformance from Jena ARQ
(build.sbt:25); this repo re-implements that whole surface, so 50
hand-picked driver oracles are not enough evidence. This harness is a
manifest-style subset of the public W3C rdf-tests query-evaluation
areas (BGP matching, FILTER semantics, OPTIONAL/negation, UNION,
aggregates, property paths, VALUES, subqueries, solution modifiers,
builtin functions), re-authored here with small hand-verifiable
datasets: each case's `expect` is derived BY HAND from the SPARQL 1.1
Query spec (W3C Recommendation 2013-03-21), not from engine output —
a case failing means the engine diverges from the spec.

Conventions (the engine's storage/decode contract):
  * IRIs decode bracket-less; literals decode to verbatim N-Triples
    lexical forms ('"Alice"', '"30"^^<...integer>', '"hi"@en');
    blank nodes decode as '_:label'.
  * SELECT-expression results (BIND/builtins/SUM/AVG/COUNT) are plain
    Spark values (ints, floats, strings); MIN/MAX/SAMPLE return the
    RDF term in lexical form (spec §18.5.1: they pick an ELEMENT of
    the group, and subquery projections must re-unify with term vars).
  * Unbound variables decode as None.

Known-unsupported corners are declared in SKIP with reasons — every
non-skipped case must pass.
"""

from __future__ import annotations

from collections import Counter

import pytest

from graphula_spark.graph import Graph

XSD = "http://www.w3.org/2001/XMLSchema#"
INT = f"^^<{XSD}integer>"
DEC = f"^^<{XSD}decimal>"
DBL = f"^^<{XSD}double>"

PREFIX = """
PREFIX ex: <http://ex/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
"""

# ---------------------------------------------------------------------
# shared datasets (N-Triples text; one graph build per dataset)
# ---------------------------------------------------------------------

DATA_PEOPLE = """
<http://ex/alice> <http://ex/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/bob> <http://ex/age> "25"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/carol> <http://ex/age> "9"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/alice> <http://ex/name> "Alice" .
<http://ex/alice> <http://ex/name> "Alicia"@es .
<http://ex/bob> <http://ex/name> "Bob" .
<http://ex/carol> <http://ex/name> "Carol" .
<http://ex/alice> <http://ex/email> "alice@x.org" .
<http://ex/alice> <http://ex/knows> <http://ex/bob> .
<http://ex/bob> <http://ex/knows> <http://ex/carol> .
<http://ex/alice> <http://ex/height> "1.7"^^<http://www.w3.org/2001/XMLSchema#decimal> .
_:b1 <http://ex/age> "40"^^<http://www.w3.org/2001/XMLSchema#integer> .
""".strip()

DATA_PATHS = """
<http://ex/a> <http://ex/p> <http://ex/b> .
<http://ex/b> <http://ex/p> <http://ex/c> .
<http://ex/c> <http://ex/p> <http://ex/d> .
<http://ex/a> <http://ex/q> <http://ex/e> .
<http://ex/d> <http://ex/p> <http://ex/b> .
<http://ex/e> <http://ex/r> <http://ex/f> .
""".strip()

DATA_AGG = """
<http://ex/o1> <http://ex/cust> <http://ex/c1> .
<http://ex/o1> <http://ex/amount> "10"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/o2> <http://ex/cust> <http://ex/c1> .
<http://ex/o2> <http://ex/amount> "20"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/o3> <http://ex/cust> <http://ex/c2> .
<http://ex/o3> <http://ex/amount> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/o4> <http://ex/cust> <http://ex/c2> .
<http://ex/o5> <http://ex/cust> <http://ex/c3> .
<http://ex/o5> <http://ex/amount> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .
""".strip()

DATA_ONE = """
<http://ex/a> <http://ex/b> <http://ex/c> .
""".strip()

DATA_STR = """
<http://ex/s1> <http://ex/v> "abcab" .
<http://ex/s2> <http://ex/v> "Los Angeles" .
<http://ex/s3> <http://ex/n> "12"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/s4> <http://ex/n> "notnum" .
<http://ex/s5> <http://ex/m> "5" .
<http://ex/t1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/Widget> .
""".strip()

DATASETS = {
    "people": DATA_PEOPLE,
    "paths": DATA_PATHS,
    "agg": DATA_AGG,
    "one": DATA_ONE,
    "str": DATA_STR,
}

#: quad datasets evaluated through Dataset.sparql (named graphs /
#: GRAPH / FROM / FROM NAMED — SPARQL 1.1 §13); g=None is the default
#: graph
QUADS = [
    ("http://ex/alice", "http://ex/knows", "http://ex/bob", None),
    ("http://ex/bob", "http://ex/knows", "http://ex/carol", "http://ex/g1"),
    ("http://ex/carol", "http://ex/knows", "http://ex/dave", "http://ex/g2"),
    # same triple asserted in BOTH named graphs (merge must dedup)
    ("http://ex/x", "http://ex/dup", "http://ex/y", "http://ex/g1"),
    ("http://ex/x", "http://ex/dup", "http://ex/y", "http://ex/g2"),
]

_GRAPHS: dict[str, Graph] = {}


@pytest.fixture(scope="module")
def graphs(spark, tmp_path_factory):
    for key, text in DATASETS.items():
        if key not in _GRAPHS:
            p = tmp_path_factory.mktemp("w3c") / f"{key}.nt"
            p.write_text(text + "\n")
            g = Graph.from_string_triples(
                spark,
                __import__(
                    "graphula_spark.sources.ntriples", fromlist=["read_ntriples"]
                ).read_ntriples(spark, str(p)),
            )
            # conformance runs the STRICT zero-length-path domain (all
            # graph nodes, SPARQL 1.1 §9.3) — the default restricts
            # zero-length to nodes incident to the sub-path's edges, a
            # documented scale deviation (graph.py)
            g.strict_zero_length_paths = True
            _GRAPHS[key] = g
    if "quads" not in _GRAPHS:
        from graphula_spark.dataset import Dataset

        _GRAPHS["quads"] = Dataset.from_string_quads(
            spark, spark.createDataFrame(QUADS, ["s", "p", "o", "g"])
        )
    yield _GRAPHS
    for g in _GRAPHS.values():
        if hasattr(g, "triples"):
            g.triples.unpersist()
        g.dictionary.df.unpersist()
    _GRAPHS.clear()


# ---------------------------------------------------------------------
# manifest
# ---------------------------------------------------------------------
# each case: (name, dataset, query, expect) where expect is a list of
# dicts var->value (multiset compare) — or ("ordered", [rows...]) for
# ORDER BY cases, or ("ask", bool), or ("count", n) when only
# cardinality is spec-determined.

A, B, C, D, E, F_ = (f"http://ex/{x}" for x in "abcdef")
ALICE, BOB, CAROL = (f"http://ex/{x}" for x in ("alice", "bob", "carol"))

CASES = [
    # ---- §5 basic graph patterns -----------------------------------
    (
        "bgp-join-two-patterns",
        "people",
        "SELECT ?x ?y WHERE { ?x ex:knows ?y . ?y ex:knows ?z . }",
        [{"x": ALICE, "y": BOB}],
    ),
    (
        "bgp-no-match",
        "people",
        "SELECT ?x WHERE { ?x ex:knows ex:alice . }",
        [],
    ),
    (
        "bgp-blank-node-in-data",
        "people",
        'SELECT ?s WHERE { ?s ex:age "40"^^xsd:integer . }',
        [{"s": "_:b1"}],
    ),
    # ---- §17.4 / §17.3 filters and functions ------------------------
    (
        "filter-numeric-typed",
        "people",
        "SELECT ?x WHERE { ?x ex:age ?a . FILTER(?a > 26) }",
        [{"x": ALICE}, {"x": "_:b1"}],
    ),
    (
        "filter-numeric-promotion",
        "people",
        # decimal 1.7 compared against integer literal
        "SELECT ?x WHERE { ?x ex:height ?h . FILTER(?h > 1) }",
        [{"x": ALICE}],
    ),
    (
        "filter-in",
        "people",
        "SELECT ?x WHERE { ?x ex:age ?a . FILTER(?a IN (25, 9)) }",
        [{"x": BOB}, {"x": CAROL}],
    ),
    (
        "filter-regex-case-insensitive",
        "people",
        'SELECT ?n WHERE { ex:alice ex:name ?n . FILTER(REGEX(?n, "^ALI", "i")) FILTER(LANG(?n) = "") }',
        [{"n": '"Alice"'}],
    ),
    (
        "filter-lang-and-langmatches",
        "people",
        'SELECT ?n WHERE { ex:alice ex:name ?n . FILTER(LANGMATCHES(LANG(?n), "es")) }',
        [{"n": '"Alicia"@es'}],
    ),
    (
        "filter-isiri-isliteral-isblank",
        "people",
        "SELECT ?s WHERE { ?s ex:age ?a . FILTER(ISBLANK(?s)) }",
        [{"s": "_:b1"}],
    ),
    (
        "filter-str-of-iri",
        "people",
        'SELECT ?x WHERE { ?x ex:knows ?y . FILTER(STR(?y) = "http://ex/bob") }',
        [{"x": ALICE}],
    ),
    (
        "filter-bound",
        "people",
        "SELECT ?x WHERE { ?x ex:age ?a . OPTIONAL { ?x ex:email ?e } FILTER(!BOUND(?e)) }",
        [{"x": BOB}, {"x": CAROL}, {"x": "_:b1"}],
    ),
    (
        "filter-value-eq-vs-sameterm",
        "one",
        # "1"^^integer = "01"^^integer is TRUE (value), sameTerm FALSE
        'SELECT ?s WHERE { ?s ?p ?o . FILTER("1"^^xsd:integer = "01"^^xsd:integer) }',
        [{"s": A}],
    ),
    (
        "filter-sameterm-is-term-not-value",
        "one",
        'SELECT ?s WHERE { ?s ?p ?o . FILTER(!SAMETERM("1"^^xsd:integer, "01"^^xsd:integer)) }',
        [{"s": A}],
    ),
    # ---- §17.3 operand typing: numeric-ness comes from the DATATYPE,
    # not from whether the lexical form parses as a number ------------
    (
        # plain literal "5" vs number 10: type error → row dropped
        "ordering-plain-string-vs-number-type-error",
        "str",
        "SELECT ?s WHERE { ?s ex:m ?v . FILTER(?v < 10) }",
        [],
    ),
    (
        # plain literal "5" vs string "abc": fn:compare on simple
        # literals — codepoint order, "5" < "abc"
        "ordering-plain-literals-compare-lexically",
        "str",
        'SELECT ?s WHERE { ?s ex:m ?v . FILTER(?v < "abc") }',
        [{"s": f"http://ex/{'s5'}"}],
    ),
    (
        # isNumeric checks the datatype (§17.4.2.4), not parseability
        "isnumeric-plain-numeric-text-is-false",
        "str",
        "SELECT ?s WHERE { ?s ex:m ?v . FILTER(ISNUMERIC(?v)) }",
        [],
    ),
    (
        "isnumeric-typed-integer-is-true",
        "str",
        "SELECT ?s WHERE { ?s ex:n ?v . FILTER(ISNUMERIC(?v)) }",
        [{"s": "http://ex/s3"}],
    ),
    (
        # constant string vs constant number: same type error
        "ordering-constant-string-vs-number-type-error",
        "one",
        'SELECT ?s WHERE { ?s ?p ?o . FILTER("5" < 10) }',
        [],
    ),
    (
        # xsd:integer("5") remains a valid string→integer CAST (§17.5)
        "cast-from-plain-numeric-text-still-works",
        "str",
        "SELECT ?s WHERE { ?s ex:m ?v . FILTER(xsd:integer(?v) = 5) }",
        [{"s": "http://ex/s5"}],
    ),
    (
        "filter-if-coalesce",
        "people",
        'SELECT ?x (IF(?a >= 30, "old", "young") AS ?b) WHERE { ?x ex:age ?a . FILTER(!ISBLANK(?x)) }',
        [
            {"x": ALICE, "b": "old"},
            {"x": BOB, "b": "young"},
            {"x": CAROL, "b": "young"},
        ],
    ),
    # ---- §6 OPTIONAL -------------------------------------------------
    (
        "optional-unbound-null",
        "people",
        "SELECT ?x ?e WHERE { ?x ex:knows ?y . OPTIONAL { ?x ex:email ?e } }",
        [{"x": ALICE, "e": '"alice@x.org"'}, {"x": BOB, "e": None}],
    ),
    (
        "optional-filter-scoped-inside",
        "people",
        # the FILTER is part of the optional group: bob's email pattern
        # fails, the optional fails, bob survives with ?e unbound
        'SELECT ?x ?e WHERE { ?x ex:knows ?y . OPTIONAL { ?x ex:email ?e . FILTER(CONTAINS(?e, "@x.org")) } }',
        [{"x": ALICE, "e": '"alice@x.org"'}, {"x": BOB, "e": None}],
    ),
    # ---- §8 negation -------------------------------------------------
    (
        "minus-shared-vars",
        "people",
        "SELECT ?x WHERE { ?x ex:age ?a . MINUS { ?x ex:email ?e } }",
        [{"x": BOB}, {"x": CAROL}, {"x": "_:b1"}],
    ),
    (
        "notexists-basic",
        "people",
        "SELECT ?x WHERE { ?x ex:age ?a . FILTER NOT EXISTS { ?x ex:email ?e } }",
        [{"x": BOB}, {"x": CAROL}, {"x": "_:b1"}],
    ),
    (
        "exists-basic",
        "people",
        "SELECT ?x WHERE { ?x ex:age ?a . FILTER EXISTS { ?x ex:knows ?y } }",
        [{"x": ALICE}, {"x": BOB}],
    ),
    (
        # W3C subtleties test family (spec §8.3.3): MINUS with NO
        # shared variables removes nothing...
        "minus-disjoint-removes-nothing",
        "one",
        "SELECT ?s ?p ?o WHERE { ?s ?p ?o MINUS { ?x ?y ?z } }",
        [{"s": A, "p": B, "o": C}],
    ),
    (
        # ...while FILTER NOT EXISTS with the same groups removes all
        "notexists-disjoint-removes-all",
        "one",
        "SELECT ?s ?p ?o WHERE { ?s ?p ?o FILTER NOT EXISTS { ?x ?y ?z } }",
        [],
    ),
    # ---- §7 UNION ----------------------------------------------------
    (
        "union-disjoint-vars",
        "people",
        "SELECT ?mail ?who WHERE { { ex:alice ex:email ?mail } UNION { ex:bob ex:knows ?who } }",
        [
            {"mail": '"alice@x.org"', "who": None},
            {"mail": None, "who": CAROL},
        ],
    ),
    (
        "union-same-var",
        "people",
        "SELECT ?y WHERE { { ex:alice ex:knows ?y } UNION { ex:bob ex:knows ?y } }",
        [{"y": BOB}, {"y": CAROL}],
    ),
    # ---- §11 aggregates ---------------------------------------------
    (
        "agg-count-star-groups",
        "agg",
        "SELECT ?c (COUNT(*) AS ?n) WHERE { ?o ex:cust ?c . } GROUP BY ?c",
        [
            {"c": "http://ex/c1", "n": 2},
            {"c": "http://ex/c2", "n": 2},
            {"c": "http://ex/c3", "n": 1},
        ],
    ),
    (
        "agg-count-var-skips-unbound",
        "agg",
        "SELECT ?c (COUNT(?a) AS ?n) WHERE { ?o ex:cust ?c . OPTIONAL { ?o ex:amount ?a } } GROUP BY ?c",
        [
            {"c": "http://ex/c1", "n": 2},
            {"c": "http://ex/c2", "n": 1},  # o4 has no amount
            {"c": "http://ex/c3", "n": 1},
        ],
    ),
    (
        "agg-sum-avg-min-max",
        "agg",
        "SELECT ?c (SUM(?a) AS ?s) (AVG(?a) AS ?av) (MIN(?a) AS ?mn) (MAX(?a) AS ?mx) "
        "WHERE { ?o ex:cust ?c . ?o ex:amount ?a . } GROUP BY ?c",
        # SUM/AVG are numeric VALUES; MIN/MAX return the RDF TERM
        # (spec §18.5.1.5/6)
        [
            {"c": "http://ex/c1", "s": 30, "av": 15.0,
             "mn": f'"10"{INT}', "mx": f'"20"{INT}'},
            {"c": "http://ex/c2", "s": 5, "av": 5.0,
             "mn": f'"5"{INT}', "mx": f'"5"{INT}'},
            {"c": "http://ex/c3", "s": 7, "av": 7.0,
             "mn": f'"7"{INT}', "mx": f'"7"{INT}'},
        ],
    ),
    (
        "agg-min-orders-numerically-not-lexically",
        "people",
        # ages {30,25,9,40}: numeric MIN is 9; LEXICAL min would be "25"
        "SELECT (MIN(?a) AS ?mn) (MAX(?a) AS ?mx) WHERE { ?x ex:age ?a . }",
        [{"mn": f'"9"{INT}', "mx": f'"40"{INT}'}],
    ),
    (
        "agg-group-concat-separator",
        "agg",
        'SELECT ?c (GROUP_CONCAT(STR(?a); SEPARATOR="|") AS ?g) '
        "WHERE { ?o ex:cust ?c . ?o ex:amount ?a . } GROUP BY ?c ORDER BY ?c",
        # group order within concat is implementation-defined; c1's two
        # values may concat either way — normalize in the comparator
        [
            {"c": "http://ex/c1", "g": {"10|20", "20|10"}},
            {"c": "http://ex/c2", "g": {"5"}},
            {"c": "http://ex/c3", "g": {"7"}},
        ],
    ),
    (
        "agg-sample-singleton-deterministic",
        "agg",
        "SELECT ?c (SAMPLE(?a) AS ?one) WHERE { ?o ex:cust ?c . ?o ex:amount ?a . FILTER(?a < 10) } GROUP BY ?c",
        [
            {"c": "http://ex/c2", "one": f'"5"{INT}'},
            {"c": "http://ex/c3", "one": f'"7"{INT}'},
        ],
    ),
    (
        "agg-having",
        "agg",
        "SELECT ?c WHERE { ?o ex:cust ?c . ?o ex:amount ?a . } GROUP BY ?c HAVING (SUM(?a) > 6)",
        [{"c": "http://ex/c1"}, {"c": "http://ex/c3"}],
    ),
    (
        "agg-count-distinct",
        "agg",
        "SELECT (COUNT(DISTINCT ?c) AS ?n) WHERE { ?o ex:cust ?c . }",
        [{"n": 3}],
    ),
    (
        "agg-count-empty-is-zero",
        "agg",
        "SELECT (COUNT(?o) AS ?n) WHERE { ?o ex:cust <http://ex/nobody> . }",
        [{"n": 0}],
    ),
    (
        "agg-implicit-group-all",
        "agg",
        "SELECT (SUM(?a) AS ?total) WHERE { ?o ex:amount ?a . }",
        [{"total": 42}],
    ),
    # ---- §9 property paths ------------------------------------------
    (
        "path-sequence",
        "paths",
        "SELECT ?z WHERE { ex:a ex:p/ex:p ?z . }",
        [{"z": C}],
    ),
    (
        "path-alternative",
        "paths",
        "SELECT ?z WHERE { ex:a ex:p|ex:q ?z . }",
        [{"z": B}, {"z": E}],
    ),
    (
        "path-inverse",
        "paths",
        "SELECT ?x WHERE { ex:b ^ex:p ?x . }",
        [{"x": A}, {"x": D}],
    ),
    (
        "path-oneplus-cycle-no-dups",
        "paths",
        # b->c->d->b cycle: b+ reaches {c,d,b}, each once
        "SELECT ?z WHERE { ex:b ex:p+ ?z . }",
        [{"z": B}, {"z": C}, {"z": D}],
    ),
    (
        "path-star-includes-zero-length",
        "paths",
        "SELECT ?z WHERE { ex:e ex:p* ?z . }",
        [{"z": E}],  # no p-edges from e; zero-length still binds e
    ),
    (
        "path-zero-or-one",
        "paths",
        "SELECT ?z WHERE { ex:a ex:p? ?z . }",
        [{"z": A}, {"z": B}],
    ),
    (
        "path-negated-property-set",
        "paths",
        "SELECT ?z WHERE { ex:a !(ex:q) ?z . }",
        [{"z": B}],
    ),
    (
        "path-sequence-with-inverse",
        "paths",
        # a --p--> b <--p-- d : siblings via p/^p (excluding nothing)
        "SELECT ?x WHERE { ex:a ex:p/^ex:p ?x . }",
        [{"x": A}, {"x": D}],
    ),
    # ---- §10.2 VALUES ------------------------------------------------
    (
        "values-inline-undef",
        "people",
        """SELECT ?x ?e WHERE { ?x ex:age ?a .
             VALUES (?x ?e) { (ex:alice "alice@x.org") (ex:bob UNDEF) } }""",
        [{"x": ALICE, "e": '"alice@x.org"'}, {"x": BOB, "e": None}],
    ),
    (
        "values-join-compatibility",
        "people",
        # UNDEF joins with anything; a bound mismatch eliminates
        """SELECT ?x ?e WHERE { ?x ex:email ?e .
             VALUES (?x ?e) { (ex:alice UNDEF) (ex:bob "nope") } }""",
        [{"x": ALICE, "e": '"alice@x.org"'}],
    ),
    # ---- §12 subqueries ----------------------------------------------
    (
        "subquery-agg-join",
        "agg",
        """SELECT ?o WHERE {
             ?o ex:amount ?a .
             { SELECT (MAX(?a2) AS ?a) WHERE { ?x ex:amount ?a2 } }
           }""",
        [{"o": "http://ex/o2"}],
    ),
    # ---- §15 solution modifiers --------------------------------------
    (
        "order-by-numeric-not-lexical",
        "people",
        "SELECT ?x WHERE { ?x ex:age ?a . FILTER(!ISBLANK(?x)) } ORDER BY ?a",
        ("ordered", [{"x": CAROL}, {"x": BOB}, {"x": ALICE}]),
    ),
    (
        "order-by-desc-limit-offset",
        "people",
        "SELECT ?x WHERE { ?x ex:age ?a . FILTER(!ISBLANK(?x)) } ORDER BY DESC(?a) LIMIT 1 OFFSET 1",
        ("ordered", [{"x": BOB}]),
    ),
    (
        "distinct-projection",
        "agg",
        "SELECT DISTINCT ?c WHERE { ?o ex:cust ?c . }",
        [
            {"c": "http://ex/c1"},
            {"c": "http://ex/c2"},
            {"c": "http://ex/c3"},
        ],
    ),
    (
        "select-expression",
        "people",
        "SELECT ?x ((?a + 1) * 2 AS ?v) WHERE { ex:bob ex:age ?a . BIND(ex:bob AS ?x) }",
        [{"x": BOB, "v": 52}],
    ),
    # ---- §17.4 builtin functions over strings/numbers ----------------
    (
        "fn-strlen-ucase-substr",
        "people",
        """SELECT (STRLEN(?n) AS ?l) (UCASE(?n) AS ?u) (SUBSTR(?n, 1, 2) AS ?s2)
           WHERE { ex:bob ex:name ?n . }""",
        [{"l": 3, "u": "BOB", "s2": "Bo"}],
    ),
    (
        "fn-concat-contains-strstarts",
        "people",
        """SELECT ?x WHERE { ?x ex:name ?n .
             FILTER(STRSTARTS(?n, "Ca") && CONTAINS(?n, "aro") && STRENDS(?n, "ol")) }""",
        [{"x": CAROL}],
    ),
    (
        "fn-numeric-abs-ceil-floor-round",
        "one",
        """SELECT (ABS(-2) AS ?a) (CEIL(1.2) AS ?c) (FLOOR(1.8) AS ?f) (ROUND(1.5) AS ?r)
           WHERE { ?s ?p ?o . }""",
        [{"a": 2, "c": 2, "f": 1, "r": 2}],
    ),
    (
        "fn-datatype-and-str",
        "people",
        "SELECT (DATATYPE(?a) AS ?dt) (STR(?a) AS ?sv) WHERE { ex:bob ex:age ?a . }",
        [{"dt": f"{XSD}integer", "sv": "25"}],
    ),
    (
        "fn-coalesce-unbound",
        "people",
        """SELECT ?x (COALESCE(?e, "none") AS ?v) WHERE {
             ?x ex:knows ?y . OPTIONAL { ?x ex:email ?e } }""",
        [{"x": ALICE, "v": "alice@x.org"}, {"x": BOB, "v": "none"}],
    ),
    # ---- §13 named graphs / RDF datasets (Dataset.sparql) -----------
    (
        "graph-var-enumerates-named-graphs-only",
        "quads",
        "SELECT ?g ?s WHERE { GRAPH ?g { ?s ex:knows ?o } }",
        [
            {"g": "http://ex/g1", "s": BOB},
            {"g": "http://ex/g2", "s": CAROL},
        ],
    ),
    (
        "graph-iri-scopes-to-one-graph",
        "quads",
        "SELECT ?s WHERE { GRAPH <http://ex/g1> { ?s ex:knows ?o } }",
        [{"s": BOB}],
    ),
    (
        "default-graph-excludes-named-triples",
        "quads",
        "SELECT ?s WHERE { ?s ex:knows ?o }",
        [{"s": ALICE}],
    ),
    (
        "from-merge-dedups-shared-triple",
        "quads",
        """SELECT ?x FROM <http://ex/g1> FROM <http://ex/g2>
           WHERE { ?x ex:dup ?y }""",
        [{"x": "http://ex/x"}],  # asserted in both graphs; merge = set
    ),
    (
        "from-named-restricts-graph-enumeration",
        "quads",
        """SELECT ?g ?s FROM NAMED <http://ex/g2>
           WHERE { GRAPH ?g { ?s ex:knows ?o } }""",
        [{"g": "http://ex/g2", "s": CAROL}],
    ),
    (
        "graph-joins-with-default-graph",
        "quads",
        """SELECT ?c WHERE {
             ?a ex:knows ?b . GRAPH <http://ex/g1> { ?b ex:knows ?c } }""",
        [{"c": CAROL}],
    ),
    # ---- §10.1 CONSTRUCT --------------------------------------------
    (
        "construct-template-instantiation",
        "people",
        """CONSTRUCT { ?x <http://ex/aged> ?a }
           WHERE { ?x ex:age ?a . FILTER(?a > 26) }""",
        [
            {"s": ALICE, "p": "http://ex/aged", "o": f'"30"{INT}'},
            {"s": "_:b1", "p": "http://ex/aged", "o": f'"40"{INT}'},
        ],
    ),
    # ---- rdf:type shorthand -----------------------------------------
    (
        "a-keyword-is-rdf-type",
        "str",
        "SELECT ?t WHERE { ?t a <http://ex/Widget> }",
        [{"t": "http://ex/t1"}],
    ),
    # ---- more §17.4 builtins ----------------------------------------
    (
        "fn-replace",
        "str",
        """SELECT (REPLACE(?v, "b", "Z") AS ?r)
           WHERE { <http://ex/s1> <http://ex/v> ?v }""",
        [{"r": "aZcaZ"}],
    ),
    (
        "fn-strbefore-strafter-and-no-match",
        "str",
        """SELECT (STRBEFORE(?v, "c") AS ?b) (STRAFTER(?v, "c") AS ?a)
                  (STRBEFORE(?v, "xyz") AS ?none)
           WHERE { <http://ex/s1> <http://ex/v> ?v }""",
        [{"b": "ab", "a": "ab", "none": ""}],
    ),
    (
        "fn-encode-for-uri",
        "str",
        """SELECT (ENCODE_FOR_URI(?v) AS ?e)
           WHERE { <http://ex/s2> <http://ex/v> ?v }""",
        [{"e": "Los%20Angeles"}],
    ),
    (
        "fn-md5-sha256-known-vectors",
        "one",
        'SELECT (MD5("abc") AS ?m) (SHA256("abc") AS ?s) WHERE { ?x ?p ?o }',
        [
            {
                "m": "900150983cd24fb0d6963f7d28e17f72",
                "s": (
                    "ba7816bf8f01cfea414140de5dae2223"
                    "b00361a396177a9cb410ff61f20015ad"
                ),
            }
        ],
    ),
    (
        "fn-isnumeric",
        "str",
        "SELECT ?s WHERE { ?s <http://ex/n> ?n . FILTER(ISNUMERIC(?n)) }",
        [{"s": "http://ex/s3"}],
    ),
    (
        "fn-iri-constructor-comparison",
        "str",
        """SELECT ?v WHERE { ?s <http://ex/v> ?v .
             FILTER(?s = IRI("http://ex/s1")) }""",
        [{"v": '"abcab"'}],
    ),
    # ---- §9 property-path compositions ------------------------------
    (
        "path-alt-of-sequences",
        "paths",
        "SELECT ?z WHERE { ex:a (ex:p/ex:p)|ex:q ?z . }",
        [{"z": C}, {"z": E}],
    ),
    (
        "path-star-over-alternative",
        "paths",
        # from e: zero-length e; r reaches f; q reaches nothing from e
        "SELECT ?z WHERE { ex:e (ex:q|ex:r)* ?z . }",
        [{"z": E}, {"z": F_}],
    ),
    (
        "path-negated-set-multiple-members",
        "paths",
        "SELECT ?z WHERE { ex:a !(ex:q|ex:r) ?z . }",
        [{"z": B}],
    ),
    (
        "path-plus-of-inverse",
        "paths",
        # ^p steps: d<-c<-b<-{a,d}; closure visits the b/c/d cycle + a
        "SELECT ?z WHERE { ex:d (^ex:p)+ ?z . }",
        [{"z": A}, {"z": B}, {"z": C}, {"z": D}],
    ),
    # ---- batch 3: scoping / modifiers / corner compositions ----------
    (
        "optional-nested",
        "people",
        """SELECT ?x ?y ?z ?w WHERE { ?x ex:knows ?y .
             OPTIONAL { ?y ex:knows ?z OPTIONAL { ?z ex:knows ?w } } }""",
        [
            {"x": ALICE, "y": BOB, "z": CAROL, "w": None},
            {"x": BOB, "y": CAROL, "z": None, "w": None},
        ],
    ),
    (
        "group-by-bound-expression-var",
        "people",
        """SELECT ?k (COUNT(*) AS ?n) WHERE {
             ?x ex:age ?a . BIND(?a > 10 AS ?k) } GROUP BY ?k""",
        [{"k": True, "n": 3}, {"k": False, "n": 1}],
    ),
    (
        "order-by-two-keys-with-ties",
        "agg",
        "SELECT ?o WHERE { ?o ex:cust ?c } ORDER BY ?c DESC(?o)",
        (
            "ordered",
            [
                {"o": "http://ex/o2"},
                {"o": "http://ex/o1"},
                {"o": "http://ex/o4"},
                {"o": "http://ex/o3"},
                {"o": "http://ex/o5"},
            ],
        ),
    ),
    (
        "union-filter-scoped-to-branch",
        "people",
        """SELECT ?x WHERE {
             { ?x ex:age ?a . FILTER(?a < 10) } UNION { ?x ex:email ?e } }""",
        [{"x": CAROL}, {"x": ALICE}],
    ),
    (
        "minus-with-inner-filter",
        "people",
        """SELECT ?x WHERE { ?x ex:age ?a
             MINUS { ?x ex:age ?b . FILTER(?b > 26) } }""",
        [{"x": BOB}, {"x": CAROL}],
    ),
    (
        "subquery-order-limit-joins-outer",
        "people",
        """SELECT ?s WHERE { ?s ex:age ?a .
             { SELECT ?a WHERE { ?x ex:age ?a } ORDER BY DESC(?a) LIMIT 1 } }""",
        [{"s": "_:b1"}],
    ),
    (
        "trailing-values-clause",
        "people",
        "SELECT ?x WHERE { ?x ex:age ?a } VALUES ?x { ex:alice }",
        [{"x": ALICE}],
    ),
    (
        "langmatches-star-excludes-plain",
        "people",
        'SELECT ?n WHERE { ex:alice ex:name ?n . FILTER(LANGMATCHES(LANG(?n), "*")) }',
        [{"n": '"Alicia"@es'}],
    ),
    (
        "strlang-lang-roundtrip",
        "one",
        'SELECT (LANG(STRLANG("x", "en")) AS ?l) WHERE { ?s ?p ?o }',
        [{"l": "en"}],
    ),
    # ---- ASK ----------------------------------------------------------
    (
        "ask-true",
        "people",
        "ASK { ex:alice ex:knows ex:bob }",
        ("ask", True),
    ),
    (
        "ask-false",
        "people",
        "ASK { ex:bob ex:knows ex:alice }",
        ("ask", False),
    ),
]

#: known-unsupported corners, name -> reason (none currently — every
#: authored case must pass; populate with a reason if a documented
#: engine deviation ever lands here)
SKIP: dict[str, str] = {}


def _norm(v):
    """Normalize a collected Spark value for comparison: Decimals to
    float/int, everything else as-is."""
    import decimal

    if isinstance(v, decimal.Decimal):
        f = float(v)
        return int(f) if f.is_integer() else f
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


def _row_key(d: dict) -> tuple:
    return tuple(sorted((k, _norm(v)) for k, v in d.items()))


@pytest.mark.parametrize(
    "name,dataset,query,expect",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_w3c_case(graphs, name, dataset, query, expect):
    if name in SKIP:
        pytest.skip(SKIP[name])
    g = graphs[dataset]
    df = g.sparql(PREFIX + query)
    if isinstance(expect, tuple) and expect[0] == "ask":
        assert df.collect()[0][0] is expect[1]
        return
    rows = [r.asDict() for r in df.collect()]
    if isinstance(expect, tuple) and expect[0] == "ordered":
        want = expect[1]
        got = [{k: _norm(r[k]) for k in w} for r, w in zip(rows, want)]
        assert len(rows) == len(want) and got == [
            {k: _norm(v) for k, v in w.items()} for w in want
        ], (got, want)
        return
    # set-valued cells (e.g. GROUP_CONCAT order) match any member
    def matches(row: dict, want: dict) -> bool:
        if set(row) != set(want):
            return False
        for k, wv in want.items():
            gv = _norm(row[k])
            if isinstance(wv, set):
                if gv not in {_norm(x) for x in wv}:
                    return False
            elif gv != _norm(wv):
                return False
        return True

    assert len(rows) == len(expect), (rows, expect)
    unmatched = list(expect)
    for r in rows:
        hit = next((w for w in unmatched if matches(r, w)), None)
        assert hit is not None, (r, unmatched)
        unmatched.remove(hit)
    assert not unmatched


def test_every_case_has_unique_name():
    names = [c[0] for c in CASES]
    assert len(names) == len(set(names))


# ---------------------------------------------------------------------
# negative syntax (W3C syntax-test style): malformed queries must fail
# at parse, not produce wrong answers
# ---------------------------------------------------------------------

BAD_SYNTAX = [
    ("unclosed-group", "SELECT ?x WHERE { ?x ?p ?o "),
    ("triple-missing-object", "SELECT ?x WHERE { ?x <http://ex/p> . }"),
    ("filter-unbalanced-parens", "SELECT ?x WHERE { ?x ?p ?o FILTER((?x) }"),
    ("values-arity-mismatch", '''SELECT * WHERE {
        VALUES (?a ?b) { ("x") } ?s ?p ?o }'''),
    ("order-by-nothing", "SELECT ?x WHERE { ?x ?p ?o } ORDER BY"),
]


@pytest.mark.parametrize(
    "name,query", BAD_SYNTAX, ids=[n for n, _ in BAD_SYNTAX]
)
def test_bad_syntax_raises(graphs, name, query):
    from graphula_spark.sparql.parser import parse_sparql

    with pytest.raises((SyntaxError, NotImplementedError)):
        parse_sparql(query)
