"""LUBM golden-answer suite: all 14 queries row-exact vs committed answers.

Port of the reference's GroundTruthSpec (benchmarks/src/test/scala/com/
graphula/benchmarks/lubm/GroundTruthSpec.scala:25-168): load the 15
LUBM(1) .nt files, run each SPARQL query, compare the full sorted row
set against benchmarks/data/answers_query{n}.txt.
"""

import glob

import pytest

DATA = "/root/reference/benchmarks/data"

PREFIXES = """
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX ub: <http://swat.cse.lehigh.edu/onto/univ-bench.owl#>
"""

# SPARQL text mirrors the reference's Lubm.queries (benchmarks/src/main/
# scala/com/graphula/benchmarks/lubm/Lubm.scala:33-172)
QUERIES = {
    1: """SELECT ?X WHERE {
  ?X ub:takesCourse <http://www.Department0.University0.edu/GraduateCourse0> .
  ?X rdf:type ub:GraduateStudent .
}""",
    2: """SELECT ?X ?Y ?Z WHERE {
  ?Z rdf:type ub:Department .
  ?Z ub:subOrganizationOf ?Y .
  ?Y rdf:type ub:University .
  ?X ub:undergraduateDegreeFrom ?Y .
  ?X ub:memberOf ?Z .
  ?X rdf:type ub:GraduateStudent .
}""",
    3: """SELECT ?X WHERE {
  ?X ub:publicationAuthor <http://www.Department0.University0.edu/AssistantProfessor0> .
  ?X rdf:type ub:Publication .
}""",
    4: """SELECT ?X ?Y1 ?Y2 ?Y3 WHERE {
  ?X ub:worksFor <http://www.Department0.University0.edu> .
  ?X rdf:type ub:Professor .
  ?X ub:name ?Y1 .
  ?X ub:emailAddress ?Y2 .
  ?X ub:telephone ?Y3 .
}""",
    5: """SELECT ?X WHERE {
  ?X ub:memberOf <http://www.Department0.University0.edu> .
  ?X rdf:type ub:Person .
}""",
    6: """SELECT ?X WHERE {?X rdf:type ub:Student}""",
    7: """SELECT ?X ?Y WHERE {
  <http://www.Department0.University0.edu/AssociateProfessor0> ub:teacherOf ?Y .
  ?Y rdf:type ub:Course .
  ?X ub:takesCourse ?Y .
  ?X rdf:type ub:Student .
}""",
    8: """SELECT ?X ?Y ?Z WHERE {
  ?Y ub:subOrganizationOf <http://www.University0.edu> .
  ?Y rdf:type ub:Department .
  ?X ub:memberOf ?Y .
  ?X rdf:type ub:Student .
  ?X ub:emailAddress ?Z .
}""",
    9: """SELECT ?X ?Y ?Z WHERE {
  ?Y rdf:type ub:Faculty .
  ?Y ub:teacherOf ?Z .
  ?X ub:advisor ?Y .
  ?X ub:takesCourse ?Z .
  ?Z rdf:type ub:Course .
  ?X rdf:type ub:Student .
}""",
    10: """SELECT ?X WHERE {
  ?X ub:takesCourse <http://www.Department0.University0.edu/GraduateCourse0> .
  ?X rdf:type ub:Student .
}""",
    11: """SELECT ?X WHERE {
  ?X ub:subOrganizationOf <http://www.University0.edu> .
  ?X rdf:type ub:ResearchGroup .
}""",
    12: """SELECT ?X ?Y WHERE {
  ?Y ub:subOrganizationOf <http://www.University0.edu> .
  ?Y rdf:type ub:Department .
  ?X ub:worksFor ?Y .
  ?X rdf:type ub:Chair .
}""",
    13: """SELECT ?X WHERE {
  <http://www.University0.edu> ub:hasAlumnus ?X .
  ?X rdf:type ub:Person .
}""",
    14: """SELECT ?X WHERE { ?X rdf:type ub:UndergraduateStudent . }""",
}

EXPECTED_ROWS = {
    1: 4, 2: 0, 3: 6, 4: 34, 5: 719, 6: 7790, 7: 67,
    8: 7790, 9: 208, 10: 4, 11: 224, 12: 15, 13: 1, 14: 5916,
}


def load_answers(n):
    """Answer TSV: header of var names + rows, or 'NO ANSWERS.'
    (GroundTruthSpec.scala:149-168)."""
    lines = [
        line.rstrip("\n")
        for line in open(f"{DATA}/answers_query{n}.txt", encoding="utf-8")
    ]
    lines = [l for l in lines if l != ""]
    if lines and lines[0].strip() == "NO ANSWERS.":
        return [], []
    header = lines[0].split("\t")
    rows = sorted(tuple(l.split("\t")) for l in lines[1:])
    return header, rows


@pytest.fixture(scope="module")
def lubm(spark):
    from graphula_spark.graph import Graph

    paths = sorted(glob.glob(f"{DATA}/university0_*.nt"))
    assert len(paths) == 15
    g = Graph.from_ntriples(spark, paths)
    g.triples.count()  # materialize cache
    yield g
    g.triples.unpersist()
    g.dictionary.df.unpersist()


@pytest.mark.parametrize("n", sorted(QUERIES))
def test_lubm_query(lubm, n):
    header, expected = load_answers(n)
    df = lubm.sparql(PREFIXES + QUERIES[n])
    # project in the answer file's variable order
    if header:
        df = df.select(*header)
    def lex(t):
        # answer files hold Jena node strings: plain literals appear in
        # lexical form without quotes (GroundTruthSpec normalization)
        if t is not None and t.startswith('"') and t.endswith('"'):
            return t[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        return t

    got = sorted(tuple(lex(v) for v in r) for r in df.collect())
    assert len(got) == EXPECTED_ROWS[n], f"Q{n}: {len(got)} rows, want {EXPECTED_ROWS[n]}"
    assert got == expected, f"Q{n} row mismatch"
