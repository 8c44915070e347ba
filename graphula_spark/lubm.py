"""LUBM(1-university) benchmark queries + golden cardinalities.

SPARQL text mirrors the reference's Lubm.queries
(benchmarks/src/main/scala/com/graphula/benchmarks/lubm/Lubm.scala:33-172);
expected row counts come from the committed answer files
(benchmarks/data/answers_query{n}.txt, validated row-exact by
tests/test_lubm_golden.py). Shared by the golden test-suite and
bench.py so there is exactly one copy of the query text.
"""

DATA_DIR = "/root/reference/benchmarks/data"

PREFIXES = """
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX ub: <http://swat.cse.lehigh.edu/onto/univ-bench.owl#>
"""

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
