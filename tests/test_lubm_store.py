"""LUBM golden suite against the *persisted* graph layout.

Re-runs all 14 golden queries through Graph.save/load — exercising the
predicate-bucket partition pruning and the OPS-copy routing for
bound-object patterns (most LUBM queries bind o: rdf:type <Class>,
takesCourse <Course0>, ...) — results must match the committed answers
exactly, same as the in-memory suite.
"""

import pytest

from tests.test_lubm_golden import (
    DATA,
    EXPECTED_ROWS,
    PREFIXES,
    QUERIES,
    load_answers,
)


@pytest.fixture(scope="module")
def lubm_store(spark, tmp_path_factory):
    import glob

    from graphula_spark.graph import Graph

    paths = sorted(glob.glob(f"{DATA}/university0_*.nt"))
    store = str(tmp_path_factory.mktemp("lubm") / "store")
    g = Graph.from_ntriples(spark, paths, cache=False)
    g.save(store)
    g2 = Graph.load(spark, store)
    assert g2.triples_ops is not None, "OPS copy must exist in the store"
    yield g2


@pytest.mark.parametrize("n", sorted(QUERIES))
def test_lubm_store_query(lubm_store, n):
    header, expected = load_answers(n)
    df = lubm_store.sparql(PREFIXES + QUERIES[n])
    if header:
        df = df.select(*header)

    def lex(t):
        if t is not None and t.startswith('"') and t.endswith('"'):
            return t[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        return t

    got = sorted(tuple(lex(v) for v in r) for r in df.collect())
    assert len(got) == EXPECTED_ROWS[n], f"Q{n}: {len(got)} rows"
    assert got == expected, f"Q{n} row mismatch on persisted store"
