#!/usr/bin/env python
"""Round-14 probe (VERDICT r13 #7): the BIND-join-back SPARQL shape at
~sf1 — the shape whose all-nullable compatibility join planned as a
single-task BroadcastNestedLoopJoin for ~9 rounds (281 s at sf0.1,
PLANS.md §37) until the round-13 pivot decomposition.

Round 13 measured the fix only at sf0.1. This drives the SAME shape
(`sq_term_fns`: ?o <o_custkey> ?ck . BIND(IRI(...) AS ?cust) .
?cust <c_name> ?name) and a NESTED variant (the decomposition inside
an OPTIONAL, so the left_outer uid branch engages too) against the ×10
replicated store, recording wall, shuffle bytes, and max-task seconds
— the §37 claim is that the work rides hash joins whose max task
scales with partition size, not with |L|·|R|.

Run:  PYTHONPATH=/root/repo python tools/probe_r14.py
Writes a summary to stdout; paste the numbers into PLANS.md §37's
sf1 addendum.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.probe_r12 import measure_tasks  # noqa: E402
from tools.probe_r8 import get_probe_spark  # noqa: E402

NESTED_QUERY = """SELECT ?o ?name ?mk WHERE {
     ?o <o_custkey> ?ck .
     BIND(IRI(CONCAT("customer:", STR(?ck))) AS ?cust)
     OPTIONAL {
       ?cust <c_name> ?name .
       BIND(IRI(CONCAT("nation:", STR(?name))) AS ?nk)
       OPTIONAL { ?nk <n_name> ?mk }
     } }"""


def main() -> None:
    spark = get_probe_spark()
    spark.sparkContext.setLogLevel("ERROR")
    os.chdir("/root/repo")
    import __spark_entry__ as e
    from bench import ensure_sf1

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = ensure_sf1(spark, base)
    g = e._graph(spark, sf1)

    def run_flat():
        return e.q_term_fns(spark, sf1).count()

    def run_nested():
        return g.sparql(NESTED_QUERY).count()

    # warm once each (codegen/JIT), then measure
    n_flat = run_flat()
    n_nested = run_nested()
    print(f"rows: flat={n_flat:,} nested={n_nested:,}")
    results = {}
    for label, fn in (("flat sq_term_fns", run_flat),
                      ("nested optional variant", run_nested)):
        wall, shuf, worst = measure_tasks(spark, f"{label} @ sf1", fn)
        results[label] = (wall, shuf, worst)
    print("\nPLANS.md §37 sf1 addendum numbers "
          "(wall_s / shuffle_MB / max_task_s):")
    for label, (wall, shuf, worst) in results.items():
        print(f"  {label}: {wall:.1f} / {shuf/1e6:.0f} / {worst:.1f}")
    # the §37 failure mode was ONE task holding the whole cross
    # product; at ×10 data a healthy decomposition keeps max-task at
    # partition scale (well under a tenth of wall on 32 threads)
    for label, (wall, shuf, worst) in results.items():
        assert worst < max(10.0, wall), (label, worst)


if __name__ == "__main__":
    main()
