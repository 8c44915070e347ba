#!/usr/bin/env python
"""Capture .explain("formatted") for every queries() entry (plus the
bench-only keys) into plans/<tag>/<name>_<suffix>.txt — the
optimization round's before/after plan evidence.

Usage: python tools/capture_plans.py <tag> <suffix> [only_name ...]
e.g.   python tools/capture_plans.py r14 before
       python tools/capture_plans.py r14 after rel_importance rel_pagerank
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from graphula_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("graphula-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    queries = dict(entry_mod.queries())
    # bench-only keys, same extra set bench.py times
    queries["rel_graph_reach_part"] = entry_mod.q_graph_reach
    queries["rdfs_closure_part"] = entry_mod.q_rdfs_closure
    queries["rdfs_derive_events_part"] = entry_mod.q_rdfs_derive_events
    queries["rel_pagerank_part"] = entry_mod.q_pagerank

    for name, fn in queries.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            spark.sparkContext.setJobDescription(f"plan-capture {name}")
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure
            txt = f"EXPLAIN FAILED: {e!r}\n"
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
