#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Graph construction (triple-ization + dictionary build) is timed
separately as "graph_load" and warmed before per-query timing, matching
how the reference's JMH suite loads LUBM once per trial
(benchmarks/.../LubmGraphula.scala:23-34).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from graphula_spark.session import get_spark  # noqa: E402

# headline subset: engine joins/aggs + every extension family
HEADLINE = [
    "bgp_join",
    "bgp_star",
    "bgp_count",
    "sq_filter",
    "sq_optional",
    "sq_groupby_agg",
    "sq_lineitem_agg",
    "sq_order_limit",
    "sq_minus",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "dedup_embedding",
    "events_stateful",
    "rel_transitive_closure",
    "text_token_count",
    "text_langid",
    "text_fingerprint",
    "mm_features",
    "events_window",
    "events_sessionize",
    "events_asof",
    "rel_topn_per_group",
    "rel_window_running",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("graphula-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    t0 = time.time()
    entry_mod._graph(spark, sf_dir)  # warm the shared graphs once
    entry_mod._lineitem_graph(spark, sf_dir)
    graph_load = time.time() - t0

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    per_query["graph_load"] = round(graph_load, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
