#!/usr/bin/env python
"""Interleaved A/B probe for the r14 VERDICT regression-tail keys.

Runs the anomalous bench keys (plus tpch controls) with the exact bench
methodology (1 warmup + 3 timed runs, median) in ONE fresh session and
prints one JSON line. Invoked alternately from the HEAD checkout and a
r13 (bf2295c) worktree so host variance hits both sides equally.

Usage: python tools/ab_r15.py <side-tag> [key ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from graphula_spark.session import get_spark  # noqa: E402

DEFAULT_KEYS = [
    "events_temporal_join",
    "text_decontam",
    "rdfs_derive_events",
    "bucketed_q3",
    "bucketed_q18",
    "bucketed_q21",
    "events_window",
    "text_urls",
    "text_tfidf",
    "text_profile",
    "lubm_load",
    # controls: plans identical both sides, driver showed 0.64-0.93x
    "tpch_q3",
    "tpch_q6",
    "tpch_q9",
]


def timed_median(run, name):
    run()  # warmup
    samples = []
    for _ in range(3):
        t0 = time.time()
        run()
        samples.append(time.time() - t0)
    samples.sort()
    return samples[1]


def main() -> None:
    side = sys.argv[1]
    keys = sys.argv[2:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("graphula-ab-r15")
    spark.sparkContext.setLogLevel("ERROR")

    queries = dict(entry_mod.queries())
    queries["rdfs_derive_events"] = entry_mod.q_rdfs_derive_events
    queries["text_decontam"] = entry_mod.q_text_decontam_ngram

    from graphula_spark import tpch

    out: dict[str, float] = {}
    for name in keys:
        spark.sparkContext.setJobDescription(f"ab {side} {name}")
        if name == "ds_reduce_rdfs":
            import bench

            run = bench._ds_reduce_thunk(spark, sf_dir)
            out[name] = round(timed_median(run, name), 3)
            continue
        if name == "lubm_load":
            import glob

            from graphula_spark.graph import Graph

            lubm_paths = sorted(
                glob.glob("/root/reference/benchmarks/data/university0_*.nt")
            )
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            t0 = time.time()
            g = Graph.from_ntriples(spark, lubm_paths)
            g.triples.count()
            g.stats
            out[name] = round(time.time() - t0, 3)
            g.triples.unpersist()
            g.dictionary.df.unpersist()
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            continue
        if name.startswith("bucketed_"):
            bkt_loc = "/tmp/graphula_tpch_bucketed/" + sf_dir.strip("/").replace(
                "/", "_"
            )
            if sf_dir not in tpch.BUCKETED:
                tpch.register_bucketed(spark, bkt_loc)
            fn = tpch.QUERIES[name.replace("bucketed_", "tpch_")]
        elif name.startswith("tpch_"):
            tpch.BUCKETED.pop(sf_dir, None)  # plain-parquet side
            fn = tpch.QUERIES[name]
        else:
            fn = queries[name]
        out[name] = round(
            timed_median(lambda fn=fn: fn(spark, sf_dir).count(), name), 3
        )

    print(json.dumps({"side": side, "t": round(time.time(), 1), "keys": out}))


if __name__ == "__main__":
    main()
