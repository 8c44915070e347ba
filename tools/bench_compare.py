#!/usr/bin/env python
"""Compare two bench JSON files per query: prints ratio-sorted deltas
over the common keys (loads and section rollups excluded), section
sums, and the sf1 sub-section. Usage:

    python tools/bench_compare.py BENCH_r07.json /tmp/bench_r8.json
"""

from __future__ import annotations

import json
import sys

EXCLUDE = {"graph_build_s", "graph_load", "lubm_load"}


def load(path: str) -> dict:
    import re

    with open(path) as fh:
        d = json.load(fh)
    if "parsed" not in d and "queries" in d:
        return d  # a raw bench line
    if d.get("parsed"):
        return d["parsed"]
    # driver BENCH_r{N}.json with a truncated, unparseable tail:
    # regex-recover the "name": number pairs; pairs after '"sf1":'
    # belong to the sf1 section
    tail = d.get("tail", "")
    head, _, sf1_part = tail.partition('"sf1":')
    meta = {"sf", "warmup_iters", "floor_s", "value", "timed_runs", "prep_s", "copies"}

    def pairs(text):
        return {
            k: float(v)
            for k, v in re.findall(r'"([\w.]+)":\s*([\d.]+)', text)
            if k not in meta and not k.startswith("store")
        }

    return {
        "queries": pairs(head.split('"sections"')[0]),
        "sections": {},
        "sf1": {"queries": pairs(sf1_part)} if sf1_part else None,
    }


def main(a_path: str, b_path: str) -> None:
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    common = sorted((set(qa) & set(qb)) - EXCLUDE)
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    print(
        f"common keys: {len(common)}  {a_path}: {ta:.1f}s  "
        f"{b_path}: {tb:.1f}s  ratio {tb/ta:.2f}x"
    )
    rows = sorted(common, key=lambda k: qb[k] / max(qa[k], 1e-9))
    print("\nbiggest improvements:")
    for k in rows[:8]:
        print(f"  {k}: {qa[k]:.2f} -> {qb[k]:.2f}  ({qb[k]/max(qa[k],1e-9):.2f}x)")
    print("\nbiggest regressions:")
    for k in rows[-8:]:
        print(f"  {k}: {qa[k]:.2f} -> {qb[k]:.2f}  ({qb[k]/max(qa[k],1e-9):.2f}x)")
    print("\nsections:")
    for s in sorted(set(a.get("sections", {})) | set(b.get("sections", {}))):
        va, vb = a.get("sections", {}).get(s), b.get("sections", {}).get(s)
        print(f"  {s}: {va} -> {vb}")
    sa, sb = (a.get("sf1") or {}).get("queries", {}), (
        b.get("sf1") or {}
    ).get("queries", {})
    if sa or sb:
        print("\nsf1:")
        for k in sorted(set(sa) | set(sb)):
            print(f"  {k}: {sa.get(k)} -> {sb.get(k)}")
    print(
        f"\nloads: graph_build_s {qa.get('graph_build_s')} -> "
        f"{qb.get('graph_build_s')}; graph_load {qa.get('graph_load')} -> "
        f"{qb.get('graph_load')}; lubm_load {qa.get('lubm_load')} -> "
        f"{qb.get('lubm_load')}"
    )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
