#!/bin/bash
# Interleaved A/B of THIS round's changes: HEAD vs round-start (d580097
# worktree at /root/r15base). 5 alternating fresh-session reps/side.
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
OUT=/root/repo/plans/r15/ab_r15_changes.jsonl
: > "$OUT"
KEYS="sq_order_limit graph_probes ds_reduce_rdfs sq_filter tpch_q6"
for rep in 1 2 3 4 5; do
  for side in head base; do
    dir=/root/repo; [ "$side" = base ] && dir=/root/r15base
    (cd "$dir" && python tools/ab_r15.py "$side-$rep" $KEYS 2>/dev/null) >> "$OUT"
    echo "done $side-$rep" >&2
  done
done
