#!/bin/bash
# 5 alternating reps each side; one fresh process per rep.
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
OUT=/root/repo/plans/r15/ab_r15.jsonl
: > "$OUT"
for rep in 1 2 3 4 5; do
  for side in head r13; do
    dir=/root/repo; [ "$side" = r13 ] && dir=/root/r13ab
    (cd "$dir" && python tools/ab_r15.py "$side-$rep" 2>/dev/null) >> "$OUT"
    echo "done $side-$rep" >&2
  done
done
