#!/usr/bin/env python
"""Round-12 probe: the `bucket_seconds` skew lever at ACTUAL skew
(VERDICT r11 #3 — the lever shipped row-exact in round 11 but was
never driven by a real hub key).

Shape: ONE hub user with 5,000,000 clicks plus 1,000 quiet users
sharing 1,000,000 clicks, all inside a 30-day window (hub rate
~1.9 clicks/s); 10k hub purchases + 190k quiet purchases. The PLAIN
window shapes partition on the bare user key, so the hub's 5M-row
sort lands in ONE task — the thing that stalls a 1000-executor
cluster at 100 TB no matter how many cores it has. With
bucket_seconds=3600 the window partitions on (user, hour-bucket):
~7k rows per hub partition plus one carry-in row per occupied
(user, bucket).

Metrics per run: wall seconds, total shuffle-write bytes, and the
TASK-TIME DISTRIBUTION (median / max task duration of every new
stage, from the UI REST taskSummary API) — the lever's whole claim
is that the max task time flattens while wall and bytes stay sane.
Outputs are asserted checksum-identical between the plain and
bucketed shapes (row-exactness itself is property-tested in
tests/test_relational_ops.py).

Carry-row overhead (the documented width tradeoff): at width w the
carry count is sum over keys of their occupied buckets — the HUB
contributes window_span/w rows (tiny vs its data), but every QUIET
key contributes up to min(its_rows, span/w) — so too-narrow widths
make the long tail of quiet keys pay; pick w ≈ target_rows_per_task
/ hub_peak_rate and no narrower.

Run:  PYTHONPATH=/root/repo python tools/probe_r12.py
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from tools.probe_r8 import _stages, get_probe_spark  # noqa: E402

BASE = 1704067200  # 2024-01-01T00:00:00Z
SPAN = 30 * 86400  # 30-day click window


def _task_summary(spark, stage_id: int, attempt: int) -> dict | None:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages/{stage_id}/{attempt}"
            f"/taskSummary?quantiles=0.5,1.0"
        ) as r:
            return json.load(r)
    except Exception:
        return None


def measure_tasks(spark, label: str, run) -> tuple[float, int, float]:
    """Run `run()`; report wall, new shuffle-write bytes, and the
    median/max task duration of every new stage (largest max first).
    Returns (wall_s, shuffle_bytes, max_task_s across all stages)."""
    before = _stages(spark)
    t0 = time.time()
    run()
    dt = time.time() - t0
    after = _stages(spark)
    new = {k: v for k, v in after.items() if k not in before}
    total = sum(s.get("shuffleWriteBytes", 0) for s in new.values())
    rows = []
    for (sid, att), s in new.items():
        ts_ = _task_summary(spark, sid, att)
        if not ts_ or "duration" not in ts_:
            continue
        med, mx = ts_["duration"][0] / 1e3, ts_["duration"][-1] / 1e3
        rows.append((mx, med, sid, s.get("numTasks", 0),
                     s.get("name", "?").split("\n")[0][:70]))
    rows.sort(reverse=True)
    worst = rows[0][0] if rows else 0.0
    print(f"\n{label}: {dt:.1f}s wall, {total/1e6:.1f} MB shuffle, "
          f"max task {worst:.1f}s")
    for mx, med, sid, nt, name in rows[:6]:
        print(f"  stage {sid}: max {mx:6.1f}s  med {med:5.1f}s  "
              f"({nt} tasks)  {name}")
    return dt, total, worst


def build_inputs(spark):
    """Deterministic skewed event data, materialized once so every
    A/B run pays only the operator."""
    def ts_of(col, salt):
        return F.timestamp_seconds(
            F.lit(BASE) + F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(SPAN))
        )

    hub_clicks = spark.range(5_000_000).select(
        F.lit("hub").alias("user_id"),
        ts_of(F.col("id"), 1).alias("ts"),
        F.concat(F.lit("h"), F.col("id")).alias("click_id"),
    )
    quiet_clicks = spark.range(1_000_000).select(
        F.concat(
            F.lit("u"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000))
        ).alias("user_id"),
        ts_of(F.col("id"), 3).alias("ts"),
        F.concat(F.lit("q"), F.col("id")).alias("click_id"),
    )
    clicks = hub_clicks.unionByName(quiet_clicks).persist()
    hub_p = spark.range(10_000).select(
        F.concat(F.lit("ph"), F.col("id")).alias("event_id"),
        ts_of(F.col("id"), 4).alias("ts"),
        F.lit("hub").alias("user_id"),
    )
    quiet_p = spark.range(190_000).select(
        F.concat(F.lit("pq"), F.col("id")).alias("event_id"),
        ts_of(F.col("id"), 5).alias("ts"),
        F.concat(
            F.lit("u"), F.pmod(F.xxhash64("id", F.lit(6)), F.lit(1000))
        ).alias("user_id"),
    )
    purchases = hub_p.unionByName(quiet_p).persist()
    print(f"clicks: {clicks.count():,}  purchases: {purchases.count():,}")
    return purchases, clicks


def checksum(df) -> tuple:
    row = df.select(
        F.sum(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
            .cast("decimal(38,0)")
        ).alias("cs"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (row["cs"], row["n"])


def pq_bytes_probe(spark) -> None:
    """Section B: PQ compression + ADC query wall at 2M × 64-dim —
    on-disk bytes raw-float vs int8 codes vs PQ codes, and an ADC
    top-k (re-ranked) over the code table only."""
    import os
    import shutil

    from graphula_spark.operators.ann import (
        pq_encode,
        pq_topk,
        pq_train,
        quantize_embeddings,
    )

    dim, n = 64, 2_000_000
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.pmod(F.xxhash64(F.col("id"), d), F.lit(2000)) - 1000.0
            )
            / 1000.0,
        ).alias("embedding"),
    ).persist()
    vecs.count()
    base = "/tmp/probe_r12_pq"
    shutil.rmtree(base, ignore_errors=True)

    def du(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(p)
            for f in fs
        )

    t0 = time.time()
    vecs.write.mode("overwrite").parquet(f"{base}/raw")
    raw_b = du(f"{base}/raw")
    q8, _scales = quantize_embeddings(vecs)
    q8.write.mode("overwrite").parquet(f"{base}/int8")
    int8_b = du(f"{base}/int8")
    model = pq_train(vecs, m=8, k_centroids=256, sample_rows=50_000)
    codes = pq_encode(vecs, model)
    codes.write.mode("overwrite").parquet(f"{base}/pq")
    pq_b = du(f"{base}/pq")
    print(
        f"\nPQ bytes @ {n:,}×{dim}: raw {raw_b/1e6:.1f} MB, "
        f"int8 {int8_b/1e6:.1f} MB ({raw_b/int8_b:.1f}×), "
        f"pq {pq_b/1e6:.1f} MB ({raw_b/pq_b:.1f}×)  "
        f"[prep {time.time()-t0:.0f}s]"
    )
    codes_disk = spark.read.parquet(f"{base}/pq")
    queries = vecs.limit(8)
    t0 = time.time()
    nrows = pq_topk(
        codes_disk, queries, model, k=10, rerank_vectors=vecs
    ).count()
    print(
        f"ADC top-10 (8 queries, re-ranked) over the code table: "
        f"{time.time()-t0:.1f}s, {nrows} rows"
    )
    vecs.unpersist()
    shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    from graphula_spark.operators.relational import (
        asof_join,
        asof_range_profile,
    )

    spark = get_probe_spark()
    if "--pq" in sys.argv:
        pq_bytes_probe(spark)
        return
    purchases, clicks = build_inputs(spark)
    width = 3600

    results = {}
    for name, fn in [
        ("asof_join", lambda bw: asof_join(
            purchases, clicks, on="ts", by="user_id", bucket_seconds=bw
        )),
        ("asof_range_profile", lambda bw: asof_range_profile(
            purchases, clicks, on="ts", by="user_id", right_id="click_id",
            lower_seconds=600, upper_seconds=600, bucket_seconds=bw,
        )),
    ]:
        cs = {}
        for mode, bw in [("plain", None), (f"bucketed[{width}s]", width)]:
            # measure the CHECKSUM query: it consumes every output
            # column, so the window fill cannot be pruned the way a
            # bare count() lets Catalyst drop the whole window
            out = {}
            wall, bytes_, worst = measure_tasks(
                spark, f"{name} {mode}",
                lambda bw=bw: out.update(cs=checksum(fn(bw))),
            )
            cs[mode] = out["cs"]
            results[(name, mode)] = (wall, bytes_, worst)
        vals = list(cs.values())
        assert vals[0] == vals[1], (name, cs)
        print(f"{name}: plain and bucketed outputs checksum-identical")

    print("\nsummary (wall_s / shuffle_MB / max_task_s):")
    for (name, mode), (w, b, x) in results.items():
        print(f"  {name:20s} {mode:15s} {w:7.1f}  {b/1e6:8.1f}  {x:6.1f}")


if __name__ == "__main__":
    main()
