"""Mergeable HLL sketch rollups: merge == full rescan, incremental append."""

import pytest
from pyspark.sql import functions as F

from graphula_spark.operators.rollup_sketch import (
    append_bucket,
    build_rollup,
    query_rollup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_rollup_matches_full_rescan_estimate(spark, events, tmp_path):
    path = str(tmp_path / "roll")
    build_rollup(events, path)
    got = {
        r["key"]: r.asDict() for r in query_rollup(spark, path).collect()
    }
    # HLL union over per-bucket sketches must equal the single-pass
    # sketch of all raw rows (register-max is order/partition invariant)
    direct = {
        r["event_type"]: r.asDict()
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .collect()
    }
    assert set(got) == set(direct)
    for k in got:
        assert got[k]["n_events"] == direct[k]["n_events"]
        assert got[k]["approx_users"] == direct[k]["approx_users"]
        # top-k heavy hitters ride the rollup too, mergeable
        assert len(got[k]["top_users"]) == 5
        # and the estimate is actually close to the exact answer
        exact = direct[k]["exact_users"]
        assert abs(got[k]["approx_users"] - exact) <= max(2, 0.05 * exact)


def test_incremental_append_merges(spark, events, tmp_path):
    path = str(tmp_path / "roll2")
    split = events.selectExpr("percentile(unix_timestamp(ts), 0.7)").first()[0]
    early = events.where(F.unix_timestamp("ts") < split)
    late = events.where(F.unix_timestamp("ts") >= split)
    build_rollup(early, path)
    append_bucket(late, path)  # the incremental maintenance path
    got = {
        r["key"]: r.asDict() for r in query_rollup(spark, path).collect()
    }
    want = {
        r["event_type"]: r.asDict()
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("approx_users"),
        )
        .collect()
    }
    for k in want:
        assert got[k]["n_events"] == want[k]["n_events"]
        assert got[k]["approx_users"] == want[k]["approx_users"]


def test_append_bucket_replay_is_idempotent(spark, events, tmp_path):
    """An at-least-once producer re-running a batch (same batch_id)
    must not double counts: the per-batch partition overwrite replaces
    the earlier attempt's rows — including a PARTIAL earlier attempt."""
    path = str(tmp_path / "roll_replay")
    split = events.selectExpr("percentile(unix_timestamp(ts), 0.7)").first()[0]
    early = events.where(F.unix_timestamp("ts") < split)
    late = events.where(F.unix_timestamp("ts") >= split)
    build_rollup(early, path)
    # first attempt dies mid-batch: only half the slice got written
    partial = late.where(F.unix_timestamp("ts") % 2 == 0)
    append_bucket(partial, path, batch_id=7)
    # replay of the SAME batch id writes the full slice
    append_bucket(late, path, batch_id=7)
    # and a pure duplicate replay after success changes nothing
    append_bucket(late, path, batch_id=7)
    got = {r["key"]: r.asDict() for r in query_rollup(spark, path).collect()}
    want = {
        r["event_type"]: r.asDict()
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("approx_users"),
        )
        .collect()
    }
    for k in want:
        assert got[k]["n_events"] == want[k]["n_events"]
        assert round(got[k]["sum_value"], 2) == want[k]["sum_value"]
        assert got[k]["approx_users"] == want[k]["approx_users"]


def test_time_range_prunes(spark, events, tmp_path):
    path = str(tmp_path / "roll3")
    build_rollup(events, path)
    lo = events.agg(F.min("ts")).first()[0]
    hi = events.agg(F.max("ts")).first()[0]
    mid = lo + (hi - lo) / 2
    # range endpoints are bucket boundaries — align the start down so
    # the first (partial) bucket is included
    lo = lo.replace(minute=0, second=0, microsecond=0)
    ranged = query_rollup(spark, path, start=lo, end=mid)
    want = (
        events.where((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(mid)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got_n = {r["key"]: r["n_events"] for r in ranged.collect()}
    del want
    # rollup range filters operate on BUCKET boundaries: the bucket
    # containing `mid` starts before mid, so it is included whole —
    # the aligned truth is everything before the NEXT hour boundary
    from datetime import timedelta

    cut = mid.replace(minute=0, second=0, microsecond=0) + timedelta(hours=1)
    want_aligned = {
        r["event_type"]: r["n"]
        for r in events.where(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(cut))
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got_n == want_aligned


def test_streaming_rollup_maintenance(spark, events, tmp_path):
    from graphula_spark.streaming.windows import stream_rollup_maintenance

    path = str(tmp_path / "roll_stream")
    split = events.selectExpr("percentile(unix_timestamp(ts), 0.5)").first()[0]
    early = events.where(F.unix_timestamp("ts") < split)
    late = events.where(F.unix_timestamp("ts") >= split)
    build_rollup(early, path)

    # feed the late half through a REAL streaming job
    in_dir = str(tmp_path / "incoming")
    late.write.parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    q = stream_rollup_maintenance(
        spark, stream, path, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    got = {r["key"]: r.asDict() for r in query_rollup(spark, path).collect()}
    want = {
        r["event_type"]: r.asDict()
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("approx_users"),
        )
        .collect()
    }
    for k in want:
        assert got[k]["n_events"] == want[k]["n_events"]
        assert got[k]["approx_users"] == want[k]["approx_users"]
