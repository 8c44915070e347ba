"""Mergeable-sketch rollups: pre-aggregated hypertable-style summaries.

At 100 TB you cannot afford to rescan raw events for every dashboard
query. The classic continuous-aggregate answer: roll events up once
per time bucket into PRE-AGGREGATED rows whose aggregates are
MERGEABLE — plain sums/counts merge by addition, and distinct counts
merge via Datasketches HLL union (`hll_sketch_agg` / `hll_union_agg`,
JVM-side in Spark 4). Any time-range query then unions a handful of
bucket rows instead of scanning raw data, and new data appends new
bucket rows without touching old ones.

HLL register updates are order-independent (register-wise max), so a
union of per-bucket sketches gives EXACTLY the estimate a full rescan
would — merging loses nothing, which is what makes the rollup safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: log2m for the HLL sketches — 12 gives ~1.6% relative error at ~4KB
HLL_LGK = 12
#: retained entries in the mergeable heavy-hitter (top-k) sketches
TOPK_RETAIN = 64


def _rolled(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    user_col: str,
    value_col: str,
    bucket: str,
) -> DataFrame:
    return events.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        F.col(key_col).alias("key"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
        F.hll_sketch_agg(F.col(user_col), F.lit(HLL_LGK)).alias(
            "users_sketch"
        ),
        F.expr(
            f"approx_top_k_accumulate({user_col}, {TOPK_RETAIN})"
        ).alias("top_users_sketch"),
    )


def build_rollup(
    events: DataFrame,
    path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
    bucket: str = "hour",
) -> None:
    """One pass over raw events → per-(bucket, key) rollup rows:
    count, sum(value), and an HLL sketch of distinct users (binary).
    The store is partitioned by `__batch_id` (the base build writes
    partition ``base``) so incremental appends can be replaced
    per-batch — see `append_bucket`."""
    (
        _rolled(events, ts_col, key_col, user_col, value_col, bucket)
        .withColumn("__batch_id", F.lit("base"))
        .write.mode("overwrite")
        .partitionBy("__batch_id")
        .parquet(path)
    )


def append_bucket(
    events: DataFrame,
    path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
    bucket: str = "hour",
    batch_id: int | str | None = None,
) -> None:
    """Roll up a NEW slice of events (e.g. the last hour's arrivals)
    and add its bucket rows — the incremental maintenance path.
    Duplicate bucket rows MERGE at query time (counts add, sketches
    union), so a plain append never breaks reads — but addition is not
    idempotent: an at-least-once producer that re-runs the same slice
    would double its counts.

    Pass ``batch_id`` (foreachBatch hands you one) to make the write
    REPLAY-SAFE: the batch's rows land in partition
    ``__batch_id=<batch_id>`` via dynamic partition overwrite, so a
    re-executed batch replaces its own previous rows instead of
    duplicating them. Without ``batch_id`` the write is a plain append
    into partition ``adhoc`` (caller owns exactly-once)."""
    rolled = _rolled(events, ts_col, key_col, user_col, value_col, bucket)
    if batch_id is None:
        (
            rolled.withColumn("__batch_id", F.lit("adhoc"))
            .write.mode("append")
            .partitionBy("__batch_id")
            .parquet(path)
        )
    else:
        (
            rolled.withColumn("__batch_id", F.lit(str(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(path)
        )


def query_rollup(
    spark: SparkSession,
    path: str,
    start=None,
    end=None,
) -> DataFrame:
    """Answer (key → events, value sum, distinct-user estimate) for a
    time range FROM THE ROLLUP ONLY: a scan of a few bucket rows + one
    tiny merge aggregation. `hll_union_agg` merges the per-bucket
    sketches, and `approx_top_k_combine` merges the per-bucket
    heavy-hitter sketches into a top-5 user list; both estimates equal
    what a raw rescan would produce (order/partition-invariant
    accumulators)."""
    df = spark.read.parquet(path)
    if start is not None:
        df = df.where(F.col("bucket") >= F.lit(start))
    if end is not None:
        df = df.where(F.col("bucket") < F.lit(end))
    return (
        df.groupBy("key")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("users_sketch"))
            ).alias("approx_users"),
            F.expr(
                "approx_top_k_estimate(approx_top_k_combine(top_users_sketch), 5)"
            ).alias("top_users"),
        )
    )
