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
    Written partitioned by bucket so time-range queries prune files."""
    (
        events.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.hll_sketch_agg(F.col(user_col), F.lit(HLL_LGK)).alias(
                "users_sketch"
            ),
            F.expr(
                f"approx_top_k_accumulate({user_col}, {TOPK_RETAIN})"
            ).alias("top_users_sketch"),
        )
        .write.mode("overwrite")
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
) -> None:
    """Roll up a NEW slice of events (e.g. the last hour's arrivals)
    and append its bucket rows — the incremental maintenance path.
    Duplicate bucket rows are fine: queries merge them (counts add,
    sketches union), so append is idempotent-by-merge rather than
    rewrite-in-place."""
    (
        events.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.hll_sketch_agg(F.col(user_col), F.lit(HLL_LGK)).alias(
                "users_sketch"
            ),
            F.expr(
                f"approx_top_k_accumulate({user_col}, {TOPK_RETAIN})"
            ).alias("top_users_sketch"),
        )
        .write.mode("append")
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
