"""Stream-stream joins (Structured Streaming).

The canonical "did action B follow action A within T?" correlation —
e.g. view→purchase attribution — expressed as a watermark-bounded
interval join. The reference has no streaming at all (SURVEY §2.3);
this extends the streaming family the driver mandates.

Scale shape: both sides shuffle on the join key; state is bounded by
the watermark + interval (Spark evicts buffered rows once the
watermark passes the interval bound), so state size tracks
arrival-rate × horizon, not stream history. This is exactly the plan
a 100 TB/day event pipeline needs — the alternative (periodic batch
self-joins over a growing table) rereads history every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    max_delay: str = "30 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing `key_col` where the right event lands in
    `[left.ts, left.ts + max_delay]`. Works identically on batch and
    streaming inputs (streams need both watermarks for state eviction —
    Spark rejects an unbounded stream-stream join, by design).

    `how="left_outer"` keeps unmatched left events with null right
    columns — attribution's "views that never converted" rows; Spark
    emits them once the watermark passes the join window, so the
    streaming result converges to the batch result.

    Columns come back prefixed (`l_ts`, `r_ts`, ...) with the shared
    key unprefixed.
    """
    lw = left.withWatermark(ts_col, watermark) if left.isStreaming else left
    rw = right.withWatermark(ts_col, watermark) if right.isStreaming else right
    lsel = lw.select(
        F.col(key_col),
        *[
            F.col(c).alias(left_prefix + c)
            for c in left.columns
            if c != key_col
        ],
    )
    rsel = rw.select(
        F.col(key_col).alias("__rk"),
        *[
            F.col(c).alias(right_prefix + c)
            for c in right.columns
            if c != key_col
        ],
    )
    lt, rt = left_prefix + ts_col, right_prefix + ts_col
    cond = (
        (F.col(key_col) == F.col("__rk"))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lsel.join(rsel, cond, how).drop("__rk")


def run_interval_join_stream(
    spark: SparkSession,
    parquet_path: str,
    left_type: str,
    right_type: str,
    key_col: str = "user_id",
    max_delay: str = "30 minutes",
    query_name: str = "graphula_ss_join",
) -> DataFrame:
    """Run `interval_join` between two event-type substreams of the
    events table as a REAL streaming job (availableNow trigger, append
    mode, memory sink) and return the result as a batch DataFrame —
    comparable 1:1 against the batch run of the same join."""
    from graphula_spark.sources.events import open_event_stream

    stream = open_event_stream(spark, parquet_path)
    left = stream.where(F.col("event_type") == left_type)
    right = stream.where(F.col("event_type") == right_type)
    out = interval_join(left, right, key_col, max_delay=max_delay)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
