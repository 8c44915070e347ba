"""Structured Streaming operators over the events feed.

The reference has no streaming at all (SURVEY §2.3); this is the
driver-mandated extension surface, built on readStream + watermarks +
windowed/stateful aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_agg(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window count+sum per event_type. Works identically on a
    batch DataFrame and a streaming one (same logical plan)."""
    return (
        events.groupBy(
            F.window(F.col("ts"), window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessions per user with an inactivity gap, batch formulation:
    a session starts where the gap from the previous event exceeds the
    threshold (classic lag+cumsum; one shuffle on user_id).

    The streaming formulation of the same operator is
    `streaming_session_window` (F.session_window with watermark).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    starts = F.when(
        gap.isNull() | (gap > gap_minutes * 60), 1
    ).otherwise(0)
    return (
        events.withColumn("__start", starts)
        .groupBy("user_id")
        .agg(
            F.sum("__start").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def streaming_session_window(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """F.session_window aggregation (streaming-native session operator)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_stream_over_parquet(
    spark: SparkSession,
    parquet_path: str,
    transform,
    query_name: str = "graphula_stream",
) -> DataFrame:
    """Execute `transform` over the parquet file as a real Structured
    Streaming job (availableNow trigger, complete mode, memory sink) and
    return the final result as a batch DataFrame.

    This is the 'streams and batch share one engine' contract: the same
    transform function is applied to readStream input, and the produced
    result can be compared 1:1 against the batch run / SQL oracle.
    """
    from graphula_spark.sources.events import open_event_stream

    stream = open_event_stream(spark, parquet_path)
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup: drop rows whose key was already seen
    within the watermark horizon — the streaming formulation of exact
    dedup for a continuously-ingesting pipeline (e.g. event replays,
    at-least-once sources). State is bounded by the watermark: keys
    older than the horizon are evicted, so state size tracks the
    arrival rate × horizon, not the stream's full history."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols)
