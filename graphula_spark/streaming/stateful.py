"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the arbitrary-state API the driver mandates for custom
stateful operators: a per-user running aggregate (event count + value
sum + last-seen timestamp) maintained across micro-batches.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
    ]
)


def _update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as a custom stateful operator.

    On a streaming DataFrame this maintains state across micro-batches;
    on the availableNow trigger it processes the whole input as one
    batch, so the final update-mode emission equals the batch groupBy.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_over_parquet(spark, parquet_path: str, query_name: str = "stateful_totals") -> DataFrame:
    """Run the stateful operator as a real streaming job over a parquet
    file and return the final per-user totals as a batch DataFrame."""
    from graphula_spark.streaming.windows import run_stream_over_parquet

    # update-mode memory sink keeps the latest row per key emitted;
    # with availableNow + single batch, that's the final totals
    from graphula_spark.sources.events import open_event_stream

    stream = open_event_stream(spark, parquet_path)
    out = running_user_totals(stream)
    # state-store partition count is fixed at query start from
    # spark.sql.shuffle.partitions; a python state worker per partition
    # is expensive, so cap it for this query and restore afterwards
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(query_name)
