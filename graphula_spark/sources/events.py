"""Events source: parquet with TIMESTAMP(NANOS) columns.

Spark's parquet reader rejects INT64 TIMESTAMP(NANOS)
(PARQUET_TYPE_ILLEGAL); the testdata events table is written that way.
We read nanos as long (legacy conf, runtime-settable) and convert to a
microsecond timestamp via integer division — plain double math would
lose precision above 2^53 nanoseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def read_events(spark: SparkSession, path: str, ts_col: str = "ts") -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if isinstance(df.schema[ts_col].dataType, LongType):
        df = df.withColumn(ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)"))
    return df


def open_event_stream(spark: SparkSession, parquet_path: str, ts_col: str = "ts"):
    """readStream over a single parquet file (the file streaming source
    needs a directory — expose the file through a stable symlink dir)
    with the same TIMESTAMP(NANOS) accommodation as read_events."""
    import hashlib
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(parquet_path).schema
    if os.path.isfile(parquet_path):
        d = f"/tmp/graphula_stream_src/{hashlib.md5(parquet_path.encode()).hexdigest()}"
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, os.path.basename(parquet_path))
        if not os.path.exists(link):
            os.symlink(parquet_path, link)
        parquet_path = d
    stream = spark.readStream.schema(schema).parquet(parquet_path)
    if ts_col in stream.columns and isinstance(stream.schema[ts_col].dataType, LongType):
        stream = stream.withColumn(ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)"))
    return stream
