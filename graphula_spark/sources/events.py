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
