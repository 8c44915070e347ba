"""Streaming triple ingest: a continuously-arriving N-Triples feed is
parsed, dictionary-encoded, and appended to a persisted graph store.

The reference's load path is a single-writer batch transaction
(Sparql.loadNtriples, sparql/.../Sparql.scala:78-113); the streaming
analogue uses foreachBatch so each micro-batch reuses the *batch*
dictionary/encode code against the current store snapshot — one engine
for streams and batch, with watermark-free append semantics (triples
are facts; set-dedup happens against the accumulated store).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphula_spark.dictionary import Dictionary
from graphula_spark.graph import Graph
from graphula_spark.sources.ntriples import _LINE


def _parse_lines(text_df: DataFrame) -> DataFrame:
    parsed = text_df.select(
        F.regexp_extract("value", _LINE, 1).alias("s_raw"),
        F.regexp_extract("value", _LINE, 2).alias("p_raw"),
        F.regexp_extract("value", _LINE, 3).alias("o_raw"),
    ).where((F.col("s_raw") != "") & (F.col("p_raw") != "") & (F.col("o_raw") != ""))

    def norm(c):
        col = F.col(c)
        return F.when(
            col.startswith("<"), F.expr(f"substring({c}, 2, length({c}) - 2)")
        ).otherwise(col)

    return parsed.select(
        norm("s_raw").alias("s"), norm("p_raw").alias("p"), norm("o_raw").alias("o")
    )


def stream_ntriples_ingest(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    query_name: str = "graphula_ingest",
):
    """Start a streaming ingest of .nt files appearing in `src_dir`.

    Each micro-batch: parse → extend-or-create the store's dictionary →
    encode → dedup against the store → append. Returns the streaming
    query handle; call `.processAllAvailable()` / `.stop()` to drive it.
    """
    stream = spark.readStream.format("text").load(src_dir + "/*.nt")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        striples = _parse_lines(batch_df)
        if os.path.isdir(f"{store_dir}/triples"):
            g = Graph.load(spark, store_dir)
            g2 = g.add_string_triples(striples)
        else:
            g2 = Graph.from_string_triples(spark, striples, cache=False)
        # write to a fresh versioned dir then swap — the store is an
        # immutable snapshot (SURVEY §1.6: snapshots replace LMDB txns)
        tmp = f"{store_dir}_v{batch_id}"
        g2.save(tmp)
        import shutil

        if os.path.isdir(store_dir):
            shutil.rmtree(store_dir)
        os.rename(tmp, store_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
