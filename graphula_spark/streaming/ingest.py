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


def current_store_version(store_dir: str) -> str | None:
    """Resolve the active snapshot dir of a versioned ingest store via
    its CURRENT pointer file; None when no snapshot is published yet."""
    cur = f"{store_dir}/CURRENT"
    if not os.path.exists(cur):
        return None
    with open(cur) as fh:
        name = fh.read().strip()
    path = f"{store_dir}/{name}"
    return path if os.path.isdir(path) else None


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
        cur = current_store_version(store_dir)
        if cur is not None:
            g = Graph.load(spark, cur)
            g2 = g.add_string_triples(striples)
        else:
            g2 = Graph.from_string_triples(spark, striples, cache=False)
        # write a fresh versioned snapshot, then flip the CURRENT pointer
        # atomically (os.replace) — a crash mid-publish leaves the old
        # snapshot intact and readable, and concurrent readers of the
        # previous version keep their files (SURVEY §1.6: snapshots
        # replace LMDB txns). The old delete-then-rename swap could lose
        # the store on a crash between the two calls.
        os.makedirs(store_dir, exist_ok=True)
        new_name = f"v{batch_id}"
        g2.save(f"{store_dir}/{new_name}")
        tmp = f"{store_dir}/CURRENT.tmp"
        with open(tmp, "w") as fh:
            fh.write(new_name)
        os.replace(tmp, f"{store_dir}/CURRENT")
        # GC: keep the new snapshot plus the immediately-previous one
        # (bounded disk; readers of older versions must re-resolve)
        import shutil

        keep = {new_name, os.path.basename(cur) if cur else ""}
        for entry in os.listdir(store_dir):
            if (
                entry.startswith("v")
                and entry not in keep
                and os.path.isdir(f"{store_dir}/{entry}")
            ):
                shutil.rmtree(f"{store_dir}/{entry}", ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
