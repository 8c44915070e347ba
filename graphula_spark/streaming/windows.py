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


def stream_near_dedup_ingest(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    checkpoint: str | None = None,
    batch_transform=None,
):
    """Streaming NEAR-dup dedup-on-ingest against a persisted MinHash
    index: each micro-batch (1) probes the index for near-duplicates of
    its documents (broadcast batch join — zero corpus shuffle),
    (2) appends only the surviving (non-duplicate) documents to the
    index so later batches dedup against them too.

    foreachBatch is the right tool (not a stateful operator): the
    corpus state is far too large for the streaming state store, and it
    already lives in the index's band-partitioned parquet. Exactly the
    incremental discipline a 100 TB ingest pipeline needs — cost per
    batch is O(batch), not O(corpus).

    Batches also self-dedup (minhash_lsh_pairs within the batch,
    min-id survivor) so two near-identical docs arriving together
    cannot both enter the index.

    REPLAY SAFETY (foreachBatch is at-least-once): a batch re-executed
    after a mid-batch failure must converge to the same outcome.
    Three mechanisms, keyed on the deterministic `batch_id`:
      * the corpus probe ignores SELF-matches (`id_new == id_corpus`)
        — if a previous attempt already added this batch's survivors
        to the index, they match themselves at jaccard 1.0 and a naive
        probe would reject the whole replayed batch;
      * those self-matches identify ids the index ALREADY contains, so
        `add()` skips them instead of appending duplicate bands;
      * survivors are published to `<index_path>/accepted/` under a
        per-batch partition (`__batch_id=<id>`) with overwrite, so a
        replay replaces its own partial output instead of appending a
        second copy.

    Returns the StreamingQuery; surviving docs land as parquet under
    `<index_path>/accepted/` (read the directory to get all batches).
    """
    from graphula_spark.operators.dedup import MinHashIndex, minhash_lsh_pairs

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_transform is not None:
            # per-batch static-DF stage (e.g. the URL front gate's
            # row_number dedup, which streaming DFs cannot window)
            batch_df = batch_transform(batch_df)
        if batch_df.isEmpty():
            return
        # snapshot the cached-RDD set so every persist() made inside
        # this batch (batch_df, lsh signature tables, verify shingles)
        # can be released afterwards — a long-lived stream must not
        # accumulate one cached signature table per micro-batch
        jsc = spark.sparkContext._jsc
        before = set(dict(jsc.getPersistentRDDs()).keys())
        batch_df = batch_df.persist()
        try:
            idx = MinHashIndex.load(spark, index_path)
            pairs = idx.query(
                batch_df, id_col, text_col, jaccard_threshold
            ).persist()
            dup_vs_corpus = (
                pairs.where(F.col("id_new") != F.col("id_corpus"))
                .select(F.col("id_new").alias(id_col))
                .distinct()
            )
            # ids whose bands a previous attempt of THIS batch already
            # pushed into the index: they probe-match themselves
            already_indexed = (
                pairs.where(F.col("id_new") == F.col("id_corpus"))
                .select(F.col("id_new").alias(id_col))
                .distinct()
            )
            # within-batch: keep the min-id member of each near-dup
            # pair, measured with the INDEX's pinned parameters so
            # intra-batch and vs-corpus dedup share one similarity
            # definition
            intra = minhash_lsh_pairs(
                batch_df,
                id_col,
                text_col,
                num_hashes=idx.num_hashes,
                bands=idx.bands,
                shingle_n=idx.shingle_n,
                jaccard_threshold=jaccard_threshold,
            ).select(F.greatest("id_a", "id_b").alias(id_col)).distinct()
            survivors = batch_df.join(
                dup_vs_corpus.unionByName(intra).distinct(), id_col, "left_anti"
            ).persist()
            # ORDER MATTERS: materialize + publish the survivors BEFORE
            # growing the index — add() puts the survivors' own bands
            # into the very parquet the lazy query plan scans, so a
            # later re-evaluation would match every survivor against
            # itself and reject the whole batch
            survivors.count()
            survivors.write.mode("overwrite").parquet(
                f"{index_path}/accepted/__batch_id={batch_id}"
            )
            idx.add(
                survivors.join(already_indexed, id_col, "left_anti"),
                id_col,
                text_col,
            )
        finally:
            for rid, rdd in dict(jsc.getPersistentRDDs()).items():
                if rid not in before:
                    rdd.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process_batch).trigger(
        availableNow=True
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def stream_warc_ingest(
    spark: SparkSession,
    warc_dir: str,
    index_path: str,
    jaccard_threshold: float = 0.5,
    checkpoint: str | None = None,
    glob: str = "*.warc*",
    min_chars: int = 1,
    max_files_per_trigger: int | None = None,
    domain_blocklist: list | None = None,
    url_dedup_batch: bool = False,
):
    """Continuous web-crawl ingestion, end to end: WARC files landing
    in ``warc_dir`` stream through per-file parsing + HTML→text
    extraction (`sources/warc.py`) and then NEAR-dup dedup-on-ingest
    against the persisted MinHash index — the composition a 100 TB
    crawl pipeline runs as one job. The binaryFile source tracks seen
    files in the checkpoint, so each WARC is parsed exactly once;
    everything downstream inherits `stream_near_dedup_ingest`'s replay
    safety. Surviving documents land under ``<index_path>/accepted/``
    partitioned by batch.

    Parallelism note: the binaryFile DataSource packs small files into
    128 MB (`spark.sql.files.maxPartitionBytes`) read partitions; for
    crawls of many small files, lower that conf or rely on
    ``max_files_per_trigger`` to bound per-batch work — the batch
    `read_warc` path uses exactly-one-task-per-file instead
    (sources/files.py)."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from graphula_spark.sources.warc import binary_files_to_documents

    # the binaryFile source's fixed schema must be passed explicitly in
    # streaming mode (no inference on a stream)
    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("modificationTime", TimestampType()),
            StructField("length", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(schema)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = binary_files_to_documents(reader.load(warc_dir), min_chars)
    if domain_blocklist:
        # the URL front gate runs before any text is hashed (cheapest
        # rejection first — operators/urls.py); the blocklist filter is
        # a stateless join so it can sit on the stream itself
        from graphula_spark.operators.urls import filter_domains

        docs = filter_domains(docs, "url", domain_blocklist, "block")
    transform = None
    if url_dedup_batch:
        # WITHIN-batch canonical-URL dedup (a crawl batch often holds
        # the same page under several tracking-param aliases). This is
        # a row_number window, which streaming DFs cannot run — it
        # executes inside foreachBatch on the static batch DF.
        # Cross-batch content dups are the MinHash index's job; URL
        # identity across batches would need keyed state for strictly
        # less recall than the content index already provides.
        from graphula_spark.operators.urls import url_dedup

        def transform(batch_df):
            return url_dedup(batch_df, "url", prefer_col="fetch_date")
    return stream_near_dedup_ingest(
        spark,
        docs,
        index_path,
        id_col="doc_id",
        text_col="text",
        jaccard_threshold=jaccard_threshold,
        checkpoint=checkpoint,
        batch_transform=transform,
    )


def stream_rollup_maintenance(
    spark: SparkSession,
    events_stream: DataFrame,
    rollup_path: str,
    checkpoint: str | None = None,
    **rollup_kwargs,
):
    """Continuous-aggregate maintenance: every micro-batch folds its
    events into new rollup bucket rows (`rollup_sketch.append_bucket`).

    foreachBatch is at-least-once: after a checkpoint recovery Spark
    re-executes the in-flight batch, so a plain append would write that
    batch's rows twice and `query_rollup` would silently double its
    counts (HLL union is idempotent; addition is not). The write is
    therefore keyed by the deterministic `batch_id` foreachBatch
    provides — each batch lands in its own `__batch_id` partition via
    dynamic partition overwrite, so a replay REPLACES the partial rows
    of the failed attempt instead of adding to them. Query with
    `rollup_sketch.query_rollup` at any moment for an up-to-date
    summary without scanning raw events."""
    from graphula_spark.operators.rollup_sketch import append_bucket

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_bucket(batch_df, rollup_path, batch_id=batch_id, **rollup_kwargs)

    writer = events_stream.writeStream.foreachBatch(process_batch).trigger(
        availableNow=True
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def stream_importance_model_maintenance(
    spark: SparkSession,
    docs_stream: DataFrame,
    is_target,
    text_col: str,
    model_path: str,
    checkpoint: str | None = None,
    **model_kwargs,
):
    """Continuous DSIR model maintenance: every micro-batch of ingested
    documents folds its hashed-n-gram counts into the importance model
    store (`importance.append_importance_model`), so resampling targets
    track the corpus AS IT GROWS without any full-corpus recount.

    Same replay discipline as `stream_rollup_maintenance`: foreachBatch
    is at-least-once, counts are not idempotent under re-addition, so
    each batch lands in its own `__batch_id` partition via dynamic
    partition overwrite — a recovered batch replaces its own rows.
    Score at any moment with `importance_weights_from_model`."""
    from graphula_spark.operators.importance import append_importance_model

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_importance_model(
            batch_df, is_target, text_col, model_path,
            batch_id=batch_id, **model_kwargs,
        )

    writer = docs_stream.writeStream.foreachBatch(process_batch).trigger(
        availableNow=True
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
