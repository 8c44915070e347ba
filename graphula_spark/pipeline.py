"""End-to-end training-data pipeline: compose the operators into one run.

The individual operators (dedup family, quality signals, tokenization,
shard packing) are each tested and driver-verified on their own; this
module is the PRODUCT shape — a declarative pipeline a data engineer
points at a raw document table to get training shards plus a
processing report:

    raw → normalize → line-dedup (boilerplate) → exact dedup
        → near-dedup (MinHash+LSH, min-id survivor)
        → substring span dedup (cross-doc ExactSubstr)
        → quality filter (Gopher-style signal bounds)
        → PII scrub → token count → budgeted shard packing

Every stage is a DataFrame→DataFrame function; stages run lazily in
ONE Spark job graph wherever possible (Catalyst fuses the per-row
stages; only the dedup stages introduce their own bounded-key
shuffles). `report` collects per-stage survivor counts — the numbers
a pipeline owner actually watches — with one cached pass per stage
boundary rather than recomputing the lineage.

Scale posture: nothing here adds state beyond the operators' own
bounded-key shuffles; the pipeline inherits their 100 TB designs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PipelineConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    # near-dup
    minhash_threshold: float = 0.5
    # substring dedup
    substr_min_len: int = 8
    # quality bounds (fractions of tokens/chars)
    min_tokens: int = 10
    max_punct_ratio: float = 0.30
    min_stopword_ratio: float = 0.01
    # shard packing
    shard_token_budget: int = 100_000
    # trained-BPE merge table (operators/bpe.py train_bpe): when set,
    # shard budgets and n_tokens use TRUE token counts instead of the
    # whitespace estimate
    bpe_merges: list | None = None
    # DSIR target-distribution selection (operators/importance.py):
    # importance_target is a Column predicate marking target-like docs
    # (a language, a source, a quality tier); the pipeline keeps the
    # importance_keep docs whose hashed-n-gram distribution best
    # matches that slice (seeded Gumbel top-k — deterministic)
    importance_target: object | None = None  # pyspark Column predicate
    importance_keep: int = 0
    # bucket-model size: the add-one smoothing mass is ~buckets grams,
    # so SMALL corpora need fewer buckets or the target model flattens
    # toward uniform (B=8192 suits web-scale corpora; use ~total_grams/8
    # for small ones)
    importance_buckets: int = 8192
    scrub_pii: bool = True
    line_dedup_min_docs: int = 0  # >0 enables boilerplate line removal
    # web-corpus front gate (operators/urls.py): set url_col to enable
    # URL canonicalization dedup (keep one row per canonical URL,
    # freshest url_prefer_col first) and optional apex-domain blocking
    url_col: str | None = None
    url_prefer_col: str | None = None
    domain_blocklist: list | None = None
    extra_quality_filter: object | None = None  # Column-returning callable
    # leakage-safe train/val/test assignment (operators/splits.py):
    # when set, output documents carry a `split` column keyed on the
    # normalized-text hash, so byte-identical survivors of upstream
    # stages can never straddle a split boundary; deterministic and
    # subset-stable (corpus growth never moves an old doc's split)
    split_fractions: dict | None = None
    stages: tuple = (
        "normalize",
        "exact_dedup",
        "near_dedup",
        "substr_dedup",
        "quality",
        "scrub",
        "pack",
    )


@dataclass
class PipelineResult:
    shards: DataFrame
    documents: DataFrame
    report: list[dict] = field(default_factory=list)


def _fs_exists(spark, path: str) -> bool:
    """Hadoop-FS existence check (works for local, HDFS, S3A — whatever
    filesystem the path's scheme resolves to)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def run_pipeline(
    docs: DataFrame,
    cfg: PipelineConfig | None = None,
    checkpoint_dir: str | None = None,
) -> PipelineResult:
    """Run the pipeline; with ``checkpoint_dir`` set, every stage
    boundary is MATERIALIZED to ``<dir>/<stage>`` parquet and a rerun
    RESUMES from the last stage whose write committed (detected by the
    Hadoop ``_SUCCESS`` marker, so a half-written stage is re-run, not
    trusted). A multi-day 100 TB pipeline that dies in stage 5 then
    restarts from stage 4's output instead of re-shuffling the week's
    work; materialized boundaries also cut lineage, so no stage's
    failure recovery ever recomputes an earlier stage's shuffles.
    Resumed runs report the restored stage with ``resumed: True``."""
    from graphula_spark.operators import text as T
    from graphula_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        substring_dedup,
    )
    from graphula_spark.operators.relational import pack_by_budget

    cfg = cfg or PipelineConfig()
    i, t = cfg.id_col, cfg.text_col
    report: list[dict] = []
    spark = docs.sparkSession

    def checkpoint(df: DataFrame, stage: str) -> DataFrame:
        if checkpoint_dir is not None:
            path = f"{checkpoint_dir}/{stage}"
            df.write.mode("overwrite").parquet(path)
            df = spark.read.parquet(path)
        else:
            df = df.persist()
        report.append({"stage": stage, "docs": df.count()})
        return df

    planned = (
        ["url_dedup"] if cfg.url_col is not None else []
    ) + (
        ["line_dedup"] if cfg.line_dedup_min_docs > 0 else []
    ) + [
        s
        for s in (
            "normalize", "exact_dedup", "near_dedup", "substr_dedup",
            "quality",
        )
        if s in cfg.stages
    ] + (
        ["importance"]
        if cfg.importance_target is not None and cfg.importance_keep > 0
        else []
    )
    skip: set[str] = set()
    if cfg.url_col is not None:
        url_cols = [cfg.url_col] + (
            [cfg.url_prefer_col] if cfg.url_prefer_col else []
        )
        cur = docs.select(i, t, *url_cols)
    else:
        cur = docs.select(i, t)
    if checkpoint_dir is not None:
        for s in reversed(planned):
            if _fs_exists(spark, f"{checkpoint_dir}/{s}/_SUCCESS"):
                cur = spark.read.parquet(f"{checkpoint_dir}/{s}")
                skip = set(planned[: planned.index(s) + 1])
                report.append(
                    {"stage": s, "docs": cur.count(), "resumed": True}
                )
                break
    if not skip:
        report.append({"stage": "input", "docs": cur.count()})

    if cfg.url_col is not None and "url_dedup" not in skip:
        # the cheapest duplicate class goes first: URL aliases collapse
        # before any text is hashed, and blocked domains never reach
        # the content stages at all
        from graphula_spark.operators.urls import filter_domains, url_dedup

        if cfg.domain_blocklist:
            cur = filter_domains(cur, cfg.url_col, cfg.domain_blocklist, "block")
        cur = url_dedup(cur, cfg.url_col, prefer_col=cfg.url_prefer_col)
        cur = checkpoint(cur.select(i, t), "url_dedup")

    if cfg.line_dedup_min_docs > 0 and "line_dedup" not in skip:
        # boilerplate removal reads raw line structure, so it must run
        # BEFORE whitespace normalization collapses newlines
        dd = T.line_dedup(cur, i, t, min_dup_docs=cfg.line_dedup_min_docs)
        cur = checkpoint(dd.select(i, t), "line_dedup")

    if "normalize" in cfg.stages and "normalize" not in skip:
        cur = cur.withColumn(
            t, F.regexp_replace(F.trim(F.col(t)), r"\s+", " ")
        ).where(F.length(t) > 0)
        cur = checkpoint(cur, "normalize")

    if "exact_dedup" in cfg.stages and "exact_dedup" not in skip:
        cur = checkpoint(exact_dedup(cur, t, i), "exact_dedup")

    if "near_dedup" in cfg.stages and "near_dedup" not in skip:
        pairs = minhash_lsh_pairs(
            cur, i, t, jaccard_threshold=cfg.minhash_threshold
        )
        losers = pairs.select(
            F.greatest("id_a", "id_b").alias(i)
        ).distinct()
        cur = checkpoint(cur.join(losers, i, "left_anti"), "near_dedup")

    if "substr_dedup" in cfg.stages and "substr_dedup" not in skip:
        sd = substring_dedup(cur, i, t, min_len=cfg.substr_min_len)
        cur = sd.select(
            F.col(i), F.col("clean_text").alias(t)
        ).where(F.length(t) > 0)
        cur = checkpoint(cur, "substr_dedup")

    if "quality" in cfg.stages and "quality" not in skip:
        toks = T.token_count(F.col(t))
        keep = (
            (toks >= cfg.min_tokens)
            & (T.punct_ratio(F.col(t)) <= cfg.max_punct_ratio)
            & (T.stopword_ratio(F.col(t)) >= cfg.min_stopword_ratio)
        )
        if cfg.extra_quality_filter is not None:
            keep = keep & cfg.extra_quality_filter(F.col(t))
        cur = checkpoint(cur.where(keep), "quality")

    if (
        cfg.importance_target is not None
        and cfg.importance_keep > 0
        and "importance" not in skip
    ):
        # DSIR selection AFTER the quality gate: weight the survivors
        # against the target slice's n-gram distribution and keep the
        # top importance_keep by seeded Gumbel key (sampling without
        # replacement proportional to exp(logw); deterministic).
        # The predicate is evaluated on the ORIGINAL input frame (the
        # pipeline carries only id+text internally, and targets are
        # usually metadata columns like lang/source), then attached to
        # the survivors by id.
        from graphula_spark.operators.importance import (
            importance_weights_subset,
        )

        tgt_ids = docs.where(cfg.importance_target).select(
            F.col(i), F.lit(True).alias("__is_t")
        )
        tagged = cur.join(tgt_ids, i, "left")
        w = importance_weights_subset(
            tagged,
            F.coalesce(F.col("__is_t"), F.lit(False)),
            i,
            t,
            buckets=cfg.importance_buckets,
        )
        m = F.lit(2**31)
        u = (F.pmod(F.xxhash64(F.col(i), F.lit(43)), m) + F.lit(1.0)) / (
            m + F.lit(2.0)
        )
        picked = (
            w.withColumn("__gk", F.col("logw") - F.log(-F.log(u)))
            .orderBy(F.desc("__gk"))
            .limit(cfg.importance_keep)
            .select(i)
        )
        cur = checkpoint(cur.join(picked, i, "left_semi"), "importance")

    if "scrub" in cfg.stages and cfg.scrub_pii:
        cur = cur.withColumn(t, T.scrub_pii(F.col(t)))

    if cfg.bpe_merges is not None:
        from graphula_spark.operators.bpe import encode_bpe

        counts = encode_bpe(cur, i, t, cfg.bpe_merges).select(
            F.col("id").alias(i), "n_tokens"
        )
        docs_out = cur.join(counts, i)
    else:
        docs_out = cur.withColumn("n_tokens", T.token_count(F.col(t)))

    if cfg.split_fractions:
        from graphula_spark.operators.splits import leakage_safe_split

        docs_out = leakage_safe_split(
            docs_out, i, t, cfg.split_fractions
        )

    if "pack" in cfg.stages:
        # pack within hash buckets so the prefix-sum window
        # parallelizes (pack_by_budget refuses a global cumsum by
        # design); shard identity = (pack_bucket, shard)
        bucketed = docs_out.withColumn(
            "pack_bucket", F.pmod(F.xxhash64(F.col(i)), F.lit(16))
        )
        shards = pack_by_budget(
            bucketed,
            part_col="pack_bucket",
            order_col=i,
            weight_col="n_tokens",
            budget=float(cfg.shard_token_budget),
        )
    else:
        shards = docs_out.withColumn("shard", F.lit(0))

    return PipelineResult(shards=shards, documents=docs_out, report=report)
