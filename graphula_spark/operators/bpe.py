"""Byte-pair-encoding tokenizer: distributed training + batched encode.

The text operators estimate token budgets with a BPE-ish regex
(`text.bpe_ish_token_count`); this module is the real thing — train an
actual merge table on the corpus and encode with it, so budget
packing / chunking can run on true token counts.

Training is the textbook BPE algorithm (Sennrich et al. 2016,
arXiv:1508.07909) with the pair-counting step distributed: every
iteration counts adjacent-symbol pairs across the whole corpus with
one explode + hash-agg (map-side combinable), takes the argmax on the
driver (a single row), and applies the merge corpus-wide with a JVM
array fold. n_merges iterations = n_merges bounded Spark jobs — the
same shape production tokenizer training uses at scale.

Encoding applies the learned merge list per document inside
`mapInPandas` (Arrow-batched; the merge loop is inherently sequential
per word, so this is the sanctioned pandas-UDF case).

Words are whitespace tokens of the lower-cased text with an
end-of-word marker appended to the last character, so merges never
cross word boundaries (standard BPE-on-words formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "▁"  # end-of-word marker (visually distinct, rare in text)


def train_bpe(
    df: DataFrame, text_col: str, n_merges: int = 50
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus. Returns the ordered
    merge list [(left, right), ...] — the tokenizer artifact.

    Deterministic: ties on pair count break lexicographically.
    """
    # distinct words with counts: BPE statistics only need the word
    # histogram, which is vocabulary-sized — dramatically smaller than
    # the corpus (the standard preprocessing step)
    words = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda w: F.length(w) > 0,
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    syms = words.select(
        "wc",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.when(
                i == F.length("word"),
                F.concat(F.substring("word", -1, 1), F.lit(EOW)),
            ).otherwise(F.col("word").substr(i, F.lit(1))),
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = syms.select(
            "wc",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda i: F.struct(
                            F.get("syms", i).alias("a"),
                            F.get("syms", i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("pr"),
        )
        top = (
            pairs.groupBy("pr")
            .agg(F.sum("wc").alias("n"))
            .orderBy(F.desc("n"), F.asc("pr.a"), F.asc("pr.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b = top[0]["pr"]["a"], top[0]["pr"]["b"]
        merges.append((a, b))
        if len(merges) % 64 == 0:
            # superseded checkpointed frames free via driver GC ->
            # ContextCleaner; nudge it so long trainings don't pile up
            # dead vocabulary copies in block-manager storage
            import gc

            gc.collect()
        merged = a + b
        # apply the merge corpus-wide: left-to-right fold over symbols
        syms = syms.select(
            "wc",
            F.aggregate(
                "syms",
                F.array().cast("array<string>"),
                lambda acc, s: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(a))
                    & (s == F.lit(b)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                    ),
                ).otherwise(F.concat(acc, F.array(s))),
            ).alias("syms"),
        ).localCheckpoint(eager=True)
    return merges


def encode_bpe(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — encode each document with
    the learned merge list (Arrow-batched `mapInPandas`; the per-word
    merge loop is sequential by nature)."""
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType, True),
            StructField("tokens", ArrayType(StringType()), True),
            StructField("n_tokens", IntegerType(), True),
        ]
    )

    def encode_word(word: str) -> list[str]:
        syms = list(word[:-1]) + [word[-1] + EOW]
        while len(syms) >= 2:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            syms[best : best + 2] = [syms[best] + syms[best + 1]]
        return syms

    def run(batches):
        for pdf in batches:
            out_ids, out_toks = [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in (text or "").lower().split():
                    toks.extend(encode_word(w))
                out_ids.append(rid)
                out_toks.append(toks)
            yield pd.DataFrame(
                {
                    "id": out_ids,
                    "tokens": out_toks,
                    "n_tokens": [len(t) for t in out_toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


def tokenize_and_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    budget: int,
    buckets: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Encode with the trained merge table and pack into ~budget-token
    shards using TRUE token counts (the regex estimate in
    `text.text_pack_shards` over- or under-fills shards by the
    estimator's error; training-data shards are billed in real
    tokens).

    Order within each pack bucket is a seeded epoch shuffle
    (xxhash64), so shards mix sources instead of preserving ingest
    order — the same discipline as `relational.shuffle_deterministic`.
    Packing windows are PARTITIONED by bucket so the prefix sum
    parallelizes (see `pack_by_budget`); shard identity is
    (pack_bucket, shard). Deterministic for a (corpus, merges, seed).

    Returns (id_col, tokens, n_tokens, pack_bucket, shard)."""
    from .relational import pack_by_budget

    enc = encode_bpe(df, id_col, text_col, merges)
    bucketed = enc.withColumn(
        "pack_bucket", F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(buckets))
    ).withColumn("__ord", F.xxhash64(F.col("id"), F.lit(seed + 1)))
    packed = pack_by_budget(
        bucketed,
        part_col="pack_bucket",
        order_col="__ord",
        weight_col="n_tokens",
        budget=float(budget),
    )
    return packed.drop("__ord").withColumnRenamed("id", id_col)
