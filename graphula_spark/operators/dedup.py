"""Deduplication operators for large-scale document pipelines.

All hot paths are JVM-side DataFrame expressions (no Python UDFs):
shingling via split/transform, hashing via xxhash64/md5, band-bucket
joins for candidate generation. Designed so the candidate-generation
shuffle keys (band hashes) distribute evenly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id row per identical text.

    One hash-aggregate shuffle keyed on the text hash. The window also
    partitions on the text itself so a 64-bit hash collision between two
    distinct texts can never merge them — the hash only serves to keep
    the shuffle partitioner cheap.
    """
    w = Window.partitionBy("__h", text_col).orderBy(id_col)
    return (
        df.withColumn("__h", F.xxhash64(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def word_shingles(text_col, n: int = 3, distinct: bool = True):
    """n-word shingles as an array<string> column (distinct by default;
    pass distinct=False where duplicates don't matter — e.g. MinHash,
    whose min is duplicate-invariant — to skip the hash-set pass)."""
    tokens = F.split(F.trim(F.lower(text_col)), r"\s+")
    k = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    raw = F.transform(
        idx,
        # element_at is O(1); slice() would copy O(n) per shingle
        # making shingling O(n^2) per document
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(1, n + 1)]
        ),
    )
    return F.when(
        F.size(tokens) < n,
        F.array(F.concat_ws(" ", tokens)),
    ).otherwise(F.array_distinct(raw) if distinct else raw)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str | None,
    num_hashes: int = 32,
    shingle_n: int = 3,
    shingle_col: str | None = None,
) -> DataFrame:
    """(id, h0..h{k-1}) MinHash signature, fully per-row.

    Array higher-order functions hash the shingle array into two
    base-hash arrays once; each h_i is array_min over a cheap bitwise
    mix (double hashing h_i = h1 XOR rotl(h2, 2i+1), ANSI-safe) — no
    explode, no shuffle, no aggregation. Candidates are exact-verified
    downstream so approximation quality only affects recall.

    ``shingle_col`` feeds a precomputed shingle array instead of
    re-deriving one from ``text_col`` (min() is duplicate-invariant,
    so a distinct array scores identically) — callers that need both
    shingles and signatures then pay ONE shingling pass; such inputs
    are already materialized, so the repartition spread is skipped too.
    """
    # small single-file inputs still repartition to use all cores; at
    # scale maxPartitionBytes already splits the scan
    par = df.sparkSession.sparkContext.defaultParallelism
    if shingle_col is not None:
        src = df.select(F.col(id_col).alias("id"), F.col(shingle_col).alias("sh"))
    else:
        # min() is duplicate-invariant, so signatures skip word_shingles'
        # array_distinct pass; b2 re-hashes the 8-byte b1 longs JVM-side
        # instead of hashing a prefixed copy of every shingle string
        shingles = word_shingles(F.col(text_col), shingle_n, distinct=False)
        src = df.repartition(par, id_col).select(
            F.col(id_col).alias("id"), shingles.alias("sh")
        )
    based = (
        src
        .selectExpr("id", "transform(sh, s -> xxhash64(s)) AS b1")
        .selectExpr("id", "b1", "transform(b1, h -> xxhash64(h)) AS b2")
    )

    # the h_i expressions are built as SQL strings parsed JVM-side in
    # ONE selectExpr call: constructing 32 zip_with lambdas through the
    # Python Column API costs ~1.4s of py4j round-trips PER INVOCATION
    # (measured), pure driver-side overhead repeated for every batch
    exprs = []
    for i in range(num_hashes):
        c = (2 * i + 1) % 64
        rot = (
            f"(shiftleft(y, {c}) | shiftrightunsigned(y, {64 - c}))"
            if c
            else "y"
        )
        exprs.append(f"array_min(zip_with(b1, b2, (x, y) -> x ^ {rot})) AS h{i}")
    return based.selectExpr("id", *exprs)


def band_hashes(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, bh) LSH band hashes from a (id, h0..h{k-1}) signature
    table: each band hashes its rows_per_band signature slots into one
    64-bit bucket key. Shared by the self-join dedup and the persisted
    incremental index so both sides of an index query bucket
    identically."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bh"))
        )
    return sig.select("id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )


def choose_lsh_params(
    jaccard_threshold: float, num_hashes: int = 32
) -> tuple[int, int]:
    """(bands, rows) with bands*rows == num_hashes whose S-curve
    inflection `(1/b)^(1/r)` sits closest to the Jaccard threshold
    (the standard banding analysis, Mining of Massive Datasets §3.4).

    Below the inflection candidate probability collapses toward 0,
    above it toward 1 — so placing it AT the configured threshold
    maximizes recall for true pairs while bounding the false-candidate
    volume the exact verify has to pay for. Low thresholds therefore
    get MORE bands (shorter rows -> more permissive), high thresholds
    fewer."""
    best = None
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b
        d = abs((1.0 / b) ** (1.0 / r) - jaccard_threshold)
        if best is None or d < best[0]:
            best = (d, b, r)
    return best[1], best[2]


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int | str = "auto",
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact verify.

    Pipeline: signatures → band hashes → self-join on (band, hash) for
    candidates → exact shingle-set Jaccard on candidates only. Returns
    (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.

    ``bands="auto"`` (default) picks the banding whose S-curve
    inflection matches ``jaccard_threshold`` via `choose_lsh_params`
    — at the historical defaults (32 hashes, threshold 0.5) this
    resolves to the former fixed ``bands=8``, so existing oracle rows
    are unchanged; corpora deduped at other thresholds now get a
    banding that actually targets them.
    """
    if bands == "auto":
        bands, _ = choose_lsh_params(jaccard_threshold, num_hashes)
    # the banded self-join consumes the signature subtree twice; persist
    # so the explode+hash work runs once (materialized eagerly — the
    # signature table is k longs per doc, tiny relative to the corpus)
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n).persist()
    sig.count()
    banded = band_hashes(sig, num_hashes, bands)
    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return verify_jaccard(
        df, candidates, id_col, text_col, shingle_n, jaccard_threshold
    )


def verify_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    threshold: float,
) -> DataFrame:
    """Exact Jaccard for candidate pairs.

    Shingle sets ride as array columns: two id-keyed joins attach each
    side's (distinct) shingle array, then `array_intersect` computes
    the overlap per-row — O(|A|+|B|) hash-set intersection inside
    whole-stage codegen. Versus the explode-and-count formulation this
    removes the (pair, shingle) blow-up, one aggregation shuffle, and
    two size-table joins; only candidate pairs (LSH-bounded, not
    all-pairs) ever carry arrays.
    """
    touched = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), shingle_n).alias("sh"),
        )
        .join(touched, "id", "left_semi")  # only docs in candidate pairs
    )
    # consumed by both sides of the pair join — persist so the corpus
    # scan + shingling runs once
    sh = sh.persist()
    a = sh.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a")
    )
    b = sh.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("sh_a", "sh_b"))
        )
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (
                F.size("sh_a") + F.size("sh_b") - F.col("n_inter")
            ).cast("double"),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .drop("sh_a", "sh_b", "n_inter")
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def ngram_jaccard_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    prefix_len: int = 32,
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Deterministic blocked exact-Jaccard pairs (oracle-friendly).

    Blocks = equal first `prefix_len` chars of the normalized text;
    exact word-shingle Jaccard within blocks. Deliberately reproducible
    in ANSI SQL for the correctness oracle.
    """
    norm = F.lower(F.trim(F.col(text_col)))
    par = df.sparkSession.sparkContext.defaultParallelism
    # both sides of the self-join read this projection: persist so the
    # source scan + substring run once
    blocked = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col).alias("id"),
            F.substring(norm, 1, prefix_len).alias("blk"),
        )
        .persist()
    )
    a = blocked.select(F.col("id").alias("id_a"), "blk")
    b = blocked.select(F.col("id").alias("id_b"), "blk")
    pairs = a.join(b, "blk").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    return verify_jaccard(df, pairs, id_col, text_col, shingle_n, threshold)


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens (JVM-side, no UDF).

    For each bit position, sum +1/-1 according to the token hash bit;
    sign of the sum becomes the fingerprint bit.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    tokens = df.repartition(par, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = tokens.groupBy("id").agg(*bit_aggs)
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("id", fp.alias("simhash"))


def hash60(col):
    """60-bit positive hash reproducible across Spark and ANSI-SQL
    engines: first 15 hex chars of md5, parsed as an integer.

    Slower than xxhash64 (use only where cross-engine reproducibility is
    required, e.g. oracle-checked fingerprints); still fully JVM-side.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash_portable(
    df: DataFrame, id_col: str, text_col: str, bits: int = 60
) -> DataFrame:
    """SimHash over word tokens using the cross-engine `hash60` token
    hash, so a SQL oracle can reproduce fingerprints bit-for-bit."""
    par = df.sparkSession.sparkContext.defaultParallelism
    tokens = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
        )
        .where(F.length("tok") > 0)
        .withColumn("h", hash60(F.col("tok")))
    )
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = tokens.groupBy("id").agg(*bit_aggs)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select("id", fp.alias("simhash"))


def _hamming_blocked_pairs(
    fp: DataFrame, max_hamming: int, bits: int
) -> DataFrame:
    """Pairs within `max_hamming` of each other on fp(id, simhash),
    found via pigeonhole blocking: the fingerprint is cut into
    `max_hamming + 1` disjoint blocks — d differing bits can touch at
    most d blocks, so any pair within distance d shares at least one
    block verbatim. Recall is therefore EXACT for the given threshold;
    the blocked self-join only bounds the candidate set.

    Scale lever: larger thresholds mean narrower blocks and denser
    buckets (fewer distinct block values), pushing the candidate join
    toward quadratic — keep max_hamming small at large corpus sizes.
    """
    n_blocks = min(max_hamming + 1, bits)
    width = bits // n_blocks
    mask = (1 << width) - 1
    fp = fp.persist()
    blocks = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned(F.col("simhash"), q * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bk"),
                    )
                    for q in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.q").alias("q"), F.col("b.bk").alias("bk"))
    a = blocks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "q", "bk"
    )
    b = blocks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "q", "bk"
    )
    cand = (
        a.join(b, ["q", "bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_portable_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs on the portable 60-bit SimHash. Recall-complete
    for the threshold by pigeonhole blocking, so an all-pairs SQL
    oracle matches bit-for-bit."""
    fp = simhash_portable(df, id_col, text_col)
    return _hamming_blocked_pairs(fp, max_hamming, bits=60)


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash Hamming distance. Blocking is
    pigeonhole-adaptive (`max_hamming + 1` blocks), so recall is exact
    for the requested threshold — the round-1 fixed-4-block version
    silently lost pairs at distances 4+ when called with a larger
    threshold."""
    fp = simhash64(df, id_col, text_col)
    return _hamming_blocked_pairs(fp, max_hamming, bits=64)


def substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 8,
) -> DataFrame:
    """Cross-document exact-substring (span) deduplication.

    The ExactSubstr discipline from "Deduplicating Training Data Makes
    Language Models Better" (Lee et al., 2022), re-expressed as a
    distributed DataFrame program instead of a suffix array: any token
    span of length >= min_len that occurs more than once across the
    corpus is removed from every occurrence EXCEPT the globally first
    one (min (id, pos)). Where the reference engine has no such
    operator, LLM data pipelines rely on it heavily — and the suffix
    array the paper uses is single-node; this formulation shuffles on
    bounded keys only.

    Plan shape (all JVM-side, no Python UDFs):
      1. one explode to (id, pos, k-gram) occurrence rows,
      2. one window over (xxhash64(kgram), kgram) marking duplicate
         occurrences (the hash keeps the shuffle partitioner cheap; the
         kgram itself rides in the key so 64-bit collisions cannot
         merge distinct spans — same trick as exact_dedup),
      3. gaps-and-islands span merge per document (window on id),
      4. one equi-join of merged spans back to documents; cleaned text
         rebuilt with array higher-order functions.

    Spans overlapping or adjacent after marking merge into one removal
    interval, so removing k-gram STARTS of length min_len removes
    exactly the maximal duplicated substrings of length >= min_len.

    Returns (id, clean_text, n_dup_positions, n_spans, n_tokens_kept).
    Text is whitespace-normalized (tokens re-joined with single
    spaces) — by-product of token-level processing, applied uniformly
    to untouched documents too so output is comparable.
    """
    k = min_len
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        df.repartition(par, id_col)
        .select(F.col(id_col).alias("id"), toks.alias("toks"))
        .persist()
    )
    # occurrence rows: one per k-gram start position (docs shorter than
    # k contribute none and pass through untouched)
    n_pos = F.size("toks") - F.lit(k - 1)
    occ = (
        base.where(n_pos > 0)
        .select("id", F.explode(F.sequence(F.lit(0), n_pos - 1)).alias("pos"), "toks")
        .select(
            "id",
            "pos",
            F.concat_ws(" ", F.slice("toks", F.col("pos") + 1, k)).alias("kg"),
        )
    )
    wk = Window.partitionBy(F.xxhash64("kg"), "kg")
    marked = occ.select(
        "id",
        "pos",
        F.count(F.lit(1)).over(wk).alias("cnt"),
        F.row_number().over(wk.orderBy("id", "pos")).alias("rn"),
    )
    dups = marked.where((F.col("cnt") > 1) & (F.col("rn") > 1)).select(
        "id", F.col("pos").alias("s"), (F.col("pos") + F.lit(k - 1)).alias("e")
    )
    # gaps-and-islands: a dup start opens a new island iff it begins
    # past the running max end + 1 (adjacent intervals merge)
    wd = Window.partitionBy("id").orderBy("s")
    run_end = F.max("e").over(wd.rowsBetween(Window.unboundedPreceding, -1))
    isl = dups.select(
        "id",
        "s",
        "e",
        F.when(run_end.isNull() | (F.col("s") > run_end + 1), F.lit(1))
        .otherwise(F.lit(0))
        .alias("brk"),
    ).select("id", "s", "e", F.sum("brk").over(wd).alias("island"))
    spans = isl.groupBy("id", "island").agg(
        F.min("s").alias("s"), F.max("e").alias("e"), F.count(F.lit(1)).alias("npos")
    )
    per_doc = spans.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("spans"),
        F.sum("npos").alias("n_dup_positions"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    joined = base.join(per_doc, "id", "left")
    idx = F.sequence(F.lit(0), F.size("toks") - 1)
    in_span = lambda i: F.exists(  # noqa: E731
        F.col("spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])
    )
    kept = F.when(F.col("spans").isNull(), idx).otherwise(
        F.filter(idx, lambda i: ~in_span(i))
    )
    out = joined.select(
        F.col("id").alias(id_col),
        F.concat_ws(
            " ", F.transform(kept, lambda i: F.element_at("toks", i + 1))
        ).alias("clean_text"),
        F.coalesce(F.col("n_dup_positions"), F.lit(0)).alias("n_dup_positions"),
        F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
        # NULL text ⇒ toks/kept are NULL ⇒ size() is NULL; the SQL
        # oracle yields 0 for such docs, so coalesce keeps parity
        F.coalesce(F.size(kept), F.lit(0)).alias("n_tokens_kept"),
    )
    return out


class MinHashIndex:
    """Persisted MinHash+LSH corpus index for INCREMENTAL dedup.

    At 100 TB the corpus signature/band computation is the expensive
    pass; recomputing it for every ingest batch (as the self-join
    `minhash_lsh_pairs` would) multiplies that cost by the number of
    batches. This index materializes the corpus side once:

      <path>/bands/     (id, bh) parquet, partitioned by band — an
                        incoming batch's band hashes join here; the
                        band partition column prunes each probe to
                        1/bands of the index, and only bucket-colliding
                        index rows survive the join,
      <path>/shingles/  (id, sh array<string>) — exact-verify side;
                        only candidate ids are ever read (semi-join
                        pushes into the scan),
      <path>/_meta.json hash/band/shingle parameters, pinned so every
                        future batch buckets identically.

    `query(batch)` broadcasts the BATCH side (an ingest batch is small
    relative to the corpus by definition) so the corpus index is only
    ever scanned, never shuffled. `add(batch)` appends the batch's
    bands/shingles, keeping the index current as the corpus grows —
    together they make dedup-on-ingest O(batch) instead of O(corpus).
    """

    def __init__(self, spark, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.num_hashes = int(meta["num_hashes"])
        self.bands = int(meta["bands"])
        self.shingle_n = int(meta["shingle_n"])

    # -- construction -------------------------------------------------

    @staticmethod
    def build(
        df: DataFrame,
        id_col: str,
        text_col: str,
        path: str,
        num_hashes: int = 32,
        bands: int = 8,
        shingle_n: int = 3,
    ) -> "MinHashIndex":
        import json
        import os

        spark = df.sparkSession
        par = spark.sparkContext.defaultParallelism
        sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
        band_hashes(sig, num_hashes, bands).write.mode("overwrite").partitionBy(
            "band"
        ).parquet(f"{path}/bands")
        (
            df.repartition(par, id_col)
            .select(
                F.col(id_col).alias("id"),
                word_shingles(F.col(text_col), shingle_n).alias("sh"),
            )
            .write.mode("overwrite")
            .parquet(f"{path}/shingles")
        )
        meta = {
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_n": shingle_n,
        }
        os.makedirs(path, exist_ok=True)
        with open(f"{path}/_meta.json", "w") as fh:
            json.dump(meta, fh)
        return MinHashIndex(spark, path, meta)

    @staticmethod
    def load(spark, path: str) -> "MinHashIndex":
        import json

        with open(f"{path}/_meta.json") as fh:
            return MinHashIndex(spark, path, json.load(fh))

    # -- incremental operations ---------------------------------------

    def query(
        self,
        batch: DataFrame,
        id_col: str,
        text_col: str,
        jaccard_threshold: float = 0.5,
    ) -> DataFrame:
        """Near-dup pairs between an ingest batch and the indexed
        corpus: (id_new, id_corpus, jaccard), exact-verified.

        The batch side is broadcast, so the plan is a corpus-index scan
        with a broadcast hash join probe — zero corpus shuffle — then
        an exact verify that touches only candidate corpus ids.

        Plan shape (round-5 trim): the verify stage is TWO broadcast
        hash joins against ONE shingles scan — candidate pairs prune
        the scan (same effect as the former semi-join) and the batch
        shingles attach in the same stage, so the whole query is three
        actions (batch broadcast, candidate broadcast, final scan)
        instead of the former persist + semi-join + two-join chain
        (~7 sequential jobs; 2.2 s of orchestration at sf0.1, now
        ~1 s). Band-collision duplicate pairs and duplicate index rows
        (at-least-once producers) collapse in one pair-keyed
        dropDuplicates AFTER the jaccard filter, which only ever sees
        LSH-bounded candidate rows."""
        # one batch pass computes shingles AND signatures, materialized
        # once (localCheckpoint) so the two broadcast branches below
        # don't each re-scan the batch source — the batch is
        # broadcast-small by contract, so pinning it is free. The
        # repartition spreads the shingling across cores (an ingest
        # batch often arrives as one file = one task; shingling it
        # single-threaded was ~1.6 s of the former 2.2 s at sf0.1)
        par = self.spark.sparkContext.defaultParallelism
        prep = (
            batch.repartition(par)
            .select(
                F.col(id_col).alias("id_new"),
                word_shingles(F.col(text_col), self.shingle_n).alias("sh_new"),
            )
            .localCheckpoint(eager=True)
        )
        sig = minhash_signatures(
            prep, "id_new", None, self.num_hashes, self.shingle_n,
            shingle_col="sh_new",
        )
        new_bands = band_hashes(sig, self.num_hashes, self.bands)
        idx_bands = self.spark.read.parquet(f"{self.path}/bands")
        candidates = (
            idx_bands.alias("c")
            .join(
                F.broadcast(new_bands).alias("n"),
                (F.col("c.band") == F.col("n.band"))
                & (F.col("c.bh") == F.col("n.bh")),
            )
            .select(
                F.col("n.id").alias("id_new"), F.col("c.id").alias("id_corpus")
            )
        )
        new_sh = prep
        corpus_sh = self.spark.read.parquet(f"{self.path}/shingles").select(
            F.col("id").alias("id_corpus"), F.col("sh").alias("sh_corpus")
        )
        inter = F.size(F.array_intersect("sh_new", "sh_corpus"))
        union = F.size("sh_new") + F.size("sh_corpus") - inter
        return (
            corpus_sh.join(F.broadcast(candidates), "id_corpus")
            .join(F.broadcast(new_sh), "id_new")
            .withColumn(
                "jaccard", inter.cast("double") / union.cast("double")
            )
            .where(F.col("jaccard") >= jaccard_threshold)
            # collapses band-duplicate pairs AND duplicate index rows
            # (identical shingle sets score identically, so the kept
            # row is well-defined)
            .dropDuplicates(["id_new", "id_corpus"])
            .select("id_new", "id_corpus", "jaccard")
        )

    def add(self, batch: DataFrame, id_col: str, text_col: str) -> None:
        """Append a batch to the index (bands + shingles) so later
        queries see it as part of the corpus."""
        sig = minhash_signatures(
            batch, id_col, text_col, self.num_hashes, self.shingle_n
        )
        band_hashes(sig, self.num_hashes, self.bands).write.mode(
            "append"
        ).partitionBy("band").parquet(f"{self.path}/bands")
        (
            batch.select(
                F.col(id_col).alias("id"),
                word_shingles(F.col(text_col), self.shingle_n).alias("sh"),
            )
            .write.mode("append")
            .parquet(f"{self.path}/shingles")
        )
