"""Cross-document substring (span) dedup — ExactSubstr discipline.

Verified against a plain-Python reference implementation on handcrafted
corpora and randomized ones (the same verification style the reference
uses for its dictionary property tests, DictionarySpec.scala).
"""

import random
import re
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from graphula_spark.operators.dedup import substring_dedup


def ref_substring_dedup(docs, k):
    """Plain-Python oracle: remove every non-first occurrence of any
    duplicated k-token span, merging overlapping/adjacent removals."""
    toks = {i: re.split(r"\s+", t.strip()) if t.strip() else [""] for i, t in docs}
    groups = defaultdict(list)
    for i, ts in sorted(toks.items()):
        for p in range(len(ts) - k + 1):
            groups[" ".join(ts[p : p + k])].append((i, p))
    dup = defaultdict(list)
    for occs in groups.values():
        if len(occs) > 1:
            for i, p in sorted(occs)[1:]:
                dup[i].append(p)
    out = {}
    for i, ts in toks.items():
        spans = []
        for s in sorted(dup.get(i, [])):
            e = s + k - 1
            if spans and s <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, e])
        remove = set()
        n_dup = len(dup.get(i, []))
        for s, e in spans:
            remove.update(range(s, e + 1))
        kept = [t for j, t in enumerate(ts) if j not in remove]
        out[i] = (" ".join(kept), n_dup, len(spans), len(kept))
    return out


def run_both(spark, docs, k):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["clean_text"],
            r["n_dup_positions"],
            r["n_spans"],
            r["n_tokens_kept"],
        )
        for r in substring_dedup(df, "doc_id", "text", min_len=k).collect()
    }
    want = ref_substring_dedup(docs, k)
    assert got == want


def test_shared_span_removed_from_second_doc(spark):
    shared = "alpha beta gamma delta"
    docs = [
        (1, f"intro one {shared} tail one"),
        (2, f"other words {shared} closing bits"),
        (3, "totally unrelated text with no duplicate content"),
    ]
    run_both(spark, docs, 4)
    # explicit semantics check: doc 1 (globally first) keeps the span
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {
        r["doc_id"]: r["clean_text"]
        for r in substring_dedup(df, "doc_id", "text", min_len=4).collect()
    }
    assert shared in rows[1]
    assert shared not in rows[2]
    assert rows[3] == docs[2][1]


def test_within_document_repeat(spark):
    span = "one two three four"
    docs = [(7, f"{span} middle part {span} end")]
    run_both(spark, docs, 4)


def test_overlapping_spans_merge(spark):
    # two duplicated 3-grams overlapping by one token in the copy
    docs = [
        (1, "a b c d e suffix1"),
        (2, "prefix2 a b c d e"),
    ]
    # k=3: duplicated starts in doc2 at the positions of a,b,c → one
    # merged island covering "a b c d e"
    run_both(spark, docs, 3)


def test_short_and_empty_docs_pass_through(spark):
    docs = [(1, "tiny"), (2, ""), (3, "   "), (4, "one two")]
    run_both(spark, docs, 4)


def test_null_text_matches_oracle_semantics(spark):
    df = spark.createDataFrame([(1, None), (2, "a b c d e")], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r.asDict()
        for r in substring_dedup(df, "doc_id", "text", min_len=4).collect()
    }
    # the DuckDB oracle yields ('', 0, 0, 0) for a NULL-text doc
    assert rows[1]["clean_text"] == ""
    assert rows[1]["n_dup_positions"] == 0
    assert rows[1]["n_spans"] == 0
    assert rows[1]["n_tokens_kept"] == 0
    assert rows[2]["n_tokens_kept"] == 5


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_against_python_reference(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(30)
    ]
    run_both(spark, docs, 3)


class TestMinHashIndex:
    """Persisted incremental MinHash index: query parity with the
    one-shot self-join pipeline, and add() growing the corpus."""

    def docs(self, spark):
        base = [
            (i, f"unique document number {i} with some distinct words {i*7}")
            for i in range(20)
        ]
        # near-dup pairs across the batch boundary: 5 divides id_new
        base.append((25, "the quick brown fox jumps over the lazy dog today"))
        base.append((31, "the quick brown fox jumps over the lazy dog tonight"))
        return spark.createDataFrame(base, ["doc_id", "text"])

    def test_query_matches_self_join_cross_pairs(self, spark, tmp_path):
        from graphula_spark.operators.dedup import MinHashIndex, minhash_lsh_pairs

        import pyspark.sql.functions as F

        docs = self.docs(spark)
        corpus = docs.where(F.col("doc_id") % 5 != 0)
        batch = docs.where(F.col("doc_id") % 5 == 0)
        idx = MinHashIndex.build(corpus, "doc_id", "text", str(tmp_path / "idx"))
        got = {
            (r["id_new"], r["id_corpus"], round(r["jaccard"], 4))
            for r in idx.query(batch, "doc_id", "text", 0.3).collect()
        }
        # one-shot pipeline over the full corpus, filtered to cross pairs
        full = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.3)
        want = set()
        for r in full.collect():
            a, b = r["id_a"], r["id_b"]
            j = round(r["jaccard"], 4)
            if a % 5 == 0 and b % 5 != 0:
                want.add((a, b, j))
            elif b % 5 == 0 and a % 5 != 0:
                want.add((b, a, j))
        assert got == want
        assert got  # the fox pair (25, 31) must be found
        assert any(p[:2] == (25, 31) for p in got)

    def test_add_extends_corpus_and_load_roundtrip(self, spark, tmp_path):
        from graphula_spark.operators.dedup import MinHashIndex

        docs = self.docs(spark)
        import pyspark.sql.functions as F

        corpus = docs.where(F.col("doc_id") % 5 != 0)
        batch = docs.where(F.col("doc_id") % 5 == 0)
        path = str(tmp_path / "idx2")
        MinHashIndex.build(corpus, "doc_id", "text", path)
        idx = MinHashIndex.load(spark, path)
        extra = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog today")],
            ["doc_id", "text"],
        )
        idx.add(extra, "doc_id", "text")
        got = {
            (r["id_new"], r["id_corpus"])
            for r in idx.query(batch, "doc_id", "text", 0.3).collect()
        }
        assert (25, 100) in got  # newly added corpus doc is probed
        assert (25, 31) in got


class TestStreamNearDedupIngest:
    def test_stream_ingest_filters_and_grows_index(self, spark, tmp_path):
        import pyspark.sql.functions as F
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from graphula_spark.operators.dedup import MinHashIndex
        from graphula_spark.streaming.windows import stream_near_dedup_ingest

        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "completely different corpus content about spark engines"),
            ],
            ["doc_id", "text"],
        )
        idx_path = str(tmp_path / "idx")
        MinHashIndex.build(corpus, "doc_id", "text", idx_path)

        batch = spark.createDataFrame(
            [
                # near-dup of corpus doc 1 -> rejected
                (10, "the quick brown fox jumps over the lazy dog tonight"),
                # unique -> accepted
                (11, "entirely novel text with nothing shared at all here"),
                # intra-batch near-dup pair -> min id 12 survives
                (12, "twin paragraphs arriving together in the same batch now"),
                (13, "twin paragraphs arriving together in the same batch here"),
            ],
            ["doc_id", "text"],
        )
        in_dir = str(tmp_path / "incoming")
        batch.write.parquet(in_dir)
        schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        )
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = stream_near_dedup_ingest(
            spark,
            stream,
            idx_path,
            jaccard_threshold=0.3,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination()

        accepted = {
            r["doc_id"]
            for r in spark.read.parquet(f"{idx_path}/accepted").collect()
        }
        assert accepted == {11, 12}

        # the index grew: a later near-dup of accepted doc 11 is caught
        later = spark.createDataFrame(
            [(20, "entirely novel text with nothing shared at all there")],
            ["doc_id", "text"],
        )
        idx = MinHashIndex.load(spark, idx_path)
        hits = {
            (r["id_new"], r["id_corpus"])
            for r in idx.query(later, "doc_id", "text", 0.3).collect()
        }
        assert (20, 11) in hits

    @pytest.mark.slowtail

    def test_stream_ingest_replay_converges(self, spark, tmp_path):
        """foreachBatch is at-least-once: re-executing a batch whose
        survivors already reached the index and accepted/ must converge
        to the same state — no self-rejection (survivors match their own
        index entries), no duplicate accepted rows, no duplicate bands."""
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from graphula_spark.operators.dedup import MinHashIndex
        from graphula_spark.streaming.windows import stream_near_dedup_ingest

        corpus = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today")],
            ["doc_id", "text"],
        )
        idx_path = str(tmp_path / "idx")
        MinHashIndex.build(corpus, "doc_id", "text", idx_path)

        batch = spark.createDataFrame(
            [
                (10, "the quick brown fox jumps over the lazy dog tonight"),
                (11, "entirely novel text with nothing shared at all here"),
            ],
            ["doc_id", "text"],
        )
        in_dir = str(tmp_path / "incoming")
        batch.write.parquet(in_dir)
        schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        )

        def run(ckpt: str) -> None:
            stream = spark.readStream.schema(schema).parquet(in_dir)
            q = stream_near_dedup_ingest(
                spark,
                stream,
                idx_path,
                jaccard_threshold=0.3,
                checkpoint=str(tmp_path / ckpt),
            )
            q.awaitTermination()

        run("ckpt1")
        # fresh checkpoint over the same input = a faithful replay of
        # batch 0 against an index that already absorbed its survivors
        run("ckpt2")

        accepted = [
            r["doc_id"]
            for r in spark.read.parquet(f"{idx_path}/accepted").collect()
        ]
        assert sorted(accepted) == [11]  # exactly once, not rejected
        idx = MinHashIndex.load(spark, idx_path)
        n_bands = (
            spark.read.parquet(f"{idx_path}/bands")
            .where(F.col("id") == 11)
            .count()
        )
        assert n_bands == idx.bands  # no duplicate band rows
        n_sh = (
            spark.read.parquet(f"{idx_path}/shingles")
            .where(F.col("id") == 11)
            .count()
        )
        assert n_sh == 1
