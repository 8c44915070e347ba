"""Edge cases for text operators not exercised by the synthetic docs."""

from graphula_spark.operators.relational import pack_by_budget
from graphula_spark.operators.text import gopher_signals


def test_pack_by_budget_contract(spark):
    rows = [("en", i, 40) for i in range(10)] + [("de", 0, 1000)]
    df = spark.createDataFrame(rows, ["lang", "doc_id", "n_tok"])
    out = pack_by_budget(df, "lang", "doc_id", "n_tok", budget=100.0)
    got = {(r["lang"], r["doc_id"]): r["shard"] for r in out.collect()}
    # en: exclusive prefix 0,40,80 -> shard 0; 120,160 -> 1; ...
    assert [got[("en", i)] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    # oversize single row still lands in its own shard 0
    assert got[("de", 0)] == 0
    # every shard's total <= budget + one row overshoot (40)
    from collections import defaultdict

    totals = defaultdict(int)
    for (lang, i), s in got.items():
        if lang == "en":
            totals[s] += 40
    assert all(t <= 100 + 40 for t in totals.values())


def test_gopher_signals_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world hello world hello world"),  # heavy repetition
            (2, "one"),  # single word: no bigrams
            (3, "   "),  # whitespace only: zero tokens
            (4, "a b c d e f g h"),  # all distinct
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in
           gopher_signals(df, "doc_id", "text").collect()}

    r1 = out[1]
    assert r1["n_words"] == 6
    assert r1["distinct_word_frac"] == 0.3333
    assert r1["top_word_frac"] == 0.5
    # 5 bigrams, 2 distinct -> 3/5 repeated
    assert r1["dup_2gram_frac"] == 0.6
    assert not r1["gopher_pass"]  # top_word_frac 0.5 >= 0.2

    r2 = out[2]
    assert r2["n_words"] == 1 and r2["dup_2gram_frac"] == 0.0
    assert not r2["gopher_pass"]  # too few words

    r3 = out[3]
    assert r3["n_words"] == 0
    assert r3["top_word_frac"] == 0.0  # no words at all (left-join fill)
    assert not r3["gopher_pass"]

    r4 = out[4]
    assert r4["distinct_word_frac"] == 1.0
    assert r4["dup_2gram_frac"] == 0.0
    assert r4["n_words"] == 8


def test_tfidf_topk_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry dates"),
        ],
        ["doc_id", "text"],
    )
    from graphula_spark.operators.text import tfidf_topk

    out = {
        (r["doc_id"], r["term"]): (r["tfidf"], r["rank"])
        for r in tfidf_topk(df, "doc_id", "text", k=3).collect()
    }

    def f4(x):
        return math.floor(x * 10000) / 10000

    # N=3; df: apple 1, banana 2, cherry 2, dates 1
    assert out[(1, "apple")] == (f4(2 * math.log(3 / 1)), 1)
    assert out[(1, "banana")] == (f4(1 * math.log(3 / 2)), 2)
    assert out[(2, "banana")][1] == 1 or out[(2, "cherry")][1] == 1
    # doc 2 tie (both tf=1, df=2): term asc breaks it -> banana rank 1
    assert out[(2, "banana")] == (f4(math.log(3 / 2)), 1)
    assert out[(2, "cherry")] == (f4(math.log(3 / 2)), 2)
    assert out[(3, "dates")][0] == f4(math.log(3 / 1))
    # doc 3: cherry tf=2 but df=2 -> 2*ln(1.5)=0.81 < dates ln(3)=1.09
    assert out[(3, "dates")][1] == 1


def test_decontaminate_flags_overlap(spark):
    from graphula_spark.operators.text import decontaminate

    base = "the quick brown fox jumps over the lazy dog today"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, base),                               # exact bench copy
            (2, base + " extra words beyond bench"), # partial overlap
            (3, "completely different text with no shared grams at all x"),
            (4, "short doc"),                        # < n tokens: 0 grams
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, base)], ["doc_id", "text"])
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(
            docs, bench, "doc_id", "text", n=8, threshold=0.5
        ).collect()
    }
    # doc 1: 3 grams, all hit
    assert out[1]["n_grams"] == 3 and out[1]["n_hits"] == 3
    assert out[1]["overlap"] == 1.0 and out[1]["contaminated"]
    # doc 2: 7 grams, the 3 bench grams hit -> 3/7 < 0.5
    assert out[2]["n_grams"] == 7 and out[2]["n_hits"] == 3
    assert not out[2]["contaminated"]
    assert out[3]["n_hits"] == 0 and not out[3]["contaminated"]
    assert out[4]["n_grams"] == 0 and out[4]["overlap"] == 0.0
    assert not out[4]["contaminated"]


def test_line_dedup(spark):
    from graphula_spark.operators.text import line_dedup

    banner = "Cookie notice: we use cookies"
    df = spark.createDataFrame(
        [
            (1, f"{banner}\nunique alpha\nshared line\nunique beta"),
            (2, f"{banner}\nSHARED LINE\nonly in two"),
            (3, "totally unique document\n\nwith a blank line"),
            (4, banner),  # all-boilerplate doc -> empty text survives
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in
           line_dedup(df, "doc_id", "text", min_dup_docs=2).collect()}

    # banner (3 docs) and "shared line"/"SHARED LINE" (normalized, 2
    # docs) are dropped; order of the survivors is preserved
    assert out[1]["text"] == "unique alpha\nunique beta"
    assert out[1]["n_lines"] == 4 and out[1]["n_removed"] == 2
    assert out[2]["text"] == "only in two"
    # blank lines never count as duplicates
    assert out[3]["text"] == "totally unique document\n\nwith a blank line"
    assert out[3]["n_removed"] == 0
    assert out[4]["text"] == "" and out[4]["n_removed"] == 1
    # every input doc comes back exactly once
    assert set(out) == {1, 2, 3, 4}


def test_line_dedup_matches_python_reference(spark):
    """Corpus run vs a plain-Python reference implementation."""
    import collections

    from graphula_spark.operators.text import line_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [(r["doc_id"], r["text"]) for r in
            docs.select("doc_id", "text").collect()]
    freq = collections.Counter()
    for _, text in rows:
        for norm in {l.strip().lower() for l in text.split("\n")}:
            if norm:
                freq[norm] += 1
    expected = {}
    for doc_id, text in rows:
        kept = [l for l in text.split("\n")
                if not (l.strip().lower() and freq[l.strip().lower()] >= 2)]
        removed = text.count("\n") + 1 - len(kept)
        expected[doc_id] = ("\n".join(kept), removed)

    got = {r["doc_id"]: (r["text"], r["n_removed"]) for r in
           line_dedup(docs, "doc_id", "text", min_dup_docs=2).collect()}
    assert got == expected


def test_line_dedup_degrades_to_shuffle_join(spark):
    """The heavy-line join carries NO broadcast hint: when Spark's
    size estimate says the boilerplate set is too big to broadcast
    (simulated by disabling auto-broadcast), the plan must fall back
    to a shuffle join instead of forcing a broadcast that would OOM
    executors on a web-scale corpus — the graceful degradation the
    docstring promises."""
    from graphula_spark.operators.text import line_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = line_dedup(docs, "doc_id", "text", min_dup_docs=2)
        n = out.count()  # run it so AQE settles the final plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert n == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_chunk_documents(spark):
    from graphula_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # 7 tokens
            (2, "x y"),             # shorter than one chunk
            (3, "   "),             # empty -> no chunks
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, "doc_id", "text", chunk_size=3).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
           for r in out}
    assert got == {
        (1, 0): ("a b c", 3),
        (1, 1): ("d e f", 3),
        (1, 2): ("g", 1),
        (2, 0): ("x y", 2),
    }

    # overlap: windows advance by chunk_size - overlap
    out2 = chunk_documents(df, "doc_id", "text", chunk_size=4, overlap=2)
    got2 = {(r["doc_id"], r["chunk_id"]): r["chunk_text"]
            for r in out2.collect()}
    assert got2 == {
        (1, 0): "a b c d",
        (1, 1): "c d e f",
        (1, 2): "e f g",
        (2, 0): "x y",
    }

    # every token of every doc is covered, in order, by the chunk grid
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_size=4, overlap=4)


def test_quality_classifier(spark):
    """Train on synthetic good/bad docs, verify separation on held-out
    docs of each kind."""
    from graphula_spark.operators.quality import (
        score_quality,
        train_quality_model,
    )

    good = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "she walked to the market and bought fresh bread with her savings",
        "a long journey begins with a single step through the old forest",
        "the committee agreed that the proposal would benefit the village",
        "he read the letter twice before answering with a careful reply",
        "many travelers visit the coast during the warm summer months",
    ]
    bad = [
        "buy buy buy buy buy buy buy buy buy buy buy buy",
        "$$$ !!! ### @@@ %%% ^^^ &&& *** ((( ))) ___ +++",
        "aaaaaaa bbbbbbb aaaaaaa bbbbbbb aaaaaaa bbbbbbb aaaaaaa",
        "x",
        "click here click here click here click here click here",
        "zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz",
    ]
    rows = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, 0) for i, t in enumerate(bad)
    ]
    train = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    model = train_quality_model(train, "doc_id", "text")

    test = spark.createDataFrame(
        [
            (1, "the children played in the garden until the sun went down"),
            (2, "win win win win win win win win win win win win win"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in
           score_quality(model, test, "doc_id", "text").collect()}
    assert got[1]["quality_prob"] > got[2]["quality_prob"]
    assert got[1]["quality_pass"] and not got[2]["quality_pass"]


def test_unigram_logprob_score(spark):
    import math

    from graphula_spark.operators.quality import unigram_logprob_score

    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat")], ["doc_id", "text"]
    )
    # self-model: counts the=2, cat=1, dog=1, sat=2 -> total 6, vocab 4
    out = {r["doc_id"]: r.asDict() for r in
           unigram_logprob_score(ref, "doc_id", "text").collect()}

    def p(cnt):
        return (cnt + 0.5) / (6 + 0.5 * 5)

    exp1 = -(math.log(p(2)) + math.log(p(1)) + math.log(p(2))) / 3
    assert abs(out[1]["avg_neg_logprob"] - round(exp1, 6)) < 1e-6
    assert out[1]["n_tokens"] == 3

    # scoring a new corpus against the reference model: common words
    # score better than unseen gibberish
    model = spark.createDataFrame(
        [("the", 100), ("cat", 50), ("sat", 50)], ["term", "cnt"]
    )
    test = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zorp blick quux")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["avg_neg_logprob"] for r in
           unigram_logprob_score(test, "doc_id", "text", model).collect()}
    assert got[10] < got[11]


def test_chunk_documents_coverage_property(spark):
    """Property: for any doc and chunk geometry, de-overlapped chunk
    concatenation reproduces the token stream exactly (no token lost,
    none duplicated beyond the declared overlap)."""
    import random

    from graphula_spark.operators.text import chunk_documents

    rng = random.Random(7)
    docs, geoms = [], {}
    for i in range(40):
        n = rng.randint(0, 50)
        docs.append((i, " ".join(f"t{i}_{j}" for j in range(n))))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for chunk_size, overlap in [(8, 0), (8, 3), (5, 4), (64, 2), (1, 0)]:
        out = chunk_documents(df, "doc_id", "text", chunk_size, overlap)
        rows = sorted(
            ((r["doc_id"], r["chunk_id"]), r["chunk_text"])
            for r in out.collect()
        )
        per_doc = {}
        for (d, c), t in rows:
            per_doc.setdefault(d, []).append(t.split(" ") if t else [])
        for doc_id, text in docs:
            want = text.split(" ") if text else []
            chunks = per_doc.get(doc_id, [])
            if not want:
                assert chunks == []
                continue
            stride = chunk_size - overlap
            rebuilt = []
            for k, ch in enumerate(chunks):
                rebuilt.extend(ch if k == 0 else ch[overlap:])
                if k > 0:  # declared overlap really is the previous tail
                    assert chunks[k - 1][-overlap:] == ch[:overlap] or overlap == 0
                if k < len(chunks) - 1:  # all but the last are full
                    assert len(ch) == chunk_size
            assert rebuilt == want, (doc_id, chunk_size, overlap)


def test_line_dedup_identity_when_no_duplicates(spark):
    """Property: with min_dup_docs above any real multiplicity, every
    document round-trips byte-identical."""
    from graphula_spark.operators.text import line_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = line_dedup(docs, "doc_id", "text", min_dup_docs=10**6)
    diff = (
        out.alias("a")
        .join(docs.alias("b"), "doc_id")
        .where("a.text <> b.text OR a.n_removed <> 0")
        .count()
    )
    assert diff == 0


def test_corpus_report(spark):
    from graphula_spark.operators.text import corpus_report

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was good that day"),
            (2, "the cat sat on the mat and it was good that day"),  # dup
            (3, "der hund und die katze und das haus und der baum"),
            (4, "x"),
        ],
        ["doc_id", "text"],
    )
    r = corpus_report(df, "doc_id", "text").collect()[0].asDict()
    assert r["n_docs"] == 4
    assert r["n_exact_dups"] == 1
    assert r["lang_counts"]["en"] == 2 and r["lang_counts"]["de"] == 1
    assert r["token_percentiles"][1] in (10, 11)  # median token count
    assert 0.0 < r["mean_quality"] <= 1.0


def test_explain_sparql(spark):
    from graphula_spark.graph import Graph

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame([("a", "p", "b")], ["s", "p", "o"]),
        cache=False,
    )
    plan = g.explain_sparql("SELECT ?s WHERE { ?s <p> ?o }")
    assert "Physical Plan" in plan


def _py_bpe_train(texts, n_merges):
    """Plain-Python reference BPE (word-histogram formulation)."""
    from collections import Counter

    EOW = "▁"
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            words[w] += 1
    syms = {w: tuple(list(w[:-1]) + [w[-1] + EOW]) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, wc in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += wc
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        for w in syms:
            s = list(syms[w])
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = tuple(out)
    return merges


def test_bpe_train_matches_python_reference(spark):
    from graphula_spark.operators.bpe import encode_bpe, train_bpe

    texts = [
        "low lower lowest low low",
        "new newer newest new new new",
        "wide wider widest",
        "low newer wide lowest",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = train_bpe(df, "text", n_merges=12)
    assert merges == _py_bpe_train(texts, 12)
    assert len(merges) >= 8  # corpus supports many merges

    enc = {r["id"]: (r["tokens"], r["n_tokens"]) for r in
           encode_bpe(df, "doc_id", "text", merges).collect()}
    # round-trip: concatenating tokens reproduces each word sequence
    EOW = "▁"
    for i, t in enumerate(texts):
        toks, n = enc[i]
        assert n == len(toks)
        rebuilt = "".join(toks).replace(EOW, " ").strip()
        assert rebuilt == " ".join(t.lower().split())
    # a frequent word compresses to fewer symbols than characters
    low_doc = enc[0][0]
    assert any(len(tok.rstrip(EOW)) >= 3 for tok in low_doc)


class TestCompressionRatio:
    def test_repetitive_text_compresses_more(self, spark):
        from graphula_spark.operators.text import compression_ratio

        docs = spark.createDataFrame(
            [
                (1, "spam spam spam " * 50),
                (2, "the quick brown fox jumps over a lazy dog and then "
                    "wanders off toward distant unexplored hills quietly"),
                (3, ""),
            ],
            ["doc_id", "text"],
        )
        rows = {
            r["id"]: r.asDict()
            for r in compression_ratio(docs, "doc_id", "text").collect()
        }
        assert rows[1]["ratio"] < 0.1  # highly repetitive
        assert rows[2]["ratio"] > rows[1]["ratio"]
        assert rows[3]["ratio"] is None and rows[3]["n_bytes"] == 0

    def test_ratio_is_deterministic(self, spark):
        import zlib

        from graphula_spark.operators.text import compression_ratio

        text = "deterministic compression check " * 7
        docs = spark.createDataFrame([(5, text)], ["doc_id", "text"])
        r = compression_ratio(docs, "doc_id", "text").collect()[0]
        want = len(zlib.compress(text.encode(), 6))
        assert r["n_compressed"] == want
        assert r["ratio"] == want / len(text.encode())


def test_snapshot_diff(spark):
    from graphula_spark.operators.text import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo"), (3, "charlie")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(2, "bravo"), (3, "charlie v2"), (4, "delta")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new, "doc_id", "text").collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_tokenize_and_pack_true_token_budgets(spark):
    from graphula_spark.operators.bpe import (
        encode_bpe,
        tokenize_and_pack,
        train_bpe,
    )

    texts = [
        " ".join(f"alpha beta gamma delta word{j}" for j in range(i % 5 + 2))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = train_bpe(df, "text", n_merges=10)
    budget = 60
    packed = tokenize_and_pack(
        df, "doc_id", "text", merges, budget=budget, buckets=4, seed=3
    )
    rows = packed.collect()
    assert {r.doc_id for r in rows} == set(range(40))  # nothing dropped
    # n_tokens are the real encoder's counts
    enc = {r.id: r.n_tokens for r in encode_bpe(df, "doc_id", "text", merges).collect()}
    assert all(r.n_tokens == enc[r.doc_id] for r in rows)
    # shard budget: total <= budget + one doc's overshoot, per shard
    from collections import defaultdict

    shards = defaultdict(list)
    for r in rows:
        shards[(r.pack_bucket, r.shard)].append(r.n_tokens)
    for toks in shards.values():
        assert sum(toks) - max(toks) < budget  # streaming-pack contract
    # deterministic
    again = sorted(
        (r.doc_id, r.pack_bucket, r.shard)
        for r in tokenize_and_pack(
            df, "doc_id", "text", merges, budget=budget, buckets=4, seed=3
        ).collect()
    )
    assert again == sorted((r.doc_id, r.pack_bucket, r.shard) for r in rows)
