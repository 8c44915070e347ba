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
