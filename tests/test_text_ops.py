"""Edge cases for text operators not exercised by the synthetic docs."""

from graphula_spark.operators.text import gopher_signals


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
