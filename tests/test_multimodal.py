"""Multimodal column plumbing tests: schema, batching, stub contract."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    from graphula_spark.operators.multimodal import documents_as_media

    docs = spark.createDataFrame(
        [(1, "hello world", "en", "s1", 11), (2, "grüße", "de", "s2", 5)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    return documents_as_media(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "media_type", "meta",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"


def test_extract_features_fake(media):
    from graphula_spark.operators.multimodal import extract_features

    out = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    assert out[1]["n_bytes"] == 11
    # non-ascii text: byte length > char length
    assert out[2]["n_bytes"] == 7
    import hashlib

    assert out[1]["digest"] == hashlib.md5(b"hello world").hexdigest()
    assert 1 <= out[1]["width"] <= 1920 and 1 <= out[1]["height"] <= 1080


def test_real_decode_is_stubbed():
    from graphula_spark.operators.multimodal import _decode_image_real

    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x89PNG")


def test_sample_frames(media):
    from graphula_spark.operators.multimodal import sample_frames

    rows = sample_frames(media, every_n=1).collect()
    assert all(r["frame_digest"] is not None for r in rows)
    # frame count = max(1, len(payload)//64), every frame sampled
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], 0)
        by_id[r["media_id"]] += 1
    assert by_id == {1: 1, 2: 1}

    with pytest.raises(NotImplementedError):
        sample_frames(media, fake=False)


def test_delete_triples(spark):
    from graphula_spark.graph import Graph
    from graphula_spark.plans.bgp import TriplePattern, Var

    g = Graph.from_string_triples(
        spark,
        spark.createDataFrame(
            [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d")], ["s", "p", "o"]
        ),
        cache=False,
    )
    g2 = g.delete_string_triples(
        spark.createDataFrame([("b", "p", "c"), ("x", "p", "y")], ["s", "p", "o"])
    )
    X, Y = Var("X"), Var("Y")
    got = {
        (r["X"], r["Y"])
        for r in g2.execute_bgp_decoded([TriplePattern(X, "p", Y)]).collect()
    }
    assert got == {("a", "b"), ("c", "d")}
