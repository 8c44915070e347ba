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

    # fake=False is REAL extraction now (operators/video.py): text
    # payloads are not videos, so no rows come back
    assert sample_frames(media, fake=False).collect() == []


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


def test_png_codec_roundtrip_all_filters():
    import struct
    import zlib

    import numpy as np

    from graphula_spark.operators.codecs import decode_png, encode_png

    # encoder→decoder round-trip, gray and RGB
    px = np.arange(7 * 5, dtype=np.uint8).reshape(5, 7)
    w, h, c, out = decode_png(encode_png(px))
    assert (w, h, c) == (7, 5, 1) and (out == px).all()
    rgb = (np.arange(4 * 3 * 3) % 256).astype(np.uint8).reshape(3, 4, 3)
    w, h, c, out = decode_png(encode_png(rgb))
    assert (w, h, c) == (4, 3, 3) and (out == rgb.reshape(3, 12)).all()

    # decoder handles every PNG row filter (1=Sub 2=Up 3=Average 4=Paeth),
    # not just the filter-0 rows our encoder writes
    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

    pix = (np.arange(5 * 6) * 37 % 256).astype(np.uint8).reshape(5, 6)
    rows, prev = [], np.zeros(6, np.int32)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        cur = pix[y].astype(np.int32)
        enc = np.zeros(6, np.int32)
        for x in range(6):
            left = cur[x - 1] if x >= 1 else 0
            ul = prev[x - 1] if x >= 1 else 0
            pred = [0, left, prev[x], (left + prev[x]) // 2,
                    paeth(int(left), int(prev[x]), int(ul))][ft]
            enc[x] = (cur[x] - pred) & 0xFF
        rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))
    w, h, c, out = decode_png(blob)
    assert (out == pix).all()


def test_wav_codec_and_features():
    import io
    import wave

    import numpy as np

    from graphula_spark.operators.codecs import (
        audio_features,
        encode_wav_pcm16,
    )

    t = np.arange(800)
    sq = np.where((t // 4) % 2 == 0, 1000, -1000).astype(np.int16)
    payload = encode_wav_pcm16(sq, 8000)
    assert audio_features(payload) == {
        "sample_rate": 8000, "n_channels": 1, "n_samples": 800,
        "max_amp": 1000, "n_zero_cross": (800 - 1) // 4,
    }
    # cross-check container format against the stdlib wave reader
    wf = wave.open(io.BytesIO(payload))
    assert wf.getframerate() == 8000 and wf.getnframes() == 800


def test_resize_nearest():
    import numpy as np

    from graphula_spark.operators.codecs import resize_nearest

    img = np.arange(4 * 6, dtype=np.uint8).reshape(4, 6)
    out = resize_nearest(img, 1, 3, 2)
    assert out.shape == (2, 3)
    assert out[0, 0] == img[0, 0] and out[1, 2] == img[2, 4]


def test_real_media_roundtrip_in_spark(spark):
    from graphula_spark.operators.multimodal import (
        extract_real_features,
        synthesize_real_media,
    )

    docs = spark.createDataFrame(
        [(i, f"s{i}") for i in range(10)], ["doc_id", "source"]
    )
    rows = {
        r["media_id"]: r.asDict()
        for r in extract_real_features(synthesize_real_media(docs)).collect()
    }
    import math

    def jpeg_pred(v):
        return min(255, max(0, math.floor(
            math.floor(8 * (v - 128) / 3 + 0.5) * 3 / 8 + 128.5)))

    for mid, r in rows.items():
        if mid % 4 == 0:
            assert r["detected"] == "png"
            assert (r["width"], r["height"]) == (mid % 64 + 1, mid % 48 + 1)
            assert r["mean_pixel"] == float(mid % 256)
        elif mid % 4 == 1:
            n = mid % 500 + 100
            assert r["detected"] == "wav" and r["n_samples"] == n
            assert r["n_zero_cross"] == (n - 1) // 4
        elif mid % 4 == 2:
            assert r["detected"] == "jpeg"
            assert (r["width"], r["height"]) == (mid % 40 + 1, mid % 32 + 1)
            assert r["mean_pixel"] == float(jpeg_pred(mid % 256))
        else:
            assert r["detected"] == ("y4m" if mid % 8 == 3 else "mjpeg")
            assert (r["width"], r["height"]) == (mid % 24 + 2, mid % 16 + 2)
            assert r["vid_frames"] == mid % 5 + 2
            want = mid % 256 if mid % 8 == 3 else jpeg_pred(mid % 256)
            assert r["mean_pixel"] == float(want)


def test_corrupt_payload_does_not_fail_batch(spark):
    from graphula_spark.operators.multimodal import extract_real_features

    df = spark.createDataFrame(
        [
            (1, bytearray(b"\x89PNG\r\n\x1a\x08garbage")),  # bad signature
            (2, bytearray(b"\x89PNG\r\n\x1a\n\x00\x00")),   # truncated
            (3, bytearray(b"RIFFxxxxWAVE")),                # no fmt/data
            (4, None),
            (5, bytearray(b"plain text")),
        ],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["detected"] for r in extract_real_features(df).collect()}
    assert got == {1: "unknown", 2: "corrupt", 3: "corrupt", 4: "empty", 5: "unknown"}


def test_png_roundtrip_property():
    """Property: encode→decode is identity for random images across
    shapes and channel counts."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from graphula_spark.operators.codecs import decode_png, encode_png

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        ch=st.sampled_from([1, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, ch, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        if ch == 1:
            px = px[:, :, 0]
        dw, dh, dc, out = decode_png(encode_png(px))
        assert (dw, dh, dc) == (w, h, ch)
        flat = px.reshape(h, w * ch)
        assert (out == flat).all()

    check()


def test_wav_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from graphula_spark.operators.codecs import decode_wav, encode_wav_pcm16

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 2000),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(n, rate, seed):
        rng = np.random.default_rng(seed)
        samples = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        r, ch, back = decode_wav(encode_wav_pcm16(samples, rate))
        assert (r, ch) == (rate, 1)
        assert (back == samples).all()

    check()


class TestVideoCodecs:
    """Y4M + MJPEG-AVI (operators/video.py): the two video formats
    honestly decodable without ffmpeg."""

    def test_y4m_mono_roundtrip_exact(self):
        import numpy as np

        from graphula_spark.operators.video import decode_y4m, encode_y4m

        rng = np.random.default_rng(21)
        fr = rng.integers(0, 256, (6, 14, 18), dtype=np.uint8)
        w, h, ctag, luma = decode_y4m(encode_y4m(fr, fps=(30, 1)))
        assert (w, h, ctag) == (18, 14, "Cmono")
        assert np.array_equal(luma, fr)  # uncompressed: exact

    def test_y4m_color_modes(self):
        import numpy as np

        from graphula_spark.operators.video import decode_y4m, encode_y4m

        rng = np.random.default_rng(22)
        col = rng.integers(0, 256, (3, 8, 10, 3), dtype=np.uint8)
        for chroma, tag in [("444", "C444"), ("420", "C420")]:
            w, h, ctag, luma = decode_y4m(encode_y4m(col, chroma=chroma))
            assert (w, h, ctag) == (10, 8, tag)
            assert luma.shape == (3, 8, 10)

    def test_mjpeg_avi_roundtrip(self):
        import numpy as np

        from graphula_spark.operators.video import (
            decode_mjpeg_avi,
            encode_mjpeg_avi,
        )

        rng = np.random.default_rng(23)
        g = rng.integers(0, 256, (4, 16, 16), dtype=np.uint8)
        w, h, frames = decode_mjpeg_avi(encode_mjpeg_avi(g, quality=90))
        assert (w, h, len(frames)) == (16, 16, 4)
        rgb = rng.integers(0, 256, (2, 16, 24, 3), dtype=np.uint8)
        w, h, frames = decode_mjpeg_avi(encode_mjpeg_avi(rgb))
        assert (w, h, len(frames)) == (24, 16, 2)
        assert frames[0].shape == (16, 24, 3)

    def test_mjpeg_flat_closed_form(self):
        """Flat MJPEG frames decode to the same closed-form value the
        still-JPEG oracle predicts (same DC quantizer arithmetic)."""
        import math

        import numpy as np

        from graphula_spark.operators.video import (
            decode_mjpeg_avi,
            encode_mjpeg_avi,
        )

        v = 200
        pred = min(
            255,
            max(0, math.floor(math.floor(8 * (v - 128) / 3 + 0.5) * 3 / 8 + 128.5)),
        )
        flat = np.full((3, 11, 13), v, dtype=np.uint8)
        _w, _h, frames = decode_mjpeg_avi(encode_mjpeg_avi(flat, quality=90))
        assert all((f == pred).all() for f in frames)

    def test_truncation_is_valueerror(self):
        import numpy as np

        from graphula_spark.operators.video import (
            decode_mjpeg_avi,
            decode_y4m,
            encode_mjpeg_avi,
            encode_y4m,
        )

        fr = np.full((2, 8, 8), 9, dtype=np.uint8)
        for payload, dec in [
            (encode_y4m(fr), decode_y4m),
            (encode_mjpeg_avi(fr), decode_mjpeg_avi),
        ]:
            for cut in range(4, len(payload) - 1, 37):
                with pytest.raises(ValueError):
                    dec(payload[:cut])


def test_real_frame_sampling_in_spark(spark):
    """sample_frames(fake=False) extracts REAL frames: identical frame
    content yields identical digests across containers and videos."""
    import numpy as np

    from graphula_spark.operators.video import encode_mjpeg_avi, encode_y4m
    from graphula_spark.operators.multimodal import sample_frames

    frames_a = np.stack(
        [np.full((8, 8), i * 10, dtype=np.uint8) for i in range(5)]
    )
    rows = [
        (1, bytearray(encode_y4m(frames_a)), "video", None),
        # same first frame content in a different video
        (2, bytearray(encode_y4m(frames_a[:1])), "video", None),
        (3, bytearray(b"not a video"), "video", None),
    ]
    from graphula_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sample_frames(df, every_n=2, fake=False).collect()
    by_media = {}
    for r in got:
        by_media.setdefault(r["media_id"], {})[r["frame_idx"]] = r["frame_digest"]
    assert sorted(by_media[1]) == [0, 2, 4]  # every 2nd of 5 frames
    assert sorted(by_media[2]) == [0]
    # content-addressed: frame 0 digests agree across the two videos
    assert by_media[1][0] == by_media[2][0]
    assert 3 not in by_media  # non-video payload yields no rows


def test_png_adam7_interlaced_roundtrip():
    """Adam7 decode: every pass is an independently filtered sub-image
    scattered on the pass grid; decoded output must equal the
    non-interlaced decode exactly, for odd dims and all color types."""
    import numpy as np

    from graphula_spark.operators.codecs import _ADAM7, decode_png, encode_png

    rng = np.random.default_rng(31)
    for shape in [(1, 1), (7, 5), (16, 16), (13, 21)]:
        for c in (None, 3, 4):
            img = rng.integers(
                0, 256, shape if c is None else (*shape, c), dtype=np.uint8
            )
            plain = decode_png(encode_png(img))
            inter = decode_png(encode_png(img, interlace=True))
            assert plain[:3] == inter[:3]
            assert np.array_equal(plain[3], inter[3])
    # the seven passes partition the pixel grid exactly
    seen = np.zeros((9, 13), dtype=int)
    for x0, y0, dx, dy in _ADAM7:
        seen[y0::dy, x0::dx] += 1
    assert (seen == 1).all()


class TestFfmpegGate:
    """The inter-frame codec seam: ffmpeg present -> real H.264 decode
    through the Y4M pipe; absent (this sandbox) -> one clean
    NotImplementedError, never a crash inside a worker."""

    def test_clean_error_without_ffmpeg(self, monkeypatch):
        from graphula_spark.operators import video as V

        monkeypatch.setattr(V, "ffmpeg_available", lambda: False)
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            V.decode_via_ffmpeg(b"\x00\x00\x00\x18ftypmp42")
        # the dispatcher routes unknown formats to the gate
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            V.decode_video(b"\x00\x00\x00\x18ftypmp42")

    def test_dispatcher_routes_native_formats(self):
        import numpy as np

        from graphula_spark.operators import video as V

        frames = [np.full((8, 8), v, dtype=np.uint8) for v in (0, 128, 255)]
        w, h, got = V.decode_video(V.encode_y4m(frames, chroma="mono"))
        assert (w, h, len(got)) == (8, 8, 3)
        assert all((a == b).all() for a, b in zip(got, frames))

    @pytest.mark.skipif(
        not __import__(
            "graphula_spark.operators.video", fromlist=["ffmpeg_available"]
        ).ffmpeg_available(),
        reason="ffmpeg not on PATH",
    )
    def test_h264_fixture_decodes_with_ffmpeg(self, tmp_path):
        """Where ffmpeg exists: synthesize an H.264 MP4 from Y4M frames
        with ffmpeg itself, then decode it through the gate and demand
        the right frame count and dimensions."""
        import subprocess

        import numpy as np

        from graphula_spark.operators import video as V

        frames = [
            np.full((32, 32), 40 * i, dtype=np.uint8) for i in range(5)
        ]
        y4m = tmp_path / "in.y4m"
        y4m.write_bytes(V.encode_y4m(frames, chroma="420"))
        mp4 = tmp_path / "out.mp4"
        subprocess.run(
            ["ffmpeg", "-v", "error", "-i", str(y4m), "-c:v", "libx264",
             "-pix_fmt", "yuv420p", "-y", str(mp4)],
            check=True,
        )
        w, h, c, luma = V.decode_via_ffmpeg(mp4.read_bytes())
        assert (w, h) == (32, 32)
        assert len(luma) == 5
