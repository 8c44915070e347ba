"""Baseline JPEG codec: spec invariants, round trips, edge cases.

No libjpeg exists in this environment to cross-check against, so the
tests pin the spec-mandated invariants separately from the round trip:
zig-zag order (against the canonical published sequence), DCT
orthonormality, Huffman Kraft equality and the 16-bit/no-all-ones JPEG
constraints, marker structure, and closed-form DC-only decode values.
"""

import numpy as np
import pytest

from graphula_spark.operators import jpeg as J


class TestInvariants:
    def test_zigzag_matches_canonical_sequence(self):
        # first 16 entries of the T.81 zig-zag sequence
        assert list(J._ZIGZAG[:16]) == [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        ]
        assert sorted(J._ZIGZAG) == list(range(64))

    def test_dct_is_orthonormal(self):
        assert np.allclose(J._DCT @ J._DCT.T, np.eye(8), atol=1e-12)

    def test_huffman_tables_are_jpeg_legal(self):
        rng = np.random.default_rng(7)
        freqs = {int(s): int(f) for s, f in enumerate(rng.integers(1, 500, 120))}
        bits, huffval, code_map = J._build_table(freqs)
        lengths = [ln for _, ln in code_map.values()]
        assert max(lengths) <= 16
        # Kraft strictly < 1: the all-ones code is reserved (T.81 K.2)
        kraft = sum(2.0 ** -ln for ln in lengths)
        assert kraft < 1.0
        for _sym, (code, ln) in code_map.items():
            assert code != (1 << ln) - 1  # no all-ones code
        # prefix-free
        codes = sorted((ln, code) for code, ln in code_map.values())
        for i, (ln_a, c_a) in enumerate(codes):
            for ln_b, c_b in codes[i + 1 :]:
                assert not (c_b >> (ln_b - ln_a)) == c_a or ln_a == ln_b

    def test_marker_structure(self):
        enc = J.encode_jpeg(np.full((8, 8), 77, dtype=np.uint8))
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        assert b"\xff\xc0" in enc and b"\xff\xc4" in enc
        assert b"\xff\xdb" in enc and b"\xff\xda" in enc


class TestRoundTrip:
    def test_flat_images_decode_closed_form(self):
        q_dc = int(J._scaled_quant(J._Q_LUMA, 90)[0, 0])
        assert q_dc == 3  # the constant inlined in the mm oracle
        for v in (0, 1, 64, 127, 128, 200, 255):
            img = np.full((13, 21), v, dtype=np.uint8)
            _w, _h, _c, out = J.decode_jpeg(J.encode_jpeg(img, 90))
            import math

            pred = min(
                255,
                max(
                    0,
                    math.floor(
                        math.floor(8 * (v - 128) / q_dc + 0.5) * q_dc / 8 + 128.5
                    ),
                ),
            )
            assert (out == pred).all()

    def test_gray_gradient_quality_sweep(self):
        x = np.linspace(0, 255, 64)
        img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
        last_err = None
        for q in (50, 75, 90, 100):
            w, h, c, out = J.decode_jpeg(J.encode_jpeg(img, q))
            assert (w, h, c) == (64, 64, 1)
            err = np.abs(out.astype(int) - img.astype(int)).mean()
            if last_err is not None:
                assert err <= last_err + 0.25  # quality must not hurt
            last_err = err
        assert last_err < 1.0  # q100 is near-lossless on smooth data

    def test_rgb_odd_dimensions(self):
        img = np.zeros((37, 53, 3), dtype=np.uint8)
        yy, xx = np.mgrid[0:37, 0:53]
        img[..., 0] = (yy * 4) % 256
        img[..., 1] = (xx * 3) % 256
        img[..., 2] = ((xx + yy) * 2) % 256
        w, h, c, out = J.decode_jpeg(J.encode_jpeg(img, 90))
        assert (w, h, c) == (53, 37, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 8

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_images_structurally_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        hh, ww = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        if seed % 2:
            img = rng.integers(0, 256, (hh, ww, 3), dtype=np.uint8)
        else:
            img = rng.integers(0, 256, (hh, ww), dtype=np.uint8)
        img = img.astype(np.uint8)
        w, h, _c, out = J.decode_jpeg(J.encode_jpeg(img, int(rng.integers(40, 101))))
        assert (w, h) == (ww, hh)
        assert out.shape == img.shape

    def test_1x1(self):
        one = np.array([[123]], dtype=np.uint8)
        w, h, _c, out = J.decode_jpeg(J.encode_jpeg(one, 90))
        assert (w, h) == (1, 1)
        assert abs(int(out[0, 0]) - 123) <= 2


class TestErrors:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            J.decode_jpeg(b"\x89PNG\r\n")

    def test_truncated_raises(self):
        enc = J.encode_jpeg(np.full((16, 16), 9, dtype=np.uint8))
        with pytest.raises(Exception):
            J.decode_jpeg(enc[:40])

    def test_truncation_anywhere_is_valueerror(self):
        """The documented contract is ValueError for malformed data —
        a cut at ANY byte offset (header, tables, or mid-entropy-stream)
        must never leak IndexError/struct.error."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        enc = J.encode_jpeg(img, 85, subsampling="4:2:0")
        for cut in range(2, len(enc) - 2, 97):
            with pytest.raises((ValueError, NotImplementedError)):
                J.decode_jpeg(enc[:cut])

    def test_unexpected_restart_marker_is_valueerror(self):
        """An RST marker at a non-restart position (no DRI declared)
        must surface as ValueError, not the internal _RestartMarker."""
        rng = np.random.default_rng(7)
        enc = J.encode_jpeg(
            rng.integers(0, 256, (32, 32), dtype=np.uint8), 95
        )
        sos = enc.index(b"\xff\xda")
        # entropy data starts after the 10-byte grayscale SOS segment;
        # splice an RST0 one byte in so the bit reader must cross it
        cut = sos + 11
        broken = enc[:cut] + b"\xff\xd0" + enc[cut:]
        with pytest.raises(ValueError):
            J.decode_jpeg(broken)

    def test_bad_pixel_shape(self):
        with pytest.raises(ValueError):
            J.encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))


class TestSubsampling:
    def test_420_roundtrip_smooth(self):
        yy, xx = np.mgrid[0:37, 0:53]
        img = np.zeros((37, 53, 3), dtype=np.uint8)
        img[..., 0] = (yy * 4) % 256
        img[..., 1] = (xx * 3) % 256
        img[..., 2] = ((xx + yy) * 2) % 256
        enc = J.encode_jpeg(img, 90, subsampling="4:2:0")
        w, h, c, out = J.decode_jpeg(enc)
        assert (w, h, c) == (53, 37, 3)
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 2.0 and err.max() <= 12

    def test_420_flat_exact(self):
        flat = np.full((13, 21, 3), 77, dtype=np.uint8)
        _w, _h, _c, out = J.decode_jpeg(
            J.encode_jpeg(flat, 90, subsampling="4:2:0")
        )
        assert (out == 77).all()

    def test_420_odd_dims_and_tiny(self):
        rng = np.random.default_rng(5)
        for hh, ww in [(1, 1), (7, 9), (16, 16), (17, 31)]:
            img = rng.integers(0, 256, (hh, ww, 3), dtype=np.uint8).astype(np.uint8)
            w, h, _c, out = J.decode_jpeg(
                J.encode_jpeg(img, 85, subsampling="4:2:0")
            )
            assert (w, h) == (ww, hh) and out.shape == img.shape

    def test_sof_declares_sampling_factors(self):
        img = np.full((16, 16, 3), 50, dtype=np.uint8)
        enc = J.encode_jpeg(img, 85, subsampling="4:2:0")
        sof = enc.index(b"\xff\xc0")
        # first component (Y) samp byte = 0x22
        assert enc[sof + 2 + 2 + 6 + 1] == 0x22

    def test_unknown_subsampling_rejected(self):
        with pytest.raises(ValueError):
            J.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), 85, subsampling="4:1:1")


class TestProgressive:
    """SOF2 progressive (T.81 Annex G): the scan-scripted encoder and
    the spectral-selection/successive-approximation decoder must agree
    with the baseline codec BIT-EXACTLY — both paths reconstruct from
    identical quantized coefficients, so any decode difference is a
    coding bug, not rounding."""

    def _roundtrip_equal(self, img, sub="4:4:4"):
        base = J.decode_jpeg(J.encode_jpeg(img, 85, subsampling=sub))
        prog = J.decode_jpeg(
            J.encode_jpeg(img, 85, subsampling=sub, progressive=True)
        )
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3])

    def test_gray_matches_baseline(self):
        rng = np.random.default_rng(11)
        self._roundtrip_equal(rng.integers(0, 256, (32, 32), dtype=np.uint8))

    def test_gray_odd_dims(self):
        rng = np.random.default_rng(12)
        self._roundtrip_equal(rng.integers(0, 256, (37, 41), dtype=np.uint8))

    def test_rgb_444(self):
        rng = np.random.default_rng(13)
        self._roundtrip_equal(rng.integers(0, 256, (24, 24, 3), dtype=np.uint8))

    def test_rgb_420_odd_dims(self):
        """4:2:0 with non-MCU-aligned dims: AC scans cover only the
        component's real block grid (T.81 A.2.2), not the MCU padding —
        the case where interleaved and non-interleaved orders differ."""
        rng = np.random.default_rng(14)
        self._roundtrip_equal(
            rng.integers(0, 256, (37, 41, 3), dtype=np.uint8), "4:2:0"
        )

    def test_flat_image_eob_runs(self):
        """A flat image maximizes cross-block EOB runs (every AC block
        is empty) — exercises the EOBn length coding on both sides."""
        self._roundtrip_equal(np.full((48, 48), 100, dtype=np.uint8))

    def test_tiny(self):
        rng = np.random.default_rng(15)
        self._roundtrip_equal(
            rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), "4:2:0"
        )

    def test_sof2_marker_present(self):
        enc = J.encode_jpeg(
            np.zeros((16, 16), dtype=np.uint8), progressive=True
        )
        assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc

    def test_progressive_truncation_is_valueerror(self):
        rng = np.random.default_rng(16)
        enc = J.encode_jpeg(
            rng.integers(0, 256, (24, 24), dtype=np.uint8), progressive=True
        )
        for cut in range(2, len(enc) - 2, 53):
            with pytest.raises((ValueError, NotImplementedError)):
                J.decode_jpeg(enc[:cut])
