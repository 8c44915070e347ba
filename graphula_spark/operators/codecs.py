"""Real media codecs from the standard library.

PIL/ffmpeg are not installable here, but PNG and PCM WAV are fully
decodable with stdlib `zlib` + `struct` + numpy — so the multimodal
decode step can be REAL for these formats (parse → decompress →
unfilter → pixel/sample arrays), not a digest-derived stub. Baseline
JPEG is implemented from the spec in `operators/jpeg.py`; formats
beyond these (H.264, ...) still raise NotImplementedError until real
codec libraries are present; `operators/multimodal.py` routes by
magic bytes.

Everything here is per-payload Python intended to run inside
Arrow-batched `mapInPandas` workers — the Spark-side contract is
bytes-in, small-struct-out, so the same plumbing carries a PIL/ffmpeg
decoder when available.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> channels


#: Adam7 pass geometry: (x_start, y_start, x_step, y_step) — PNG spec
#: §8.2 (derived from the published pass pattern, not transcribed code)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal real PNG encoder: 8-bit grayscale or RGB(A), filter 0
    rows, one zlib-compressed IDAT. ``interlace=True`` writes Adam7
    (seven filtered sub-images). Round-trips through any standards-
    compliant decoder (including `decode_png`)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        color_type = 0
        img = arr.reshape(h, w, 1)
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        h, w, c = arr.shape
        color_type = 2 if c == 3 else 6
        img = arr
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0
    )
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass contributes no bytes at all
            rows = sub.reshape(sub.shape[0], -1)
            parts.append(
                b"".join(b"\x00" + rows[y].tobytes() for y in range(len(rows)))
            )
        raw = b"".join(parts)
    else:
        rows = img.reshape(h, -1)
        raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(
    raw: bytes, offset: int, height: int, stride: int, bpp: int
) -> tuple[np.ndarray, int]:
    """Undo PNG row filters 0-4 for one (sub-)image of `height` rows of
    `stride` bytes starting at `offset`; returns (pixels, new offset)."""
    if offset + height * (stride + 1) > len(raw):
        raise ValueError("truncated PNG image data")
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        row_start = offset + y * (stride + 1)
        ftype = raw[row_start]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(int(left), int(up), int(ul))
                cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out, offset + height * (stride + 1)


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real PNG decode: chunk parse, zlib inflate, undo row filters
    0-4 (None/Sub/Up/Average/Paeth). Supports 8-bit gray/gray+alpha/
    RGB/RGBA, both non-interlaced and Adam7-interlaced (each of the
    seven passes is an independently filtered sub-image scattered back
    on the pass grid, PNG spec §8.2); other bit depths raise.

    Returns (width, height, channels, pixels[h, w*channels] uint8).
    """
    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIG)
    width = height = None
    channels = 0
    interlace = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8:
                raise NotImplementedError(f"bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise NotImplementedError(f"color type {color_type}")
            if interlace not in (0, 1):
                raise ValueError(f"bad interlace method {interlace}")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = channels  # bytes per pixel at bit depth 8
    if not interlace:
        stride = width * channels
        if len(raw) != height * (stride + 1):
            raise ValueError("bad IDAT length")
        out, _ = _unfilter(raw, 0, height, stride, bpp)
        return width, height, channels, out
    img = np.zeros((height, width, channels), dtype=np.uint8)
    offset = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = -(-(width - x0) // dx) if width > x0 else 0
        ph = -(-(height - y0) // dy) if height > y0 else 0
        if pw == 0 or ph == 0:
            continue
        sub, offset = _unfilter(raw, offset, ph, pw * channels, bpp)
        img[y0::dy, x0::dx] = sub.reshape(ph, pw, channels)
    if offset != len(raw):
        raise ValueError("bad IDAT length")
    return width, height, channels, img.reshape(height, width * channels)


def resize_nearest(
    pixels: np.ndarray, channels: int, new_w: int, new_h: int
) -> np.ndarray:
    """Nearest-neighbor resize over the decoded [h, w*channels] array —
    a real image transform with no codec dependency."""
    h, stride = pixels.shape
    w = stride // channels
    img = pixels.reshape(h, w, channels)
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return img[ys][:, xs].reshape(new_h, new_w * channels)


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """Minimal real RIFF/WAVE encoder for 16-bit PCM."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        n_channels,
        sample_rate,
        byte_rate,
        n_channels * 2,
        16,
        b"data",
        len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real RIFF/WAVE decode for 16-bit PCM: chunk walk (handles extra
    chunks like LIST), returns (sample_rate, n_channels,
    samples[int16] interleaved)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    sample_rate = n_channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt, n_channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt != 1 or bits != 16:
                raise NotImplementedError(f"WAV fmt={fmt} bits={bits}")
        elif tag == b"data":
            data = body
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, n_channels, np.frombuffer(data, dtype="<i2")


def audio_features(payload: bytes) -> dict:
    """Decode + real signal features: duration, peak amplitude, and
    zero-crossing count (sign changes between consecutive samples)."""
    rate, n_ch, samples = decode_wav(payload)
    mono = samples[::n_ch].astype(np.int32)  # first channel
    signs = np.sign(mono)
    nz = signs != 0
    crossings = int(np.count_nonzero(np.diff(signs[nz]) != 0)) if nz.any() else 0
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "n_samples": int(len(samples) // max(n_ch, 1)),
        "max_amp": int(np.abs(mono).max()) if len(mono) else 0,
        "n_zero_cross": crossings,
    }
