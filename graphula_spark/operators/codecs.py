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


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal real PNG encoder: 8-bit grayscale or RGB(A), filter 0
    rows, one zlib-compressed IDAT. Round-trips through any standards-
    compliant decoder (including `decode_png`)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        color_type = 0
        raw_rows = arr.reshape(h, w)
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        h, w, c = arr.shape
        color_type = 2 if c == 3 else 6
        raw_rows = arr.reshape(h, w * c)
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + raw_rows[y].tobytes() for y in range(h))
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


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real PNG decode: chunk parse, zlib inflate, undo row filters
    0-4 (None/Sub/Up/Average/Paeth). Supports 8-bit gray/gray+alpha/
    RGB/RGBA, non-interlaced — the common case; anything else raises.

    Returns (width, height, channels, pixels[h, w*channels] uint8).
    """
    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIG)
    width = height = None
    channels = 0
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
            if interlace:
                raise NotImplementedError("interlaced PNG")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("bad IDAT length")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(height):
        row_start = y * (stride + 1)
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
    return width, height, channels, out


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
