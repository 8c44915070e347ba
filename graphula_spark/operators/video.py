"""Video codecs in stdlib + numpy: YUV4MPEG2 (y4m) and MJPEG-in-AVI.

The reference has no media handling at all; this closes the one
remaining stubbed multimodal family (SURVEY §8.3) with the two video
formats that are honestly decodable without ffmpeg:

- **Y4M** (YUV4MPEG2): a text header + uncompressed planar frames —
  the interchange format every ffmpeg pipeline can emit
  (`ffmpeg -i x.mp4 out.y4m`). Cmono / C444 / C420 chroma modes.
- **MJPEG in AVI**: a RIFF container whose video chunks are plain
  JPEG payloads — decoded by the in-repo T.81 codec
  (operators/jpeg.py), so both baseline and progressive frames work.

Like the image/audio codecs these are per-payload Python for
Arrow-batched `mapInPandas` workers: bytes in, frame arrays out.
H.264 and other entropy-coded inter-frame codecs still need ffmpeg
and remain out of scope (swap the decoder behind the same
mapInPandas contract when it is available).
"""

from __future__ import annotations

import struct

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2 "


# ---------------------------------------------------------------------
# YUV4MPEG2
# ---------------------------------------------------------------------


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), chroma: str = "mono"
) -> bytes:
    """Y4M bytes for a (n_frames, h, w) uint8 luma array (``chroma=
    'mono'``) or (n, h, w, 3) RGB array (``'444'`` / ``'420'`` —
    converted to BT.601 full-range YCbCr like the JPEG encoder)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if chroma == "mono":
        if arr.ndim != 3:
            raise ValueError("mono y4m needs (n, h, w) frames")
        n, h, w = arr.shape
        planes = [[f] for f in arr]
        ctag = "Cmono"
    elif chroma in ("444", "420"):
        if arr.ndim != 4 or arr.shape[3] != 3:
            raise ValueError("color y4m needs (n, h, w, 3) frames")
        n, h, w = arr.shape[:3]
        if chroma == "420" and (h % 2 or w % 2):
            raise ValueError("C420 needs even frame dimensions")
        planes = []
        for f in arr:
            r = f[..., 0].astype(np.float64)
            g = f[..., 1].astype(np.float64)
            b = f[..., 2].astype(np.float64)
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
            if chroma == "420":
                cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
                cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            clip = lambda p: np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)
            planes.append([clip(y), clip(cb), clip(cr)])
        ctag = "C444" if chroma == "444" else "C420"
    else:
        raise ValueError(f"unsupported chroma mode {chroma!r}")
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {ctag}\n".encode()
    )
    for fplanes in planes:
        out += b"FRAME\n"
        for p in fplanes:
            out += p.tobytes()
    return bytes(out)


def decode_y4m(payload: bytes) -> tuple[int, int, str, np.ndarray]:
    """Decode Y4M → (width, height, chroma_tag, luma_frames) with
    luma_frames a (n, h, w) uint8 array. Chroma planes are parsed and
    size-validated (Cmono/C444/C420 family); luma carries the signal
    features the pipeline extracts. Raises ValueError on malformed
    data."""
    if not payload.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated y4m header")
    w = h = None
    ctag = "C420"  # the spec default when no C tag is present
    for tok in payload[len(Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"C":
            ctag = "C" + val.decode("ascii")
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if ctag == "Cmono":
        chroma_bytes = 0
    elif ctag.startswith("C444"):
        chroma_bytes = 2 * w * h
    elif ctag.startswith("C420"):
        if w % 2 or h % 2:
            raise ValueError("C420 with odd dimensions")
        chroma_bytes = (w * h) // 2
    else:
        raise ValueError(f"unsupported y4m chroma {ctag}")
    frame_bytes = w * h + chroma_bytes
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed y4m FRAME header")
        pos = fnl + 1
        if pos + frame_bytes > len(payload):
            raise ValueError("truncated y4m frame data")
        luma = np.frombuffer(
            payload[pos : pos + w * h], dtype=np.uint8
        ).reshape(h, w)
        frames.append(luma)
        pos += frame_bytes
    if not frames:
        raise ValueError("y4m stream with no frames")
    return w, h, ctag, np.stack(frames)


# ---------------------------------------------------------------------
# MJPEG in AVI (RIFF)
# ---------------------------------------------------------------------


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(kind: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", kind + data)


def encode_mjpeg_avi(
    frames: np.ndarray, fps: int = 25, quality: int = 85
) -> bytes:
    """Minimal AVI (RIFF) muxer around per-frame JPEGs: avih + one
    'vids'/'MJPG' stream + movi '00dc' chunks + idx1. Frames are a
    (n, h, w) grayscale or (n, h, w, 3) RGB uint8 array."""
    from graphula_spark.operators.jpeg import encode_jpeg

    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim not in (3, 4):
        raise ValueError("frames must be (n, h, w) or (n, h, w, 3)")
    n, h, w = arr.shape[:3]
    jpegs = [encode_jpeg(f, quality) for f in arr]
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_sz * fps,      # max bytes/sec estimate
        0,                 # padding granularity
        0x10,              # AVIF_HASINDEX
        n, 0, 1, max_sz,   # total frames, initial, streams, buf size
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n, max_sz, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    bpp = 24
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, bpp, b"MJPG", w * h * bpp // 8,
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_items = [_chunk(b"00dc", j) for j in jpegs]
    movi = _list(b"movi", b"".join(movi_items))
    idx = bytearray()
    off = 4  # offsets relative to the 'movi' fourcc
    for item, j in zip(movi_items, jpegs):
        idx += b"00dc" + struct.pack("<3I", 0x10, off, len(j))
        off += len(item)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def decode_mjpeg_avi(payload: bytes):
    """Decode an MJPEG AVI → (width, height, frames) with frames a
    list of decoded pixel arrays (grayscale (h, w) or RGB (h, w, 3),
    per the in-repo JPEG decoder). Walks the RIFF tree for '00dc'/
    '00db' video chunks; raises ValueError on malformed containers."""
    from graphula_spark.operators.jpeg import decode_jpeg

    if not is_avi(payload):
        raise ValueError("not an AVI payload")
    declared = struct.unpack("<I", payload[4:8])[0]
    if declared + 8 > len(payload):
        raise ValueError("truncated AVI payload")

    w = h = None
    frames = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            data_start = pos + 8
            data_end = data_start + size
            if data_end > end:
                raise ValueError("AVI chunk overruns container")
            if fourcc == b"LIST":
                walk(data_start + 4, data_end)
            elif fourcc == b"avih":
                w, h = struct.unpack(
                    "<II", payload[data_start + 32 : data_start + 40]
                )
            elif fourcc in (b"00dc", b"00db"):
                frames.append(
                    decode_jpeg(payload[data_start:data_end])
                )
            pos = data_end + (size % 2)

    walk(12, 8 + declared)
    if w is None or not frames:
        raise ValueError("AVI without avih header or video frames")
    return w, h, [px for (_w, _h, _c, px) in frames]


# ---------------------------------------------------------------------
# ffmpeg-gated route for inter-frame codecs (H.264 / VP9 / AV1 / ...)
# ---------------------------------------------------------------------


def ffmpeg_available() -> bool:
    import shutil

    return shutil.which("ffmpeg") is not None


def decode_via_ffmpeg(payload: bytes, timeout: float = 120.0):
    """Decode ANY ffmpeg-supported container/codec by transcoding to
    YUV4MPEG2 through an `ffmpeg` subprocess and feeding the in-repo
    Y4M decoder — the seam the module docstring promised: the
    mapInPandas contract (bytes in, frame arrays out) is unchanged,
    only the per-payload decode swaps.

    Returns ``(width, height, chroma, luma_frames)`` like
    ``decode_y4m``. Raises ``NotImplementedError`` when ffmpeg is not
    on PATH (this sandbox), ``ValueError`` when ffmpeg rejects the
    payload. Temp files rather than pipes: MP4-family containers put
    the moov atom at the end, which a non-seekable stdin cannot serve.
    """
    import os
    import subprocess
    import tempfile

    if not ffmpeg_available():
        raise NotImplementedError(
            "inter-frame video decode needs the ffmpeg binary on PATH "
            "(Y4M and MJPEG-AVI decode natively; see decode_y4m / "
            "decode_mjpeg_avi)"
        )
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.bin")
        dst = os.path.join(td, "out.y4m")
        with open(src, "wb") as fh:
            fh.write(payload)
        proc = subprocess.run(
            [
                "ffmpeg", "-v", "error", "-nostdin", "-i", src,
                "-f", "yuv4mpegpipe", "-pix_fmt", "yuv420p", "-y", dst,
            ],
            capture_output=True,
            timeout=timeout,
        )
        if proc.returncode != 0:
            raise ValueError(
                f"ffmpeg failed: {proc.stderr.decode(errors='replace')[:500]}"
            )
        with open(dst, "rb") as fh:
            return decode_y4m(fh.read())


def decode_video(payload: bytes):
    """Route a video payload to the right decoder: Y4M and MJPEG-AVI
    natively, anything else through the ffmpeg gate. Returns
    ``(width, height, frames)`` with frames a list of luma/pixel
    arrays."""
    if payload.startswith(Y4M_MAGIC):
        w, h, _c, luma = decode_y4m(payload)
        return w, h, list(luma)
    if is_avi(payload):
        return decode_mjpeg_avi(payload)
    w, h, _c, luma = decode_via_ffmpeg(payload)
    return w, h, list(luma)
