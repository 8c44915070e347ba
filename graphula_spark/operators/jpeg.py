"""Baseline JPEG (ITU-T.81 sequential DCT) codec in stdlib + numpy.

No PIL/libjpeg in this environment, so the multimodal pipeline's JPEG
route is implemented from the spec: real marker parsing, real Huffman
entropy coding, real DCT/quantization. Scope (the baseline common
case, explicit errors otherwise):

- encoder: 8-bit grayscale or RGB (YCbCr, 4:4:4 or 4:2:0 chroma
  subsampling), quality-scaled quantization tables, per-image OPTIMAL
  Huffman tables built with package-merge and transmitted in DHT (what
  `cjpeg -optimize` does — so no reliance on transcribing Annex K's
  162-entry AC tables); ``progressive=True`` emits SOF2 with a
  cjpeg-style scan script (Annex G spectral selection + successive
  approximation);
- decoder: baseline sequential AND progressive (SOF0/SOF2), grayscale
  or color with sampling factors 1..2 in each axis (4:4:4, 4:2:0,
  4:2:2, 4:4:0 — the layouts real-world JPEGs use), restart markers
  honored, EOB runs / refinement scans per Annex G.

Like the PNG/WAV codecs this is per-payload Python meant for
Arrow-batched `mapInPandas` workers: bytes in, arrays out.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------
# shared constants / helpers
# ---------------------------------------------------------------------


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis M: coefficients = M @ block @ M.T."""
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m *= np.sqrt(2 / 8)
    m[0, :] = np.sqrt(1 / 8)
    return m


_DCT = _dct_matrix()


def _zigzag_order() -> np.ndarray:
    """Positions (r, c) in zig-zag scan order, derived programmatically
    (up-right / down-left diagonal walk) rather than transcribed."""
    order = []
    r = c = 0
    for _ in range(64):
        order.append((r, c))
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return np.array([r * 8 + c for r, c in order])


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K reference quantization tables (quality 50 base). These ride
# in DQT, so interoperability does not depend on them being canonical.
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _magnitude_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------
# Huffman: per-image optimal tables (package-merge, <=16 bits)
# ---------------------------------------------------------------------


def _package_merge_lengths(freqs: dict[int, int], max_len: int = 16) -> dict[int, int]:
    """Code length per symbol, length-limited (Larmore-Hirschberg).

    A sentinel symbol with frequency 1 is NOT added here — callers add
    one so the all-ones code stays unused (JPEG forbids it)."""
    syms = [(f, s) for s, f in freqs.items() if f > 0]
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0][1]: 1}
    coins = sorted((f, (s,)) for f, s in syms)
    packages: list[tuple[int, tuple]] = []
    # max_len - 1 packaging rounds: the final merged list is the
    # max_len-th level, so membership counts (= code lengths) cannot
    # exceed max_len. One extra round yields length max_len + 1 codes
    # (caught by a review stress test at 170/400 random alphabets).
    for _ in range(max_len - 1):
        merged = sorted(packages + coins)
        packages = [
            (
                merged[2 * i][0] + merged[2 * i + 1][0],
                merged[2 * i][1] + merged[2 * i + 1][1],
            )
            for i in range(len(merged) // 2)
        ]
    lengths: dict[int, int] = {s: 0 for _, s in syms}
    # standard package-merge accounting: after max_len rounds the first
    # (2n - 2) items of the FINAL merged list, counted by symbol
    # membership, give each symbol's code length
    final = sorted(packages + coins)[: 2 * len(syms) - 2]
    for _, bundle in final:
        for s in bundle:
            lengths[s] += 1
    return lengths


def _canonical_table(lengths: dict[int, int]):
    """(bits[17], huffval, code_map) — canonical JPEG code assignment:
    shorter codes first, ties by symbol value (the DHT convention)."""
    bits = [0] * 17
    ordered = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    huffval = [s for s, _ in ordered]
    for _, ln in ordered:
        bits[ln] += 1
    code_map: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for s, ln in ordered:
        code <<= ln - prev_len
        code_map[s] = (code, ln)
        code += 1
        prev_len = ln
    return bits, huffval, code_map


def _build_table(freqs: dict[int, int]):
    """Optimal JPEG Huffman table for observed symbol frequencies. The
    reserved pseudo-symbol 256 (freq 1) guarantees the all-ones code is
    never assigned to a real symbol (T.81 K.2 discipline)."""
    f = dict(freqs)
    f[256] = 1
    lengths = _package_merge_lengths(f)
    # package-merge breaks frequency ties arbitrarily; reassign the
    # computed length MULTISET monotonically (rarer symbol -> longer
    # code, pseudo-symbol strictly last) so 256 is guaranteed the
    # longest code and can be dropped without shifting earlier codes
    syms_sorted = sorted(f, key=lambda s: (s == 256, -f[s], s))
    lens_sorted = sorted(lengths.values())
    lengths = dict(zip(syms_sorted, lens_sorted))
    bits, huffval, code_map = _canonical_table(lengths)
    # drop the pseudo-symbol: it owns the lexicographically last code
    if 256 in code_map:
        ln = lengths[256]
        bits[ln] -= 1
        huffval = [v for v in huffval if v != 256]
        del code_map[256]
    return bits, huffval, code_map


# ---------------------------------------------------------------------
# bit IO with 0xFF byte stuffing
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos + 1 >= len(self.data):
            # +1: a 0xFF data byte always needs its follow-up byte
            raise ValueError("truncated scan data")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop the partial byte and consume the next RST marker,
        stepping over stuffed FF 00 data bytes and FF fill bytes
        (T.81 B.1.1.2) instead of mistaking them for the marker."""
        self.nbits = 0
        n = len(self.data)
        while True:
            while self.pos < n and self.data[self.pos] != 0xFF:
                self.pos += 1
            if self.pos + 1 >= n:
                raise ValueError("truncated scan data")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed entropy byte, not a marker
                self.pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                self.pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:
                self.pos += 2
                return
            raise ValueError(f"expected restart marker, found 0xFF{nxt:02X}")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _receive_extend(r: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = r.read_bits(size)
    if v < (1 << (size - 1)):  # negative branch (one's complement)
        v -= (1 << size) - 1
    return v


# ---------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(n_blocks_v, n_blocks_h, 8, 8) view of an edge-replicated plane."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def _forward_component(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantized zig-zag coefficients (n_blocks, 64) for one component."""
    blocks = _blocks_of(plane.astype(np.float64) - 128.0)
    coeffs = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
    # floor(x + 0.5) (half-up) instead of np.round: banker's rounding
    # is not expressible in portable SQL, and the mm oracle predicts
    # flat-image decode output in closed form
    quant = np.floor(coeffs / q + 0.5).astype(np.int32)
    n = quant.shape[0] * quant.shape[1]
    return quant.reshape(n, 64)[:, _ZIGZAG]


def _component_symbols(zz: np.ndarray):
    """Per-block (dc_symbol, dc_value, [(ac_symbol, ac_value), ...])
    streams plus symbol frequency tallies."""
    dc_freq: dict[int, int] = {}
    ac_freq: dict[int, int] = {}
    blocks = []
    prev_dc = 0
    for row in zz:
        dc_diff = int(row[0]) - prev_dc
        prev_dc = int(row[0])
        dsize = _magnitude_category(dc_diff)
        dc_freq[dsize] = dc_freq.get(dsize, 0) + 1
        acs = []
        run = 0
        for k in range(1, 64):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0))
                ac_freq[0xF0] = ac_freq.get(0xF0, 0) + 1
                run -= 16
            size = _magnitude_category(v)
            sym = (run << 4) | size
            acs.append((sym, v))
            ac_freq[sym] = ac_freq.get(sym, 0) + 1
            run = 0
        if run:
            acs.append((0x00, 0))
            ac_freq[0x00] = ac_freq.get(0x00, 0) + 1
        blocks.append((dsize, dc_diff, acs))
    return blocks, dc_freq, ac_freq


def _dht_segment(cls: int, dest: int, bits, huffval) -> bytes:
    body = bytes([(cls << 4) | dest]) + bytes(bits[1:17]) + bytes(huffval)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(dest: int, q: np.ndarray) -> bytes:
    body = bytes([dest]) + bytes(int(v) for v in q.reshape(64)[_ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:4:4",
    progressive: bool = False,
) -> bytes:
    """JPEG bytes for an 8-bit grayscale (h, w) or RGB (h, w, 3)
    array. YCbCr with 4:4:4 (default) or 4:2:0 chroma subsampling
    (2x2-mean downsampled chroma — the layout nearly all real-world
    JPEGs use); optimal Huffman tables in DHT. ``progressive=True``
    emits SOF2 with a libjpeg-style scan script (interleaved DC first,
    spectral-selection AC bands with successive approximation, then
    refinement scans)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
        factors = [(1, 1)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[..., 0].astype(np.float64)
        g = arr[..., 1].astype(np.float64)
        b = arr[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = np.clip(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0, 0, 255)
        cr = np.clip(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0, 0, 255)
        planes = [y, cb, cr]
        if subsampling == "4:4:4":
            factors = [(1, 1)] * 3
        elif subsampling == "4:2:0":
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling}")
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")
    h, w = planes[0].shape
    ncomp = len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    # pad the full-res planes to whole MCUs (edge replication), THEN
    # downsample chroma — dims stay exact multiples of 8 everywhere
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    ph, pw = -h % mcu_h, -w % mcu_w
    if ph or pw:
        planes = [np.pad(pl, ((0, ph), (0, pw)), mode="edge") for pl in planes]
    H, W = planes[0].shape
    comp_planes = []
    for pl, (hi, vi) in zip(planes, factors):
        sy, sx = vmax // vi, hmax // hi
        if sy > 1 or sx > 1:
            pl = pl.reshape(H // sy, sy, W // sx, sx).mean(axis=(1, 3))
        comp_planes.append(pl)

    q_tables = [_scaled_quant(_Q_LUMA, quality)]
    if ncomp == 3:
        q_tables.append(_scaled_quant(_Q_CHROMA, quality))

    n_mcu_v, n_mcu_h = H // mcu_h, W // mcu_w

    if progressive:
        zzs = [
            _forward_component(pl, q_tables[min(i, len(q_tables) - 1)])
            for i, pl in enumerate(comp_planes)
        ]
        out = bytearray(b"\xff\xd8")
        out += (
            b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00"
        )
        for i, q in enumerate(q_tables):
            out += _dqt_segment(i, q)
        sof = struct.pack(">BHHB", 8, h, w, ncomp)
        for i in range(ncomp):
            hi, vi = factors[i]
            sof += bytes([i + 1, (hi << 4) | vi, min(i, len(q_tables) - 1)])
        out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
        _encode_progressive_scans(
            out, zzs, factors, h, w, n_mcu_v, n_mcu_h
        )
        out += b"\xff\xd9"
        return bytes(out)

    streams, dc_freqs, ac_freqs = [], [{}, {}], [{}, {}]
    for i, (pl, (hi, vi)) in enumerate(zip(comp_planes, factors)):
        zz = _forward_component(pl, q_tables[min(i, len(q_tables) - 1)])
        nbv, nbh = pl.shape[0] // 8, pl.shape[1] // 8
        # reorder raster blocks into MCU emission order (DC DPCM runs
        # in this order per T.81 interleaving)
        order = [
            (my * vi + r) * nbh + (mx * hi + c)
            for my in range(n_mcu_v)
            for mx in range(n_mcu_h)
            for r in range(vi)
            for c in range(hi)
        ]
        t = min(i, 1)  # table 0 = luma, table 1 = both chromas
        blocks, dcf, acf = _component_symbols(zz[np.array(order)])
        streams.append(blocks)
        for s, n in dcf.items():
            dc_freqs[t][s] = dc_freqs[t].get(s, 0) + n
        for s, n in acf.items():
            ac_freqs[t][s] = ac_freqs[t].get(s, 0) + n

    ntab = 1 if ncomp == 1 else 2
    dc_tabs = [_build_table(dc_freqs[t]) for t in range(ntab)]
    ac_tabs = [_build_table(ac_freqs[t]) for t in range(ntab)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for i, q in enumerate(q_tables):
        out += _dqt_segment(i, q)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        hi, vi = factors[i]
        sof += bytes([i + 1, (hi << 4) | vi, min(i, len(q_tables) - 1)])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for t in range(ntab):
        out += _dht_segment(0, t, dc_tabs[t][0], dc_tabs[t][1])
        out += _dht_segment(1, t, ac_tabs[t][0], ac_tabs[t][1])
    sos = bytes([ncomp])
    for i in range(ncomp):
        t = min(i, 1)
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # interleaved MCU scan: per MCU each component contributes
    # hi*vi blocks, consumed sequentially from its emission-ordered
    # symbol stream
    wbits = _BitWriter()
    ptr = [0] * ncomp
    for _m in range(n_mcu_v * n_mcu_h):
        for i in range(ncomp):
            t = min(i, 1)
            hi, vi = factors[i]
            for _ in range(hi * vi):
                dsize, dc_diff, acs = streams[i][ptr[i]]
                ptr[i] += 1
                code, ln = dc_tabs[t][2][dsize]
                wbits.write(code, ln)
                if dsize:
                    v = dc_diff if dc_diff >= 0 else dc_diff + (1 << dsize) - 1
                    wbits.write(v, dsize)
                for sym, val in acs:
                    code, ln = ac_tabs[t][2][sym]
                    wbits.write(code, ln)
                    size = sym & 0x0F
                    if size:
                        v = val if val >= 0 else val + (1 << size) - 1
                        wbits.write(v, size)
    out += wbits.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------
# progressive encoding (T.81 Annex G) — scan-scripted like cjpeg
# ---------------------------------------------------------------------


class _ScanEmitter:
    """Two-pass scan emission: a tally pass collects Huffman symbol
    frequencies, then (with ``table``/``writer`` set) a write pass
    emits codes + raw bits. The scan logic runs identically in both
    passes, so the optimal per-scan table always matches the stream."""

    def __init__(self):
        self.freq: dict[int, int] = {}
        self.table = None
        self.writer = None

    def sym(self, s: int) -> None:
        if self.writer is None:
            self.freq[s] = self.freq.get(s, 0) + 1
        else:
            code, ln = self.table[s]
            self.writer.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if self.writer is not None and n:
            self.writer.write(v, n)


def _mcu_order(factors, n_mcu_v, n_mcu_h):
    """(component, block-index) sequence in interleaved MCU order."""
    for my in range(n_mcu_v):
        for mx in range(n_mcu_h):
            for i, (hi, vi) in enumerate(factors):
                nbh = n_mcu_h * hi
                for br in range(vi):
                    for bc in range(hi):
                        yield i, (my * vi + br) * nbh + (mx * hi + bc)


def _raster_order(factors, i, fh, fw, hmax, vmax, n_mcu_h):
    """Block indices of component i in non-interleaved raster order
    (actual sampled dims, skipping MCU-padding blocks)."""
    hi, vi = factors[i]
    bh, bw = _comp_block_dims(fh, fw, hi, vi, hmax, vmax)
    nbh = n_mcu_h * hi
    for by in range(bh):
        for bx in range(bw):
            yield by * nbh + bx


def _emit_dc_first(em, zzs, factors, blocks, al):
    pred = [0] * len(zzs)
    for i, bi in blocks:
        v = int(zzs[i][bi][0]) >> al  # DC point transform: arith shift
        diff = v - pred[i]
        pred[i] = v
        s = _magnitude_category(diff)
        em.sym(s)
        if s:
            em.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _emit_dc_refine(em, zzs, blocks, al):
    for i, bi in blocks:
        em.bits((int(zzs[i][bi][0]) >> al) & 1, 1)


def _emit_ac_first(em, zz, blocks, ss, se, al):
    """AC first pass: per-coefficient point transform is magnitude
    shift (truncate toward zero, T.81 G.1.1.1.1); all-zero block tails
    fold into cross-block EOB runs."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            em.sym(nbits << 4)
            em.bits(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for bi in blocks:
        blk = zz[bi]
        run = 0
        for k in range(ss, se + 1):
            c = int(blk[k])
            v = (c >> al) if c >= 0 else -((-c) >> al)
            if v == 0:
                run += 1
                continue
            flush_eob()
            while run > 15:
                em.sym(0xF0)
                run -= 16
            s = _magnitude_category(v)
            em.sym((run << 4) | s)
            em.bits(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _emit_ac_refine(em, zz, blocks, ss, se, al):
    """AC refinement pass (mirrors the T.81 G.1.2.3 discipline):
    newly-nonzero coefficients emit (run,1)+sign; already-nonzero
    coefficients crossed on the way buffer one correction bit each,
    released after the next symbol/EOB; trailing content folds into
    cross-block EOB runs."""
    eobrun = 0
    pending: list[int] = []  # correction bits awaiting the next symbol

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            em.sym(nbits << 4)
            em.bits(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
        for b in pending:
            em.bits(b, 1)
        pending.clear()

    for bi in blocks:
        blk = zz[bi]
        absv = []
        eob = ss - 1  # last newly-nonzero position
        for k in range(ss, se + 1):
            c = int(blk[k])
            t = (c >> al) if c >= 0 else (-c) >> al
            absv.append(t)
            if t == 1:
                eob = k
        run = 0
        br: list[int] = []  # correction bits inside this block
        for k in range(ss, se + 1):
            t = absv[k - ss]
            if t == 0:
                run += 1
                continue
            while run > 15 and k <= eob:
                flush_eob()
                em.sym(0xF0)
                run -= 16
                for b in br:
                    em.bits(b, 1)
                br = []
            if t > 1:  # already nonzero: one correction bit
                br.append(t & 1)
                continue
            flush_eob()
            em.sym((run << 4) | 1)
            em.bits(0 if int(blk[k]) < 0 else 1, 1)
            for b in br:
                em.bits(b, 1)
            br = []
            run = 0
        if run or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF or len(pending) > 900:
                flush_eob()
    flush_eob()


def _encode_progressive_scans(out, zzs, factors, fh, fw, n_mcu_v, n_mcu_h):
    """Append DHT+SOS segments for a cjpeg-style progressive script:
    DC first (Al=1) → AC bands (spectral selection + first successive
    approximation) → DC refine → AC refinements down to Al=0."""
    ncomp = len(zzs)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)

    def dc_blocks():
        if ncomp > 1:
            return list(_mcu_order(factors, n_mcu_v, n_mcu_h))
        return [
            (0, bi)
            for bi in _raster_order(factors, 0, fh, fw, hmax, vmax, n_mcu_h)
        ]

    # scan tuples: (kind, comp, ss, se, ah, al)
    if ncomp == 1:
        script = [
            ("dc_first", None, 0, 0, 0, 1),
            ("ac_first", 0, 1, 5, 0, 2),
            ("ac_first", 0, 6, 63, 0, 2),
            ("dc_refine", None, 0, 0, 1, 0),
            ("ac_refine", 0, 1, 63, 2, 1),
            ("ac_refine", 0, 1, 63, 1, 0),
        ]
    else:
        script = [
            ("dc_first", None, 0, 0, 0, 1),
            ("ac_first", 0, 1, 5, 0, 2),
            ("ac_first", 1, 1, 63, 0, 1),
            ("ac_first", 2, 1, 63, 0, 1),
            ("ac_first", 0, 6, 63, 0, 2),
            ("dc_refine", None, 0, 0, 1, 0),
            ("ac_refine", 0, 1, 63, 2, 1),
            ("ac_refine", 1, 1, 63, 1, 0),
            ("ac_refine", 2, 1, 63, 1, 0),
            ("ac_refine", 0, 1, 63, 1, 0),
        ]

    for kind, comp, ss, se, ah, al in script:
        em = _ScanEmitter()

        def run_pass():
            if kind == "dc_first":
                _emit_dc_first(em, zzs, factors, dc_blocks(), al)
            elif kind == "dc_refine":
                _emit_dc_refine(em, zzs, dc_blocks(), al)
            else:
                blocks = list(
                    _raster_order(
                        factors, comp, fh, fw, hmax, vmax, n_mcu_h
                    )
                )
                if kind == "ac_first":
                    _emit_ac_first(em, zzs[comp], blocks, ss, se, al)
                else:
                    _emit_ac_refine(em, zzs[comp], blocks, ss, se, al)

        run_pass()  # tally
        uses_huff = kind != "dc_refine"
        if uses_huff:
            freqs = em.freq if em.freq else {0x00: 1}
            bits, huffval, code_map = _build_table(freqs)
            cls = 0 if kind == "dc_first" else 1
            out += _dht_segment(cls, 0, bits, huffval)
            em.table = code_map
        em.writer = _BitWriter()
        run_pass()  # emit
        if kind in ("dc_first", "dc_refine"):
            sos = bytes([ncomp])
            for i in range(ncomp):
                sos += bytes([i + 1, 0x00])
        else:
            sos = bytes([1, comp + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        out += em.writer.flush()


# ---------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode baseline sequential (SOF0) or progressive (SOF2) JPEG,
    including subsampled chroma with sampling factors 1..2 (4:4:4,
    4:2:0, 4:2:2, 4:4:0). Returns (width, height, channels, pixels)
    with pixels (h, w) for grayscale or (h, w, 3) RGB. Raises
    NotImplementedError for other frame types (lossless, arithmetic,
    hierarchical) or sampling factors above 2; ValueError for
    malformed or truncated data."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed JPEG: {e}") from None


def _decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    progressive = False
    grids: list[np.ndarray] | None = None
    while True:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # optional 0xFF fill bytes may pad in front of any marker
        # (T.81 B.1.1.2) — skip to the marker code proper
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and grids is not None:
                fh, fw, comps = frame
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                n_mcu_h = -(-fw // (8 * hmax))
                n_mcu_v = -(-fh // (8 * vmax))
                return _reconstruct(frame, grids, qt, n_mcu_h, n_mcu_v)
            raise ValueError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                else:
                    vals = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                q = np.zeros(64, dtype=np.int32)
                q[_ZIGZAG] = vals
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, dest = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                p += 17
                table: dict[tuple[int, int], int] = {}
                code = 0
                for ln in range(1, 17):
                    for _ in range(counts[ln - 1]):
                        table[(ln, code)] = seg[p]
                        p += 1
                        code += 1
                    code <<= 1
                huff[(cls, dest)] = table
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} unsupported (1..2 only)"
                    )
                comps.append((cid, hi, vi, tq))
            frame = (fh, fw, comps)
            if marker == 0xC2:
                progressive = True
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                n_mcu_h = -(-fw // (8 * hmax))
                n_mcu_v = -(-fh // (8 * vmax))
                grids = [
                    np.zeros((n_mcu_v * vi * n_mcu_h * hi, 64), dtype=np.int32)
                    for _cid, hi, vi, _tq in comps
                ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"non-baseline frame type 0xFF{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tabs = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs.append((cid, tt >> 4, tt & 0x0F))
            if not progressive:
                pos += seglen
                return _decode_scan(
                    payload, pos, frame, scan_tabs, qt, huff, restart_interval
                )
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = _decode_prog_scan(
                payload, pos + seglen, frame, grids, scan_tabs, huff,
                restart_interval, ss, se, ahal >> 4, ahal & 0x0F,
            )
            continue
        pos += seglen


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _decode_mcus(
    r, comps, scan_tabs, huff, grids, pred, n_mcus, n_mcu_h, restart_interval
):
    """Entropy-decode every MCU's quantized coefficients into `grids`
    (in place). Raises _RestartMarker only if the stream carries an RST
    marker at a non-restart position — callers convert to ValueError."""
    ncomp = len(comps)
    mcu = 0
    while mcu < n_mcus:
        my, mx = divmod(mcu, n_mcu_h)
        for ci in range(ncomp):
            _, dc_t, ac_t = scan_tabs[ci]
            dct = huff[(0, dc_t)]
            act = huff[(1, ac_t)]
            _, hi, vi, _tq = comps[ci]
            nbh = n_mcu_h * hi
            for br in range(vi):
                for bc in range(hi):
                    size = _huff_decode(r, dct)
                    diff = _receive_extend(r, size)
                    pred[ci] += diff
                    blk = grids[ci][(my * vi + br) * nbh + (mx * hi + bc)]
                    blk[0] = pred[ci]
                    k = 1
                    while k < 64:
                        sym = _huff_decode(r, act)
                        if sym == 0x00:
                            break
                        if sym == 0xF0:
                            k += 16
                            continue
                        k += sym >> 4
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _receive_extend(r, sym & 0x0F)
                        k += 1
        mcu += 1
        if restart_interval and mcu % restart_interval == 0 and mcu < n_mcus:
            r.align_to_marker()
            for ci in range(ncomp):
                pred[ci] = 0


def _decode_scan(data, pos, frame, scan_tabs, qt, huff, restart_interval):
    fh, fw, comps = frame
    ncomp = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    n_mcu_h = -(-fw // mcu_w)
    n_mcu_v = -(-fh // mcu_h)
    n_mcus = n_mcu_v * n_mcu_h
    # per-component block grids sized to whole MCUs
    grids = []
    for cid, hi, vi, tq in comps:
        nbh, nbv = n_mcu_h * hi, n_mcu_v * vi
        grids.append(np.zeros((nbv * nbh, 64), dtype=np.int32))
    r = _BitReader(data, pos)
    pred = [0] * ncomp
    try:
        _decode_mcus(
            r, comps, scan_tabs, huff, grids, pred, n_mcus, n_mcu_h,
            restart_interval,
        )
    except _RestartMarker as m:
        # an RST marker outside a restart boundary means the entropy
        # stream is corrupt — surface it per the ValueError contract
        raise ValueError(
            f"unexpected restart marker 0xFFD{m.marker - 0xD0:X} in scan"
        ) from None

    return _reconstruct(frame, grids, qt, n_mcu_h, n_mcu_v)


# ---------------------------------------------------------------------
# progressive decoding (T.81 Annex G: spectral selection + successive
# approximation)
# ---------------------------------------------------------------------


def _comp_block_dims(fh, fw, hi, vi, hmax, vmax) -> tuple[int, int]:
    """(blocks_h, blocks_w) of a component in NON-interleaved scan
    order (T.81 A.2.2): ceil over the component's actual sampled size,
    NOT the MCU-padded grid — MCU padding blocks are only coded in
    interleaved scans."""
    cw = -(-fw * hi // hmax)
    ch = -(-fh * vi // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_prog_scan(
    data, pos, frame, grids, scan_tabs, huff, ri, ss, se, ah, al
) -> int:
    """Decode one progressive scan into the persistent coefficient
    grids; returns the payload offset of the next marker."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    n_mcu_h = -(-fw // (8 * hmax))
    n_mcu_v = -(-fh // (8 * vmax))
    by_cid = {c[0]: i for i, c in enumerate(comps)}
    idxs = []
    for cid, dc_t, ac_t in scan_tabs:
        if cid not in by_cid:
            raise ValueError(f"scan references unknown component {cid}")
        idxs.append((by_cid[cid], dc_t, ac_t))
    r = _BitReader(data, pos)
    try:
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            _prog_dc_scan(
                r, comps, idxs, huff, grids, ah, al,
                n_mcu_h, n_mcu_v, fh, fw, hmax, vmax, ri,
            )
        else:
            if len(idxs) != 1:
                raise ValueError("progressive AC scan must be one component")
            ci, _dc_t, ac_t = idxs[0]
            _prog_ac_scan(
                r, comps[ci], huff[(1, ac_t)], grids[ci], ss, se, ah, al,
                n_mcu_h, fh, fw, hmax, vmax, ri,
            )
    except _RestartMarker as m:
        raise ValueError(
            f"unexpected restart marker 0xFFD{m.marker - 0xD0:X} in scan"
        ) from None
    # advance to the next marker: entropy data never contains a bare FF
    p, n = r.pos, len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if data[p + 1] == 0xFF or 0xD0 <= data[p + 1] <= 0xD7:
                p += 1 if data[p + 1] == 0xFF else 2
                continue
            return p
        p += 1
    raise ValueError("truncated progressive stream")


def _prog_dc_scan(
    r, comps, idxs, huff, grids, ah, al, n_mcu_h, n_mcu_v, fh, fw,
    hmax, vmax, ri,
):
    """DC scan: first pass (Ah=0) Huffman DPCM shifted by Al; refine
    pass (Ah>0) one raw bit per block OR-ed at position Al (two's
    complement makes OR exact for negatives, T.81 G.1.2.1)."""
    pred = [0] * len(idxs)
    if len(idxs) > 1:  # interleaved MCU order
        units = n_mcu_v * n_mcu_h

        def unit_blocks(m):
            my, mx = divmod(m, n_mcu_h)
            for si, (ci, dc_t, _ac) in enumerate(idxs):
                _cid, hi, vi, _tq = comps[ci]
                nbh = n_mcu_h * hi
                for br in range(vi):
                    for bc in range(hi):
                        yield si, ci, dc_t, (my * vi + br) * nbh + (mx * hi + bc)

    else:  # single component: the component's own raster block order
        ci0, dc_t0, _ac0 = idxs[0]
        _cid, hi0, vi0, _tq = comps[ci0]
        bh, bw = _comp_block_dims(fh, fw, hi0, vi0, hmax, vmax)
        nbh0 = n_mcu_h * hi0
        units = bh * bw

        def unit_blocks(m):
            by, bx = divmod(m, bw)
            yield 0, ci0, dc_t0, by * nbh0 + bx

    for m in range(units):
        for si, ci, dc_t, bi in unit_blocks(m):
            blk = grids[ci][bi]
            if ah == 0:
                size = _huff_decode(r, huff[(0, dc_t)])
                diff = _receive_extend(r, size)
                pred[si] += diff
                blk[0] = pred[si] << al
            elif r.read_bit():
                blk[0] |= 1 << al
        if ri and (m + 1) % ri == 0 and m + 1 < units:
            r.align_to_marker()
            pred = [0] * len(idxs)


def _prog_ac_scan(
    r, comp, act, grid, ss, se, ah, al, n_mcu_h, fh, fw, hmax, vmax, ri
):
    _cid, hi, vi, _tq = comp
    bh, bw = _comp_block_dims(fh, fw, hi, vi, hmax, vmax)
    nbh = n_mcu_h * hi
    eobrun = 0
    nblocks = bh * bw
    for m in range(nblocks):
        by, bx = divmod(m, bw)
        blk = grid[by * nbh + bx]
        if ah == 0:
            eobrun = _ac_first_block(r, act, blk, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_block(r, act, blk, ss, se, al, eobrun)
        if ri and (m + 1) % ri == 0 and m + 1 < nblocks:
            r.align_to_marker()
            eobrun = 0


def _ac_first_block(r, act, blk, ss, se, al, eobrun) -> int:
    """First AC pass for one block (T.81 G.1.2.2): run-length coded
    coefficients shifted by Al, with EOBn symbols carrying a run of
    all-zero *blocks* (the cross-block run is the return value)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _huff_decode(r, act)
        run, s = sym >> 4, sym & 0x0F
        if s == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            eobrun = (1 << run) - 1  # -1: this block is part of the run
            if run:
                eobrun += r.read_bits(run)
            return eobrun
        k += run
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _receive_extend(r, s) << al
        k += 1
    return 0


def _ac_refine_block(r, act, blk, ss, se, al, eobrun) -> int:
    """AC refinement pass (T.81 G.1.2.3): newly-nonzero coefficients
    arrive as (run, 1) symbols + a sign bit; every already-nonzero
    coefficient crossed on the way contributes one correction bit that
    moves its magnitude toward the true value."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(pos):
        if r.read_bit() and (int(blk[pos]) & p1) == 0:
            blk[pos] += p1 if blk[pos] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _huff_decode(r, act)
            run, s = sym >> 4, sym & 0x0F
            if s == 0:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break
                val = 0  # ZRL: span 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid AC refinement symbol")
                val = p1 if r.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if s and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # current block's tail rides the EOB run
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, grids, qt, n_mcu_h, n_mcu_v):
    """Dequantize + inverse DCT the per-component zig-zag coefficient
    grids into the final pixel array (shared by the baseline and
    progressive paths)."""
    fh, fw, comps = frame
    ncomp = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        q = qt[tq]
        zz = grids[ci]
        nbh, nbv = n_mcu_h * hi, n_mcu_v * vi
        dense = np.zeros((zz.shape[0], 64), dtype=np.float64)
        dense[:, _ZIGZAG] = zz
        blocks = dense.reshape(-1, 8, 8) * q
        spatial = np.einsum("ji,ajk,kl->ail", _DCT, blocks, _DCT)
        plane = (
            spatial.reshape(nbv, nbh, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nbv * 8, nbh * 8)
        )
        # upsample subsampled components back to full resolution
        sy, sx = vmax // vi, hmax // hi
        if sy > 1 or sx > 1:
            plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
        planes.append(plane[:fh, :fw] + 128.0)

    if ncomp == 1:
        px = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return fw, fh, 1, px
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8) for p in (r_, g_, b_)],
        axis=-1,
    )
    return fw, fh, 3, rgb
