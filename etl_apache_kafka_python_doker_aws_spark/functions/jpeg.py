"""Baseline JPEG (ITU-T T.81 / ISO 10918-1, SOF0) codec — pure numpy +
stdlib, no codec libraries.

This retires the last environment-gated decode in the engine: rounds 1-4
kept JPEG behind a NotImplementedError because "entropy-coded formats
need a codec library". They don't — baseline JPEG is Huffman + DCT, both
implementable with numpy alone:

  * ``encode_jpeg``: 8-bit greyscale or RGB (4:4:4, no subsampling) →
    spec-conformant JFIF stream: SOI/APP0/DQT/SOF0/DHT/SOS/EOI framing,
    level shift + orthonormal 8x8 FDCT + quantization (quality-scaled
    Annex-K-style tables), zigzag, DC-difference + AC run-length
    categories, canonical Huffman entropy coding with 0xFF byte
    stuffing. The Huffman tables are generated (all 12 DC symbols at 4
    bits, all 162 AC symbols at 8 bits — Kraft-valid, all-ones code
    unused as the spec requires) rather than Annex K's: ANY valid table
    written to DHT yields a conformant file, at a few percent size cost.
  * ``decode_jpeg``: general BASELINE decoder — parses whatever
    DQT/DHT/SOF0 the stream declares (not just this encoder's), entropy
    decodes with EOB/ZRL and restart-marker handling, dequantizes,
    inverse-zigzags, IDCT, level shift, and converts YCbCr→RGB (JFIF
    full-range matrix). Supported: 8-bit precision, 1 or 3 components,
    all sampling factors 1x1 (4:4:4). Progressive (SOF2), arithmetic
    coding, and subsampled streams return None — poison-safe, never an
    exception.

JPEG is lossy, so unlike PNG/RAW8 the decode has no bit-exact oracle;
the registered query (workloads/llm.l5_multimodal_jpeg) pins id-derived
dimensions exactly and reconstruction error as a quantization-bounded
invariant; tests additionally assert PSNR on round-trips.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants
# ---------------------------------------------------------------------------

#: Annex-K-style base quantization tables (luminance / chrominance).
_Q_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)

_Q_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)


def _zigzag_order() -> np.ndarray:
    """Indices mapping natural (row-major) order -> zigzag position."""
    order = sorted(
        ((x, y) for x in range(8) for y in range(8)),
        key=lambda p: (p[0] + p[1], p[1] if (p[0] + p[1]) % 2 else p[0]),
    )
    flat = np.zeros(64, dtype=np.int64)
    for zz, (x, y) in enumerate(order):
        flat[zz] = x * 8 + y
    return flat


_ZIGZAG = _zigzag_order()          # zigzag pos -> natural index
_UNZIGZAG = np.argsort(_ZIGZAG)    # natural index -> zigzag pos

#: Orthonormal 8-point DCT-II matrix: block_dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (clamped 1..255)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _category(v: int) -> int:
    """JPEG magnitude category: number of bits to represent |v|."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Generated canonical Huffman tables (encoder side)
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Assign canonical codes: symbol -> (code, length). ``bits[i]`` =
    number of codes of length i+1, symbols taken from ``vals`` in order."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


#: Encoder tables: every DC category (0..11) at 4 bits, every AC symbol
#: (run<<4|size for run 0..15, size 1..10, plus EOB 0x00 and ZRL 0xF0)
#: at 8 bits. Kraft: 12/16 and 162/256 — valid, and the all-ones code is
#: never assigned (T.81 forbids it: trailing 1-padding must not decode).
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]
_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            self.put(0x7F, 8 - self._n)  # pad with 1s per spec


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def encode_jpeg(pixels, quality: int = 90) -> bytes:
    """Encode an (h, w) or (h, w, 1|3) uint8 array as baseline JFIF."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ncomp = px.shape
    if ncomp not in (1, 3) or h == 0 or w == 0 or h > 65500 or w > 65500:
        raise ValueError(f"encode_jpeg: unsupported shape {px.shape}")
    q_lum = _scaled_quant(_Q_LUM, quality)
    q_chr = _scaled_quant(_Q_CHROM, quality)

    if ncomp == 3:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        planes = [np.clip(p, 0, 255) for p in planes]
        qsel = [0, 1, 1]
    else:
        planes = [px[:, :, 0].astype(np.float64)]
        qsel = [0]

    out = bytearray()
    out += b"\xff\xd8"                                        # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(
        int(q_lum.reshape(64)[_ZIGZAG][i]) for i in range(64)))
    if ncomp == 3:
        out += _seg(0xFFDB, bytes([1]) + bytes(
            int(q_chr.reshape(64)[_ZIGZAG][i]) for i in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qsel[ci]])                # 1x1 sampling
    out += _seg(0xFFC0, sof)                                  # SOF0
    out += _seg(0xFFC4, _dht_payload(0, 0, _DC_BITS, _DC_VALS))
    out += _seg(0xFFC4, _dht_payload(1, 0, _AC_BITS, _AC_VALS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])                          # DC 0 / AC 0
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    wtr = _BitWriter()
    # interleaved MCU order: with 1x1 sampling an MCU is one block per
    # component, raster order
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = [np.pad(p - 128.0, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                     mode="edge") for p in planes]
    qtabs = [q_lum if s == 0 else q_chr for s in qsel]
    preds = [0] * ncomp
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(ncomp):
                block = padded[ci][by:by + 8, bx:bx + 8]
                coef = _C @ block @ _C.T
                qc = np.round(coef / qtabs[ci]).astype(np.int64)
                zz = qc.reshape(64)[_ZIGZAG]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                cat = _category(diff)
                code, ln = _DC_CODES[cat]
                wtr.put(code, ln)
                if cat:
                    amp = diff if diff > 0 else diff + (1 << cat) - 1
                    wtr.put(amp, cat)
                run = 0
                for i in range(1, 64):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = _AC_CODES[0xF0]
                        wtr.put(code, ln)
                        run -= 16
                    size = _category(v)
                    code, ln = _AC_CODES[(run << 4) | size]
                    wtr.put(code, ln)
                    amp = v if v > 0 else v + (1 << size) - 1
                    wtr.put(amp, size)
                    run = 0
                if run:
                    code, ln = _AC_CODES[0x00]
                    wtr.put(code, ln)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"                                        # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (general baseline, 4:4:4 / greyscale)
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self._n <= 24:
            if self.pos >= len(self.data):
                return
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else None
                )
                if nxt == 0x00:               # stuffed literal 0xFF
                    self.pos += 2
                else:                         # marker (incl. RSTn): stop
                    if nxt is not None and not (0xD0 <= nxt <= 0xD7):
                        self.marker = nxt
                    return
            else:
                self.pos += 1
            self._acc = (self._acc << 8) | b
            self._n += 8

    def bits(self, n: int) -> int | None:
        if n == 0:
            return 0
        if self._n < n:
            self._fill()
        if self._n < n:
            return None
        self._n -= n
        return (self._acc >> self._n) & ((1 << n) - 1)

    def bit(self) -> int | None:
        return self.bits(1)

    def skip_rst(self) -> bool:
        """Consume an expected RSTn marker between restart intervals."""
        self._acc, self._n = 0, 0        # byte-align, discard pad bits
        if (self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2
            return True
        return False


def _build_decode_table(bits: list[int], vals: list[int]):
    """Length-indexed canonical decode: list of (first_code, first_index,
    count) per length, plus the symbol list."""
    table = []
    code, k = 0, 0
    for length in range(1, 17):
        n = bits[length - 1]
        table.append((code, k, n))
        code = (code + n) << 1
        k += n
    return table, vals


def _huff_decode(rd: _BitReader, table) -> int | None:
    lens, vals = table
    code = 0
    for length in range(1, 17):
        b = rd.bit()
        if b is None:
            return None
        code = (code << 1) | b
        first, idx, n = lens[length - 1]
        # both bounds: a malformed (non-canonical) DHT can make
        # code < first, and a negative offset would silently index the
        # symbol list from the END instead of rejecting the stream
        if n and 0 <= code - first < n:
            return vals[idx + (code - first)]
    return None


def _extend(amp: int, size: int) -> int:
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def decode_jpeg(blob: bytes):
    """Decode a baseline JFIF/JPEG into (h, w, c) uint8, or None for
    anything malformed/unsupported (progressive, subsampled, 12-bit,
    arithmetic-coded, truncated, bad markers)."""
    try:
        return _decode_jpeg_inner(bytes(blob) if blob is not None else None)
    except Exception:
        return None


def _decode_jpeg_inner(b: bytes | None):
    if b is None or len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:
            return None                       # EOI before SOS
        (ln,) = struct.unpack(">H", b[pos + 2:pos + 4])
        seg = b[pos + 4:pos + 2 + ln]
        if len(seg) != ln - 2:
            return None
        if marker == 0xDB:                    # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    return None               # 16-bit tables unsupported
                flat = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                if len(flat) != 64:
                    return None
                nat = np.zeros(64)
                nat[_ZIGZAG] = flat           # zigzag order -> natural
                qtabs[tq] = nat.reshape(8, 8).astype(np.float64)
                p += 65
        elif marker == 0xC4:                  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                if len(vals) != n:
                    return None
                htabs[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:                  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                return None
            # Decode-side working set is float64 planes allocated from
            # HEADER-declared dims, BEFORE any entropy data is validated
            # — a 300-byte poison blob declaring 8k x 8k must not force a
            # half-GB allocation per row. 1<<24 samples = 128 MB of
            # float64 worst case; anything larger is rejected, not
            # decoded.
            if h * w * nc > (1 << 24):
                return None
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + ci * 3:9 + ci * 3]
                if samp != 0x11:
                    return None               # subsampling unsupported
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None                       # non-baseline SOF
        elif marker == 0xDD:                  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                  # SOS — entropy data follows
            if frame is None:
                return None
            h, w, comps = frame
            ns = seg[0]
            if ns != len(comps):
                return None
            sel = []
            for ci in range(ns):
                cs, tsel = seg[1 + ci * 2:3 + ci * 2]
                sel.append((tsel >> 4, tsel & 0xF))
            rd = _BitReader(b, pos + 2 + ln)
            ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
            planes = [np.zeros((ph, pw)) for _ in comps]
            preds = [0] * len(comps)
            mcu = 0
            for by in range(0, ph, 8):
                for bx in range(0, pw, 8):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        if not rd.skip_rst():
                            return None
                        preds = [0] * len(comps)
                    for ci, (_cid, tq) in enumerate(comps):
                        dc_t = htabs.get((0, sel[ci][0]))
                        ac_t = htabs.get((1, sel[ci][1]))
                        q = qtabs.get(tq)
                        if dc_t is None or ac_t is None or q is None:
                            return None
                        zz = np.zeros(64)
                        cat = _huff_decode(rd, dc_t)
                        if cat is None or cat > 15:
                            return None
                        if cat:
                            amp = rd.bits(cat)
                            if amp is None:
                                return None
                            preds[ci] += _extend(amp, cat)
                        zz[0] = preds[ci]
                        i = 1
                        while i < 64:
                            sym = _huff_decode(rd, ac_t)
                            if sym is None:
                                return None
                            if sym == 0x00:   # EOB
                                break
                            if sym == 0xF0:   # ZRL
                                i += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            i += run
                            if i > 63 or size == 0:
                                return None
                            amp = rd.bits(size)
                            if amp is None:
                                return None
                            zz[i] = _extend(amp, size)
                            i += 1
                        nat = np.zeros(64)
                        nat[_ZIGZAG] = zz
                        coef = nat.reshape(8, 8) * q
                        block = _C.T @ coef @ _C
                        planes[ci][by:by + 8, bx:bx + 8] = block + 128.0
                    mcu += 1
            if len(comps) == 3:
                y = planes[0][:h, :w]
                cb = planes[1][:h, :w] - 128.0
                cr = planes[2][:h, :w] - 128.0
                rgb = np.stack([
                    y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb,
                ], axis=-1)
                return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
            return np.clip(
                np.round(planes[0][:h, :w, None]), 0, 255
            ).astype(np.uint8)
        pos += 2 + ln
    return None
