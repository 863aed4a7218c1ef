"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT).

Second REAL image codec next to ``multimodal/png.py`` (reference's
multimodal story, SURVEY.md north-star extensions): genuine bytes ->
pixels with no external libraries. Scope is baseline JPEG — SOF0,
8-bit, Huffman entropy coding, optional restart intervals, 4:4:4 /
4:2:2 / 4:2:0 chroma subsampling on decode; the encoder emits 4:4:4
(or single-component grayscale) with the spec's Annex K quantization
and Huffman tables. Progressive (SOF2) and arithmetic coding are out
of scope and raise ``ValueError`` so callers can fall back.

All constants below (zigzag order, quantization matrices, Huffman
BITS/HUFFVAL lists) are the public tables printed in the JPEG spec
(Annex K); the 8x8 DCT uses the orthonormal DCT-II matrix.

Used inside Arrow-batched ``mapInPandas`` bodies (multimodal/binary.py)
— per-payload Python cost is amortized over Arrow transfer, and numpy
carries the block math.
"""

from __future__ import annotations

import struct

import numpy as np

# -- public spec constants (T.81 Annex K) -----------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.intp,
)

_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Huffman table definitions: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: spatial = T.T @ coeff @ T
_DCT_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_T[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _build_canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for decode."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[idx]
            code += 1
            idx += 1
        code <<= 1
    return out


# -- bit IO -----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos < len(d):
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker terminates the segment
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    return
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        else:
            self.acc <<= 8
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

    def align_to_marker(self) -> int | None:
        """Drop partial byte, consume a restart marker if present."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                self.pos += 2
                self.marker = None
                return m
            self.pos += 1
        return None


def _decode_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: huffman code not found")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, code bits) for DC/AC coefficient coding."""
    size = int(abs(v)).bit_length()
    code = v if v >= 0 else v + (1 << size) - 1
    return size, code


# -- decoder ----------------------------------------------------------------


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG bytes -> (width, height, channels, interleaved pixels).

    channels is 1 (grayscale) or 3 (RGB, converted from YCbCr with
    BT.601 full-range as the spec's JFIF convention). Raises
    ``ValueError`` on non-baseline streams (progressive, arithmetic,
    12-bit) AND on corrupt/truncated streams — the single exception
    contract the Spark operators route to the stub path (a leaked
    IndexError would fail the whole task on one bad payload;
    fuzz-tested in tests/test_jpeg_codec.py).
    """
    try:
        return _decode_jpeg_impl(data)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(
            f"invalid JPEG: corrupt or truncated stream ({type(e).__name__})"
        ) from e


def _decode_jpeg_impl(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (width, height, [(comp_id, h, v, tq)])
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                quant[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                table = _build_decode_table(bits, vals)
                (huff_ac if tc else huff_dc)[th] = table
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * i]))
            frame = (width, height, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for i in range(ns):
                cs = seg[1 + 2 * i]
                td_ta = seg[2 + 2 * i]
                scan_tables[cs] = (td_ta >> 4, td_ta & 0x0F)
            return _decode_scan(
                data,
                pos + seg_len,
                frame,
                scan_tables,
                quant,
                huff_dc,
                huff_ac,
                restart_interval,
            )
        # APPn/COM/others: skip
        pos += seg_len
    raise ValueError("invalid JPEG: no scan data")


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    scan_tables,
    quant,
    huff_dc,
    huff_ac,
    restart_interval: int,
) -> tuple[int, int, int, bytes]:
    width, height, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = {}
    for cid, h, v, _tq in comps:
        planes[cid] = np.zeros((mcus_y * v * 8, mcus_x * h * 8), dtype=np.float64)

    reader = _BitReader(data, pos)
    pred = {c[0]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("invalid JPEG: missing restart marker")
                pred = {c[0]: 0 for c in comps}
            for cid, h, v, tq in comps:
                td, ta = scan_tables[cid]
                qt = quant[tq].astype(np.float64)
                for by in range(v):
                    for bx in range(h):
                        zz = np.zeros(64, dtype=np.float64)
                        s = _decode_huffman(reader, huff_dc[td])
                        diff = _extend(reader.read_bits(s), s)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(reader, huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("invalid JPEG: AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * qt
                        coeff = block.reshape(8, 8)
                        spatial = _DCT_T.T @ coeff @ _DCT_T + 128.0
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for cid, h, v, _tq in comps:
        p = planes[cid]
        if h != hmax or v != vmax:
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.tobytes()


# -- encoder ----------------------------------------------------------------


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    pred: int,
    dc_codes,
    ac_codes,
) -> int:
    coeff = _DCT_T @ (block - 128.0) @ _DCT_T.T
    # quantize in natural order, then zigzag-scan
    q = np.round(coeff.reshape(64) / qt).astype(np.int64)
    zz = q[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    size, code = _magnitude(diff)
    hcode, hlen = dc_codes[size]
    writer.write(hcode, hlen)
    if size:
        writer.write(code, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hcode, hlen = ac_codes[0xF0]  # ZRL
            writer.write(hcode, hlen)
            run -= 16
        size, code = _magnitude(v)
        hcode, hlen = ac_codes[(run << 4) | size]
        writer.write(hcode, hlen)
        writer.write(code, size)
        run = 0
    if last_nz < 63:
        hcode, hlen = ac_codes[0x00]  # EOB
        writer.write(hcode, hlen)
    return dc


def encode_jpeg(
    pixels: bytes, width: int, height: int, channels: int, quality: int = 85
) -> bytes:
    """Interleaved 8-bit pixels (1 or 3 channels) -> baseline JPEG bytes.

    4:4:4 sampling (no chroma subsampling) keeps the encoder simple and
    the round-trip error down to quantization only.
    """
    if channels not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    img = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    img = img.reshape(height, width, channels)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comp_planes = [y, cb, cr]
    else:
        comp_planes = [img[..., 0]]

    qts = [_scaled_quant(_QUANT_LUMA, quality)]
    if channels == 3:
        qts.append(_scaled_quant(_QUANT_CHROMA, quality))

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT
    for tq, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(qt[z]) for z in ZIGZAG)
    # SOF0
    ncomp = channels
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    # DHT
    tables = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if channels == 3:
        tables += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tcth, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tcth])
        out += bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += bytes([0, 63, 0])

    dc_luma = _build_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_luma = _build_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_chroma = _build_canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_chroma = _build_canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    writer = _BitWriter()
    preds = [0] * ncomp
    blocks_y = -(-height // 8)
    blocks_x = -(-width // 8)
    padded = []
    for plane in comp_planes:
        p = np.empty((blocks_y * 8, blocks_x * 8), dtype=np.float64)
        p[:height, :width] = plane
        p[height:, :width] = plane[-1:, :]  # edge-replicate padding
        p[:, width:] = p[:, width - 1 : width]
        padded.append(p)
    qt_nat = [qts[0].astype(np.float64)]
    if channels == 3:
        qt_nat += [qts[1].astype(np.float64), qts[1].astype(np.float64)]
    for by in range(blocks_y):
        for bx in range(blocks_x):
            for ci in range(ncomp):
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                dc_codes = dc_luma if ci == 0 else dc_chroma
                ac_codes = ac_luma if ci == 0 else ac_chroma
                preds[ci] = _encode_block(
                    writer, block, qt_nat[ci], preds[ci], dc_codes, ac_codes
                )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
