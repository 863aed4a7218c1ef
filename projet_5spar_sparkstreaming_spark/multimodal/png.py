"""Minimal pure-stdlib PNG codec (8-bit gray / RGB / RGBA, non-interlaced).

This container has no image libraries (PIL/cv2), but PNG's container is
just zlib + per-scanline filters (public spec: RFC 2083 / W3C PNG), both
expressible with the stdlib. This codec makes the multimodal decode /
resize operators REAL — genuine bytes in, genuine pixels out — instead
of stubs, at fixture scale. A production deployment swaps in PIL/cv2
inside the same mapInPandas functions; the Spark-side contract is
identical.

Supports: bit depth 8; color types 0 (gray), 2 (RGB), 6 (RGBA);
all five scanline filters (None/Sub/Up/Average/Paeth) on decode;
selectable filter on encode (exercises every decode path in tests).
Rejects: interlaced, palette, 16-bit — raise ValueError, callers fall
back to the documented stub.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> color type


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(
    pixels: bytes, width: int, height: int, channels: int = 3, filter_type: int = 0
) -> bytes:
    """Encode raw interleaved 8-bit pixels to a PNG byte string.

    ``filter_type`` selects the per-scanline filter (0-4) so tests can
    exercise every decoder unfilter path; 0 (None) is the cheap default.
    """
    if channels not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height * channels}"
        )
    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - channels] if i >= channels else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        elif filter_type == 4:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"unsupported filter type {filter_type}")
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG byte string -> (width, height, channels, raw pixels).

    Validates signature and chunk CRCs; handles all five scanline
    filters; raises ValueError on anything outside the supported subset
    (interlace, palette, 16-bit) AND on corrupt/truncated streams — the
    single exception contract the Spark operators route to the stub
    path (fuzz-tested in tests/test_jpeg_codec.py alongside JPEG/Y4M).
    """
    try:
        return _decode_png_impl(data)
    except (IndexError, struct.error, zlib.error) as e:
        raise ValueError(
            f"invalid PNG: corrupt or truncated stream ({type(e).__name__})"
        ) from e


def _decode_png_impl(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = bytearray(height * stride)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    new_width: int,
    new_height: int,
) -> bytes:
    """Nearest-neighbor resample of raw interleaved pixels."""
    out = bytearray(new_width * new_height * channels)
    for ny in range(new_height):
        sy = min(height - 1, (ny * height) // new_height)
        src_row = sy * width * channels
        dst_row = ny * new_width * channels
        for nx in range(new_width):
            sx = min(width - 1, (nx * width) // new_width)
            s = src_row + sx * channels
            d = dst_row + nx * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


def to_grayscale(pixels: bytes, channels: int) -> bytes:
    """Luma conversion (ITU-R BT.601 integer weights) to 1 channel."""
    if channels == 1:
        return pixels
    n = len(pixels) // channels
    out = bytearray(n)
    for i in range(n):
        base = i * channels
        r, g, b = pixels[base], pixels[base + 1], pixels[base + 2]
        out[i] = (299 * r + 587 * g + 114 * b) // 1000
    return bytes(out)
