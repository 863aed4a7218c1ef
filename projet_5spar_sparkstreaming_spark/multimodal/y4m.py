"""Pure-Python YUV4MPEG2 (.y4m) video container codec.

The video leg of the multimodal tier, matching what ``png.py``/
``jpeg.py`` are for images and stdlib ``wave`` is for audio: a REAL
bytes -> frames decode with no external libraries. Y4M is the public
uncompressed interchange format (plain-text stream header, ``FRAME``
markers, raw planar YUV payloads) used as the canonical input/output of
video toolchains; compressed codecs (H.264/VP9/AV1) genuinely need
external decoders and keep the documented stub fallback in
``multimodal/binary.py``.

Supported: C420 (default, 2x2-subsampled chroma), C422, C444 and Cmono
colorspaces, arbitrary frame rates/counts. Interlacing parameters are
parsed and ignored (frames return as stored).
"""

from __future__ import annotations

from collections.abc import Iterator

Y4M_SIG = b"YUV4MPEG2"

_PLANE_FACTORS = {
    # chroma plane size as a fraction of the luma plane
    "C420": 4,      # w/2 * h/2
    "C420jpeg": 4,
    "C420paldv": 4,
    "C422": 2,      # w/2 * h
    "C444": 1,
    "Cmono": 0,     # no chroma planes
}


def parse_y4m_header(data: bytes) -> tuple[int, int, tuple[int, int], str, int]:
    """-> (width, height, (fps_num, fps_den), colorspace, header_len)."""
    if data[: len(Y4M_SIG)] != Y4M_SIG:
        raise ValueError("not a YUV4MPEG2 stream (missing signature)")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("invalid y4m: unterminated stream header")
    width = height = 0
    fps = (30, 1)
    colorspace = "C420"
    for param in data[len(Y4M_SIG) : nl].split(b" "):
        if not param:
            continue
        tag, val = chr(param[0]), param[1:].decode("ascii", "replace")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == "C":
            colorspace = "C" + val
        # I (interlace), A (aspect), X (extensions): parsed, ignored
    if width <= 0 or height <= 0:
        raise ValueError("invalid y4m: missing W/H in stream header")
    if colorspace not in _PLANE_FACTORS:
        raise ValueError(f"unsupported y4m colorspace {colorspace}")
    return width, height, fps, colorspace, nl + 1


def _frame_size(width: int, height: int, colorspace: str) -> int:
    luma = width * height
    factor = _PLANE_FACTORS[colorspace]
    return luma if factor == 0 else luma + 2 * (luma // factor)


def iter_y4m_frames(data: bytes) -> Iterator[bytes]:
    """Yield each frame's raw planar payload (Y plane first).

    Use ``parse_y4m_header`` for dimensions; the luma plane is the
    first width*height bytes of every yielded payload.
    """
    width, height, _fps, colorspace, pos = parse_y4m_header(data)
    fsize = _frame_size(width, height, colorspace)
    n = len(data)
    while pos < n:
        nl = data.find(b"\n", pos)
        if nl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("invalid y4m: missing FRAME marker")
        start = nl + 1
        end = start + fsize
        if end > n:
            raise ValueError("invalid y4m: truncated frame payload")
        yield data[start:end]
        pos = end


def encode_y4m(
    frames_y: list[bytes],
    width: int,
    height: int,
    fps: tuple[int, int] = (30, 1),
    colorspace: str = "C420",
) -> bytes:
    """Grayscale frames (Y planes) -> a valid y4m stream; chroma planes
    are filled neutral (128). The fixture-side encoder for tests and
    catalog queries (like ``encode_png`` / ``encode_jpeg``)."""
    if colorspace not in _PLANE_FACTORS:
        raise ValueError(f"unsupported y4m colorspace {colorspace}")
    luma = width * height
    factor = _PLANE_FACTORS[colorspace]
    chroma = b"" if factor == 0 else b"\x80" * (2 * (luma // factor))
    out = bytearray(
        Y4M_SIG
        + f" W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n".encode()
    )
    for y in frames_y:
        if len(y) != luma:
            raise ValueError("frame luma size mismatch")
        out += b"FRAME\n" + y + chroma
    return bytes(out)
