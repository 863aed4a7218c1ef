"""Baseline JPEG codec tests: self-contained encode/decode round-trips
(error bounded by quantization), marker/structure validation, and the
REAL decode path through the Spark multimodal operators."""

from __future__ import annotations

import numpy as np
import pytest

from projet_5spar_sparkstreaming_spark.multimodal.binary import decode_image_batch
from projet_5spar_sparkstreaming_spark.multimodal.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _gradient(w, h, ch):
    yy, xx = np.mgrid[0:h, 0:w]
    if ch == 1:
        img = ((xx + yy) * 255 // (w + h - 2 if w + h > 2 else 1)).astype(np.uint8)
        return img[..., None]
    img = np.stack(
        [
            (xx * 255 // max(1, w - 1)),
            (yy * 255 // max(1, h - 1)),
            ((xx + yy) * 255 // max(1, w + h - 2)),
        ],
        axis=-1,
    ).astype(np.uint8)
    return img


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("size", [(8, 8), (16, 8), (24, 40), (9, 5)])
def test_roundtrip_quantization_bounded(channels, size):
    h, w = size
    img = _gradient(w, h, channels)
    data = encode_jpeg(img.tobytes(), w, h, channels, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    rw, rh, rch, px = decode_jpeg(data)
    assert (rw, rh, rch) == (w, h, channels)
    out = np.frombuffer(px, dtype=np.uint8).reshape(h, w, channels).astype(int)
    err = np.abs(out - img.astype(int))
    # smooth gradients at q90: error stays within a few quantization steps
    assert err.max() <= 12 and err.mean() <= 3.0


def test_noise_roundtrip_structurally_valid():
    # white noise stresses every huffman path (ZRL, long magnitudes);
    # assert structural validity, not pixel closeness (noise is the
    # worst case for DCT quantization)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    data = encode_jpeg(img.tobytes(), 24, 16, 3, quality=95)
    rw, rh, rch, px = decode_jpeg(data)
    assert (rw, rh, rch) == (24, 16, 3)
    assert len(px) == 24 * 16 * 3


def test_quality_monotone_size():
    img = _gradient(32, 32, 3)
    sizes = [
        len(encode_jpeg(img.tobytes(), 32, 32, 3, quality=q)) for q in (30, 60, 95)
    ]
    assert sizes[0] <= sizes[1] <= sizes[2]


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"definitely not a jpeg")


def test_progressive_rejected():
    # flip SOF0 -> SOF2 (progressive) in a valid stream
    data = bytearray(encode_jpeg(_gradient(8, 8, 1).tobytes(), 8, 8, 1))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))


def test_decode_image_batch_real_jpeg(spark):
    # constant-color JPEGs decode through the Spark operator to the
    # BT.601 luma (constant blocks survive quantization exactly at the
    # DC coefficient, so features are within 1/255 of ideal)
    rows = []
    colors = [(255, 0, 0), (0, 255, 0), (10, 10, 10)]
    for i, (r, g, b) in enumerate(colors):
        px = bytes([r, g, b] * (8 * 8))
        rows.append((i, encode_jpeg(px, 8, 8, 3, quality=90)))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r["features"] for r in decode_image_batch(df).collect()}
    assert all(len(v) == 16 for v in out.values())
    lumas = [76, 149, 10]
    for i, luma in enumerate(lumas):
        got = np.array(out[i]) * 255.0
        assert np.abs(got - luma).max() <= 3.0, (i, got, luma)


def test_jpeg_roundtrip_property():
    """Property: any smooth-ish image round-trips with bounded error and
    exact dimensions for arbitrary sizes (hypothesis)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=20),
        h=st.integers(min_value=1, max_value=20),
        channels=st.sampled_from([1, 3]),
        base=st.integers(min_value=0, max_value=200),
    )
    def roundtrip(w, h, channels, base):
        img = np.full((h, w, channels), base, dtype=np.uint8)
        rw, rh, rch, px = decode_jpeg(
            encode_jpeg(img.tobytes(), w, h, channels, quality=90)
        )
        assert (rw, rh, rch) == (w, h, channels)
        out = np.frombuffer(px, dtype=np.uint8).reshape(h, w, channels).astype(int)
        assert np.abs(out - int(base)).max() <= 2  # constant image: DC only

    roundtrip()
