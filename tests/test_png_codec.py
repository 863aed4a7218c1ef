"""PNG codec tests: spec round-trips (all 5 filters, 3 color types) and
the REAL decode/resize paths through the Spark multimodal operators."""

from __future__ import annotations

import pytest

from projet_5spar_sparkstreaming_spark.multimodal.binary import (
    decode_image_batch,
    resize_image_batch,
)
from projet_5spar_sparkstreaming_spark.multimodal.png import (
    decode_png,
    encode_png,
    resize_nearest,
    to_grayscale,
)


def _pixels(w, h, ch, seed=7):
    # deterministic pseudo-random bytes (LCG), no RNG dependency
    out = bytearray(w * h * ch)
    x = seed
    for i in range(len(out)):
        x = (1103515245 * x + 12345) % (1 << 31)
        out[i] = x & 0xFF
    return bytes(out)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip_every_filter_and_colortype(filter_type, channels):
    w, h = 9, 5  # odd sizes catch stride bugs
    px = _pixels(w, h, channels)
    data = encode_png(px, w, h, channels, filter_type=filter_type)
    rw, rh, rch, rpx = decode_png(data)
    assert (rw, rh, rch) == (w, h, channels)
    assert rpx == px


def test_crc_validation():
    data = bytearray(encode_png(_pixels(4, 4, 3), 4, 4, 3))
    data[40] ^= 0xFF  # flip a byte inside IHDR/IDAT region
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_non_png_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all............")


def test_resize_nearest_block_expansion():
    # 2x2 gray image upscaled 2x: each pixel becomes a 2x2 block
    px = bytes([10, 20, 30, 40])
    out = resize_nearest(px, 2, 2, 1, 4, 4)
    assert out == bytes(
        [10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40]
    )


def test_to_grayscale_luma():
    # pure red / green / blue pixels -> BT.601 integer luma
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    assert to_grayscale(px, 3) == bytes([76, 149, 29])


def test_decode_image_batch_real_png(spark):
    # constant-color PNGs: every 4x4-thumbnail feature == luma/255
    rows = []
    for i, (r, g, b) in enumerate([(255, 0, 0), (0, 255, 0), (10, 10, 10)]):
        px = bytes([r, g, b] * (8 * 6))
        rows.append((i, encode_png(px, 8, 6, 3)))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r["features"] for r in decode_image_batch(df).collect()}
    assert all(len(v) == 16 for v in out.values())
    assert out[0] == pytest.approx([76 / 255.0] * 16)
    assert out[1] == pytest.approx([149 / 255.0] * 16)
    assert out[2] == pytest.approx([10 / 255.0] * 16)


def test_decode_image_batch_mixed_png_and_stub(spark):
    png = encode_png(bytes([50, 100, 150] * 4), 2, 2, 3)
    raw = bytes(range(64))  # non-PNG -> stub path
    df = spark.createDataFrame(
        [(1, png), (2, raw)], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in decode_image_batch(df).collect()}
    luma = (299 * 50 + 587 * 100 + 114 * 150) // 1000
    assert out[1]["features"] == pytest.approx([luma / 255.0] * 16)
    assert out[2]["features"] == pytest.approx([b / 255.0 for b in raw[:16]])


def test_png_roundtrip_property():
    """Property: ANY pixel buffer round-trips bit-exactly through
    encode/decode for every filter and color type (hypothesis)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=12),
        h=st.integers(min_value=1, max_value=12),
        channels=st.sampled_from([1, 3, 4]),
        filter_type=st.integers(min_value=0, max_value=4),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def roundtrip(w, h, channels, filter_type, seed):
        px = _pixels(w, h, channels, seed=seed)
        rw, rh, rch, rpx = decode_png(encode_png(px, w, h, channels, filter_type))
        assert (rw, rh, rch, rpx) == (w, h, channels, px)

    roundtrip()


def test_resize_nearest_identity_property():
    """Property: resizing to the same dimensions is the identity."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=10),
        h=st.integers(min_value=1, max_value=10),
        channels=st.sampled_from([1, 3]),
        seed=st.integers(min_value=0, max_value=1000),
    )
    def identity(w, h, channels, seed):
        px = _pixels(w, h, channels, seed=seed)
        assert resize_nearest(px, w, h, channels, w, h) == px

    identity()


def test_resize_image_batch_real_png(spark):
    # 8x8 constant image -> 3x2 PNG out, still valid, same color
    px = bytes([200, 40, 90] * 64)
    df = spark.createDataFrame(
        [(1, encode_png(px, 8, 8, 3))], "media_id long, payload binary"
    )
    out = resize_image_batch(df, width=3, height=2).collect()[0]
    w, h, ch, rpx = decode_png(bytes(out["payload"]))
    assert (w, h, ch) == (3, 2, 3)
    assert rpx == bytes([200, 40, 90] * 6)
    assert out["width"] == 3 and out["height"] == 2
