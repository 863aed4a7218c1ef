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


def _encode_jpeg_420_dri(img: "np.ndarray", restart_interval: int) -> bytes:
    """Test-local encoder for the decoder paths the main encoder never
    emits: 4:2:0 chroma subsampling (2x2 Y blocks + downsampled Cb/Cr
    per MCU) and restart markers (DRI). Built from the codec module's
    own primitives so the bitstream conventions stay in one place."""
    import struct

    from projet_5spar_sparkstreaming_spark.multimodal import jpeg as J

    h, w, _ = img.shape
    assert h % 16 == 0 and w % 16 == 0, "test images are MCU-aligned"
    r, g, b = img[..., 0].astype(float), img[..., 1].astype(float), img[..., 2].astype(float)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    # 2x2 average downsample for chroma
    cb_d = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr_d = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    qt_l = J._scaled_quant(J._QUANT_LUMA, 90)
    qt_c = J._scaled_quant(J._QUANT_CHROMA, 90)
    out = bytearray(b"\xff\xd8")
    for tq, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(qt[z]) for z in J.ZIGZAG)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tcth, bits, vals in (
        (0x00, J._DC_LUMA_BITS, J._DC_LUMA_VALS),
        (0x10, J._AC_LUMA_BITS, J._AC_LUMA_VALS),
        (0x01, J._DC_CHROMA_BITS, J._DC_CHROMA_VALS),
        (0x11, J._AC_CHROMA_BITS, J._AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tcth])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    dc_l = J._build_canonical_codes(J._DC_LUMA_BITS, J._DC_LUMA_VALS)
    ac_l = J._build_canonical_codes(J._AC_LUMA_BITS, J._AC_LUMA_VALS)
    dc_c = J._build_canonical_codes(J._DC_CHROMA_BITS, J._DC_CHROMA_VALS)
    ac_c = J._build_canonical_codes(J._AC_CHROMA_BITS, J._AC_CHROMA_VALS)

    writer = J._BitWriter()
    preds = {"y": 0, "cb": 0, "cr": 0}
    mcus_x, mcus_y = w // 16, h // 16
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                out += writer.out
                writer = J._BitWriter()
                out += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                preds = {"y": 0, "cb": 0, "cr": 0}
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    block = y[y0 : y0 + 8, x0 : x0 + 8]
                    preds["y"] = J._encode_block(
                        writer, block, qt_l.astype(float), preds["y"], dc_l, ac_l
                    )
            cy0, cx0 = my * 8, mx * 8
            preds["cb"] = J._encode_block(
                writer, cb_d[cy0 : cy0 + 8, cx0 : cx0 + 8], qt_c.astype(float),
                preds["cb"], dc_c, ac_c,
            )
            preds["cr"] = J._encode_block(
                writer, cr_d[cy0 : cy0 + 8, cx0 : cx0 + 8], qt_c.astype(float),
                preds["cr"], dc_c, ac_c,
            )
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("restart_interval", [0, 1, 2])
def test_decode_420_subsampling_with_restart_markers(restart_interval):
    """Decoder paths the main encoder can't produce: 4:2:0 MCUs (chroma
    upsampling) and DRI restart markers (predictor reset + byte
    alignment). Smooth gradient stays within quantization+subsampling
    error."""
    h, w = 16, 48  # 3 MCUs across -> restarts actually fire
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 // (w - 1)),
            (yy * 255 // (h - 1)),
            ((xx + yy) * 255 // (w + h - 2)),
        ],
        axis=-1,
    ).astype(np.uint8)
    data = _encode_jpeg_420_dri(img, restart_interval)
    rw, rh, rch, px = decode_jpeg(data)
    assert (rw, rh, rch) == (w, h, 3)
    out = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(int)
    err = np.abs(out - img.astype(int))
    assert err.mean() <= 6.0 and err.max() <= 40, (err.mean(), err.max())


def test_codecs_raise_only_valueerror_on_corruption():
    """Exception contract shared by all three codecs: ANY corruption of
    a valid stream either decodes or raises ValueError — never an
    IndexError/KeyError/zlib.error that would fail a whole Spark task
    on one bad payload. 300 random corruptions per codec, fixed seed."""
    import random

    from projet_5spar_sparkstreaming_spark.multimodal.png import (
        decode_png,
        encode_png,
    )
    from projet_5spar_sparkstreaming_spark.multimodal.y4m import (
        encode_y4m,
        iter_y4m_frames,
    )

    img = np.random.RandomState(0).randint(0, 256, (16, 16, 3), dtype=np.uint8)
    rng = random.Random(1)
    cases = [
        ("jpeg", encode_jpeg(img.tobytes(), 16, 16, 3), decode_jpeg),
        ("png", encode_png(img.tobytes(), 16, 16, 3), decode_png),
        ("y4m", encode_y4m([bytes(256)] * 3, 16, 16), lambda d: list(iter_y4m_frames(d))),
    ]
    for name, base, decode in cases:
        for _ in range(300):
            data = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                data[rng.randrange(2, len(data))] = rng.randrange(256)
            try:
                decode(bytes(data))
            except ValueError:
                pass  # the contract
            # anything else propagates and fails the test


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
