"""Y4M video container tests: round-trips per colorspace, malformed
streams, and the REAL demux paths through the Spark operators."""

from __future__ import annotations

import numpy as np
import pytest

from projet_5spar_sparkstreaming_spark.multimodal.binary import (
    decode_video_stats,
    sample_video_frames,
)
from projet_5spar_sparkstreaming_spark.multimodal.y4m import (
    encode_y4m,
    iter_y4m_frames,
    parse_y4m_header,
)


def _frames(n, w, h, seed=3):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, w * h, dtype=np.uint8).tobytes() for _ in range(n)]


@pytest.mark.parametrize("colorspace", ["C420", "C422", "C444", "Cmono"])
def test_roundtrip_every_colorspace(colorspace):
    w, h, n = 16, 8, 5
    frames = _frames(n, w, h)
    data = encode_y4m(frames, w, h, fps=(25, 1), colorspace=colorspace)
    pw, ph, fps, cs, _ = parse_y4m_header(data)
    assert (pw, ph, fps, cs) == (w, h, (25, 1), colorspace)
    decoded = list(iter_y4m_frames(data))
    assert len(decoded) == n
    for orig, got in zip(frames, decoded):
        assert got[: w * h] == orig  # luma plane round-trips exactly


def test_not_y4m_rejected():
    with pytest.raises(ValueError, match="signature"):
        parse_y4m_header(b"definitely not video")


def test_truncated_frame_rejected():
    data = encode_y4m(_frames(2, 8, 8), 8, 8)
    with pytest.raises(ValueError, match="truncated"):
        list(iter_y4m_frames(data[:-10]))


def test_sample_video_frames_real_demux(spark):
    # 10 frames, every_n=3 -> frame indices 0, 3, 6, 9; payload is the
    # true luma plane of each sampled frame
    w, h, n = 8, 8, 10
    frames = _frames(n, w, h, seed=11)
    df = spark.createDataFrame(
        [(1, encode_y4m(frames, w, h))], "media_id long, payload binary"
    )
    out = sample_video_frames(df, every_n=3).collect()
    got = {r["frame_idx"]: bytes(r["frame"]) for r in out}
    assert sorted(got) == [0, 3, 6, 9]
    for idx, frame in got.items():
        assert frame == frames[idx]


def test_decode_image_batch_y4m_first_frame_features(spark):
    # the unified decode path feature-extracts video payloads from the
    # first frame's luma (keyframe thumbnail): constant-luma frame ->
    # constant features
    from projet_5spar_sparkstreaming_spark.multimodal.binary import (
        decode_image_batch,
    )

    frames = [bytes([200] * 64), bytes([10] * 64)]  # second frame ignored
    df = spark.createDataFrame(
        [(1, encode_y4m(frames, 8, 8))], "media_id long, payload binary"
    )
    out = decode_image_batch(df).collect()[0]
    assert out["features"] == pytest.approx([200 / 255.0] * 16)


def test_decode_video_stats_real_metadata(spark):
    w, h, n = 16, 8, 6
    frames = [bytes([v] * (w * h)) for v in (0, 50, 100, 150, 200, 250)]
    df = spark.createDataFrame(
        [(7, encode_y4m(frames, w, h, fps=(25, 1)))], "media_id long, payload binary"
    )
    row = decode_video_stats(df).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (w, h, n)
    assert row["fps"] == 25.0 and row["duration_ms"] == 240  # 6/25s
    assert row["mean_luma"] == pytest.approx(125.0)


def test_decode_video_stats_zero_fps_denominator(spark):
    # F25:0 parses fine; stats must degrade (fps 0, duration 0), not
    # ZeroDivisionError the whole task — the ValueError-only contract
    w, h = 8, 8
    frames = [bytes([9] * (w * h))]
    df = spark.createDataFrame(
        [(1, encode_y4m(frames, w, h, fps=(25, 0)))], "media_id long, payload binary"
    )
    row = decode_video_stats(df).collect()[0]
    assert row["fps"] == 0.0 and row["duration_ms"] == 0
    assert row["n_frames"] == 1
