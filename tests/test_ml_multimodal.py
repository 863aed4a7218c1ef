"""Tests: sentiment pipeline (M5) and multimodal binary plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.ml.sentiment import train_sentiment
from projet_5spar_sparkstreaming_spark.multimodal.binary import (
    decode_image_batch,
    extract_image_features,
    media_metadata,
    sample_video_frames,
)

POS = [
    "i love this great wonderful product",
    "amazing excellent happy experience",
    "fantastic great joy love it",
    "wonderful amazing best day",
    "love love great excellent",
    "happy joy best fantastic",
]
NEG = [
    "i hate this terrible awful product",
    "horrible bad sad experience",
    "awful terrible worst day",
    "hate hate bad horrible",
    "sad worst horrible awful",
    "bad terrible hate worst",
]


def test_sentiment_train_and_classify(spark):
    train = spark.createDataFrame(
        [(t, 1) for t in POS] + [(t, 0) for t in NEG], ["text", "label"]
    )
    model = train_sentiment(train)
    test = spark.createDataFrame(
        [("great wonderful love",), ("terrible awful hate",)], ["text"]
    )
    out = {r["text"]: r["sentiment"] for r in model.classify(test).collect()}
    assert out["great wonderful love"] == 1.0
    assert out["terrible awful hate"] == 0.0
    # original columns preserved, internal feature cols dropped
    assert set(model.classify(test).columns) == {"text", "sentiment"}


def test_sentiment_classify_survives_observation_use(spark):
    """Regression: after ANY Observation runs on the session (the
    engine's index writes ride row counts on observe metrics), an LR
    model that kept its trainingSummary fails task serialization
    (summary -> SparkSession -> populated ObservationManager, Spark
    4.1). train_sentiment drops the summary so scoring stays legal in
    the same application as an index build/append."""
    from pyspark.sql import Observation

    obs = Observation()
    spark.range(10).observe(obs, F.count(F.lit(1)).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()
    assert obs.get["n"] == 10
    train = spark.createDataFrame(
        [(t, 1) for t in POS] + [(t, 0) for t in NEG], ["text", "label"]
    )
    model = train_sentiment(train)
    test = spark.createDataFrame(
        [("great wonderful love",), ("terrible awful hate",)], ["text"]
    )
    out = {r["text"]: r["sentiment"] for r in model.classify(test).collect()}
    assert out == {"great wonderful love": 1.0, "terrible awful hate": 0.0}


def _media_df(spark):
    rows = [(i, bytes(range(i, i + 64))) for i in range(5)]
    return spark.createDataFrame(rows, ["media_id", "payload"])


def test_media_metadata_native(spark):
    df = _media_df(spark).withColumn("meta", media_metadata("payload", "image", "png"))
    row = df.select("meta.*").collect()[0]
    assert row["media_type"] == "image"
    assert row["size_bytes"] == 64


def test_decode_batch_shape(spark):
    out = decode_image_batch(_media_df(spark)).collect()
    assert len(out) == 5
    assert all(len(r["features"]) == 16 for r in out)
    assert all(r["n_bytes"] == 64 for r in out)
    # deterministic: same payload -> same features
    again = decode_image_batch(_media_df(spark)).collect()
    assert sorted(map(repr, out)) == sorted(map(repr, again))


def test_extract_features_norm(spark):
    out = extract_image_features(_media_df(spark)).collect()
    assert all(r["feature_norm"] > 0 for r in out)


def test_video_frame_sampling_expansion(spark):
    frames = sample_video_frames(_media_df(spark), every_n=4).collect()
    assert len(frames) == 20  # 5 media x 4 frames
    assert {r["frame_idx"] for r in frames} == {0, 1, 2, 3}
    assert all(isinstance(r["frame"], (bytes, bytearray)) for r in frames)


def test_resize_batch_normalizes_payload_size(spark):
    from projet_5spar_sparkstreaming_spark.multimodal.binary import resize_image_batch

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"0123456789abcdef0123"))],
        "media_id long, payload binary",
    )
    out = resize_image_batch(df, width=4, height=3).collect()
    assert {r["media_id"] for r in out} == {1, 2}
    for r in out:
        assert len(r["payload"]) == 12 and r["width"] == 4 and r["height"] == 3
    # deterministic: same input -> same bytes
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_image_batch(df, 4, 3).collect()}
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == again


def test_decode_audio_batch_real_wav(spark):
    """REAL WAV decode: stdlib-encoded PCM fixtures round-trip through
    the Arrow operator with exact header metadata and known features."""
    import io
    import math
    import struct
    import wave

    from projet_5spar_sparkstreaming_spark.multimodal.binary import (
        decode_audio_batch,
    )

    def make_wav(rate, freq, n_frames, amplitude=10000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            frames = b"".join(
                struct.pack(
                    "<h", int(amplitude * math.sin(2 * math.pi * freq * i / rate))
                )
                for i in range(n_frames)
            )
            w.writeframes(frames)
        return buf.getvalue()

    rows = [
        (1, make_wav(8000, 440, 8000)),   # 1s of 440 Hz at 8 kHz
        (2, make_wav(16000, 100, 4000)),  # 0.25s of 100 Hz at 16 kHz
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_audio_batch(df).collect()}
    assert out[1]["sample_rate"] == 8000 and out[1]["duration_ms"] == 1000
    assert out[2]["sample_rate"] == 16000 and out[2]["duration_ms"] == 250
    # a sine's RMS is amplitude/sqrt(2); generous tolerance for int rounding
    assert out[1]["rms"] == pytest.approx(10000 / 2**0.5, rel=0.01)
    # 440 Hz crosses zero ~880 times/s -> rate 880/8000 = 0.11
    assert out[1]["zero_crossing_rate"] == pytest.approx(0.11, abs=0.005)
    assert out[2]["zero_crossing_rate"] == pytest.approx(2 * 100 / 16000, abs=0.005)
    assert all(r["n_channels"] == 1 for r in out.values())
