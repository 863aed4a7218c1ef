"""Tests: sentiment pipeline (M5) and multimodal binary plumbing."""

from __future__ import annotations

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
