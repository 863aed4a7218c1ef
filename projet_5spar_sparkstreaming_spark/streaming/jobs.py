"""The reference streaming job, re-expressed (reference:
src/spark_stream.py — Kafka toots -> parse -> clean -> three sinks).

Every transformation is the shared batch operator; the stream is just an
unbounded input bound to the same expressions (T8 stream/batch parity).
Differences from the reference, by design:

- true watermarked windows instead of per-batch recomputation (T3)
- nulls stay null instead of current_timestamp() masking (T5)
- sinks are idempotent per micro-batch (T9)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.functions.timestamps import normalize_timestamp
from projet_5spar_sparkstreaming_spark.functions.text import (
    keyword_filter,
    keywords_rlike_pattern,
)
from projet_5spar_sparkstreaming_spark.schema import TOOT_SCHEMA
from projet_5spar_sparkstreaming_spark.streaming.windows import windowed_counts


def read_toot_file_stream(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines directory as an unbounded source (test/replay edge;
    swap for sources.kafka.read_kafka_stream in production)."""
    raw = spark.readStream.format("text").load(path)
    return (
        raw.select(F.from_json(F.col("value"), TOOT_SCHEMA).alias("data"))
        .select("data.*")
    )


def clean_toot_stream(
    raw: DataFrame,
    language: str | None = None,
    keywords: Sequence[str] | None = None,
) -> DataFrame:
    """Parse-side cleaning: null guards, trim, timestamp normalization,
    optional language/keyword filters (reference: src/spark_stream.py:94-109).
    Stream-safe (no window/sort): identical to batch clean minus dedup,
    which streams do with dropDuplicatesWithinWatermark."""
    out = (
        raw.filter(
            F.col("id").isNotNull()
            & F.col("username").isNotNull()
            & F.col("text").isNotNull()
        )
        .withColumn("text", F.trim("text"))
        .filter(F.col("text") != "")
        .withColumn("created_at", normalize_timestamp("created_at"))
    )
    if language:
        out = out.filter(F.col("language") == language)
    if keywords:
        # same escaping contract as keyword_filter — one shared builder
        tag_pattern = keywords_rlike_pattern(keywords)
        out = out.filter(
            keyword_filter("text", keywords)
            | F.exists("hashtags", lambda h: F.lower(h).rlike(tag_pattern))
        )
    return out


def posts_projection(clean: DataFrame) -> DataFrame:
    """mastodon_posts shape (reference: src/spark_stream.py:111-116)."""
    return clean.select(
        F.col("username"),
        F.col("text").alias("content"),
        F.col("created_at").alias("ts"),
    )


def minute_counts(clean: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """streamed_toot_counts shape (reference: src/spark_stream.py:119-131),
    with real incremental state."""
    return windowed_counts(clean, "created_at", "1 minute", watermark)


def enrich_with_dim(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich an unbounded stream with a bounded
    dimension table. The static side is broadcast so each micro-batch
    joins map-side with no shuffle of the stream and no streaming state.
    At scale the dim is re-read per micro-batch — for slowly-changing
    dims, point it at a parquet path and overwrite the path atomically.
    (The reference joins nothing stream-side; this is engine surface.)
    """
    return stream.join(F.broadcast(dim), on, how)


def avg_length_by_user(clean: DataFrame) -> DataFrame:
    """avg_toot_length_by_user shape (reference: src/spark_stream.py:133-144).
    Streaming aggregation without windows -> complete/update output mode.

    State-growth caveat: an unwindowed global aggregation holds one
    state row per distinct username FOREVER (reference semantics,
    reproduced deliberately). On an unbounded high-cardinality stream
    prefer the windowed form (windows.py, extra_keys=["username"]) or a
    TTL'd stateful op (stateful.py) — see SCALE.md.
    """
    return (
        clean.withColumn("__len", F.length("text"))
        .groupBy("username")
        .agg(F.round(F.avg("__len"), 6).alias("avg_length"))
    )
