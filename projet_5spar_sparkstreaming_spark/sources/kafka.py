"""Kafka sources/sinks (batch replay + streaming subscribe).

Covers S1-S3 from SURVEY.md section 2.1 (reference: src/spark_stream.py:65-72
streaming subscribe with startingOffsets=latest; src/batch_load_raw_fix.py:35-43
bounded earliest->latest replay; Test.ipynb failOnDataLoss=false).

The spark-sql-kafka connector jar is not available in this container, so
these exact builders are exercised for plan construction only — but the
ENTIRE downstream surface executes for real against
``sources/kafka_fake.py``, a file-backed emulator producing the
connector's exact output schema with Kafka replay semantics
(per-partition offsets, bounded ranges, failOnDataLoss). The parse path
(``parse_toot_values``) is one shared function across the real
builders, the emulator, and the file source, so executed-emulator
parity covers the code the real connector would feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projet_5spar_sparkstreaming_spark.sources.files import parse_toot_values


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Unbounded Kafka source -> parsed toot DataFrame."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .load()
    )
    return parse_toot_values(raw)


def read_kafka_batch(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """Bounded replay of a topic (backfill path)."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
    )
    return parse_toot_values(raw)
