"""Executed Kafka-path tests via the file-backed emulator (S1-S3, S9).

Asserts parity between the Kafka-schema replay -> parse_toot_values
pipeline and read_jsonl_events on the same records, plus Kafka replay
semantics: offset assignment, bounded ranges, failOnDataLoss, and a
real streaming read with stateful aggregation downstream.
"""

from __future__ import annotations

import json

import pytest

from projet_5spar_sparkstreaming_spark.sources.files import (
    parse_toot_values,
    read_jsonl_events,
)
from projet_5spar_sparkstreaming_spark.sources.kafka_fake import (
    expire_segments,
    produce_topic,
    read_fake_kafka_batch,
    read_fake_kafka_stream,
)


def _toot(i, user, ts="2025-10-03T18:14:46Z", text="hello #spark"):
    return json.dumps(
        {
            "id": str(i),
            "created_at": ts,
            "language": "en",
            "text": text,
            "hashtags": ["spark"],
            "user_id": str(i % 3),
            "username": user,
            "display_name": user.title(),
            "favourites": 1,
            "reblogs": 0,
            "replies": 0,
            "url": f"https://masto.test/@{user}/{i}",
        }
    )


@pytest.fixture(scope="module")
def topic_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("kafka") / "toots-topic"
    lines = [_toot(i, f"user_{i % 5}") for i in range(40)]
    records = spark.createDataFrame([(ln,) for ln in lines], "value string")
    produce_topic(
        spark, records, str(d), topic="toots", n_partitions=4, key_col="value"
    )
    return str(d), lines


def test_kafka_schema_exact(spark, topic_dir):
    d, _ = topic_dir
    df = read_fake_kafka_batch(spark, d)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("key", "binary"),
        ("value", "binary"),
        ("topic", "string"),
        ("partition", "int"),
        ("offset", "bigint"),
        ("timestamp", "timestamp"),
        ("timestampType", "int"),
    ]
    assert df.count() == 40


def test_offsets_contiguous_per_partition(spark, topic_dir):
    d, _ = topic_dir
    rows = read_fake_kafka_batch(spark, d).select("partition", "offset").collect()
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r["partition"], []).append(r["offset"])
    assert set(by_part) == {0, 1, 2, 3}
    for offs in by_part.values():
        assert sorted(offs) == list(range(len(offs)))


def test_parse_parity_with_jsonl(spark, topic_dir, tmp_path):
    d, lines = topic_dir
    via_kafka = parse_toot_values(read_fake_kafka_batch(spark, d))
    p = tmp_path / "same.jsonl"
    p.write_text("\n".join(lines))
    via_file = read_jsonl_events(spark, str(p))
    assert via_kafka.schema == via_file.schema

    def norm(rows):
        return {
            tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in rows
        }

    k = norm(via_kafka.collect())
    f = norm(via_file.collect())
    assert k == f and len(k) == 40


def test_bounded_offset_replay(spark, topic_dir):
    d, _ = topic_dir
    # partition 0 only, offsets [1, 3) -> exactly 2 records
    got = read_fake_kafka_batch(
        spark,
        d,
        starting_offsets={0: 1},
        ending_offsets={0: 3},
    ).collect()
    assert [r["offset"] for r in sorted(got, key=lambda r: r["offset"])] == [1, 2]
    assert all(r["partition"] == 0 for r in got)


def test_append_continues_offsets(spark, tmp_path):
    d = str(tmp_path / "t2")
    rec = lambda n: spark.createDataFrame(  # noqa: E731
        [(_toot(i, "amy"),) for i in range(n)], "value string"
    )
    produce_topic(spark, rec(6), d, topic="t2", n_partitions=2)
    produce_topic(spark, rec(4), d, topic="t2", n_partitions=2)
    rows = read_fake_kafka_batch(spark, d).groupBy("partition").count().collect()
    assert sorted((r["partition"], r["count"]) for r in rows) == [(0, 5), (1, 5)]
    offs = read_fake_kafka_batch(spark, d).select("partition", "offset").collect()
    for p in (0, 1):
        assert sorted(r["offset"] for r in offs if r["partition"] == p) == [0, 1, 2, 3, 4]


def test_fail_on_data_loss(spark, tmp_path):
    d = str(tmp_path / "t3")
    records = spark.createDataFrame([(_toot(i, "bob"),) for i in range(8)], "value string")
    produce_topic(spark, records, d, topic="t3", n_partitions=1)
    expire_segments(d, keep_min_offset=4)
    # failOnDataLoss=true: requested offset 0 was expired -> error
    with pytest.raises(ValueError, match="data loss"):
        read_fake_kafka_batch(
            spark, d, starting_offsets={0: 0}, fail_on_data_loss=True
        ).collect()
    # failOnDataLoss=false: clamp to what's retained (offsets 4..7)
    got = read_fake_kafka_batch(spark, d, starting_offsets={0: 0}).collect()
    assert sorted(r["offset"] for r in got) == [4, 5, 6, 7]


def test_streaming_read_with_stateful_agg(spark, topic_dir, tmp_path):
    from pyspark.sql import functions as F

    d, _ = topic_dir
    parsed = parse_toot_values(read_fake_kafka_stream(spark, d))
    counts = parsed.groupBy("username").count()
    q = (
        counts.writeStream.format("memory")
        .queryName("kafka_fake_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["username"]: r["count"]
        for r in spark.sql("SELECT * FROM kafka_fake_counts").collect()
    }
    assert got == {f"user_{i}": 8 for i in range(5)}


def test_fail_on_data_loss_fully_expired_partition(spark, tmp_path):
    """Total expiry of a partition must still trip failOnDataLoss: with
    no surviving rows there is no per-partition min(offset), so the
    check falls back to the persisted retention floor (the real broker
    reports log-start-offset even for empty partitions)."""
    d = str(tmp_path / "topic_total_expiry")
    rows = spark.createDataFrame([(f"m{i}",) for i in range(8)], ["value"])
    produce_topic(spark, rows, d, topic="t", n_partitions=1)
    expire_segments(d, keep_min_offset=8)  # nothing survives
    with pytest.raises(ValueError, match="data loss"):
        read_fake_kafka_batch(
            spark, d, starting_offsets={0: 4}, fail_on_data_loss=True
        )


def test_produce_topic_casts_string_timestamp(spark, tmp_path):
    """Producing with a string timestamp column must record a TIMESTAMP
    segment — a string-typed column would poison every later
    KAFKA_SCHEMA read of the topic."""
    d = str(tmp_path / "topic_str_ts")
    rows = spark.createDataFrame(
        [("m0", "2025-10-03 18:14:46"), ("m1", "2025-10-03 18:15:46")],
        ["value", "created_at"],
    )
    produce_topic(
        spark, rows, d, topic="t", n_partitions=1, timestamp_col="created_at"
    )
    got = read_fake_kafka_batch(spark, d)
    assert got.schema["timestamp"].dataType.typeName() == "timestamp"
    assert got.count() == 2


def test_produce_topic_integral_timestamp_is_epoch_millis(spark, tmp_path):
    """Integral timestamp columns are epoch MILLISECONDS (Kafka's
    CreateTime unit); a bare cast would read them as epoch seconds."""
    d = str(tmp_path / "topic_ms_ts")
    millis = 1759515286000  # 2025-10-03T18:14:46Z
    rows = spark.createDataFrame([("m0", millis)], "value string, ts bigint")
    produce_topic(spark, rows, d, topic="t", n_partitions=1, timestamp_col="ts")
    got = read_fake_kafka_batch(spark, d).selectExpr(
        "unix_millis(timestamp) AS ms"
    ).collect()
    assert got[0].ms == millis


def test_produce_topic_rejects_unsupported_timestamp_type(spark, tmp_path):
    d = str(tmp_path / "topic_bad_ts")
    rows = spark.createDataFrame([("m0", 1.5)], "value string, ts double")
    with pytest.raises(TypeError, match="unsupported type"):
        produce_topic(
            spark, rows, d, topic="t", n_partitions=1, timestamp_col="ts"
        )


def test_expire_segments_floor_is_monotonic(spark, tmp_path):
    """A later expiry call with a LOWER floor must not regress the
    persisted retention floor (a real broker's log-start-offset is
    monotonic) — the failOnDataLoss check must keep firing."""
    d = str(tmp_path / "topic_floor_monotonic")
    rows = spark.createDataFrame([(f"m{i}",) for i in range(8)], ["value"])
    produce_topic(spark, rows, d, topic="t", n_partitions=1)
    expire_segments(d, keep_min_offset=6)
    expire_segments(d, keep_min_offset=2)  # would regress the floor
    with pytest.raises(ValueError, match="data loss"):
        read_fake_kafka_batch(
            spark, d, starting_offsets={0: 4}, fail_on_data_loss=True
        )
