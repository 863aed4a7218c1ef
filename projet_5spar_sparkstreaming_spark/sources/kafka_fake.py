"""File-backed Kafka topic emulator (executes S1-S3 + S9 without a broker).

The spark-sql-kafka connector jar cannot be loaded in this container, so
`sources/kafka.py` could never run. This module records and replays
topics in the connector's EXACT output schema —

    key binary, value binary, topic string, partition int,
    offset bigint, timestamp timestamp, timestampType int

— so the downstream parse pipeline (``parse_toot_values``, shared with
the real Kafka builders) executes for real, batch and streaming, with
Kafka's replay semantics: per-partition monotonically increasing
offsets, bounded offset-range reads, and ``failOnDataLoss`` behavior
when requested offsets have been expired.

Producer parity: ``produce_topic`` replaces the reference's ingest edge
(reference: src/mastodon_to_kafka.py:69-137) — records with a key go to
``hash(key) % n`` (Kafka's sticky-key contract), keyless records
round-robin.

Scale note: a real deployment uses the Kafka connector; this emulator
exists so every line of the parse/clean/window pipeline downstream of
the source is executed in tests. Segments are plain parquet, so replay
reads get columnar pruning for free.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)
_KAFKA_COLS = ("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")


def _existing_next_offsets(spark: SparkSession, path: str) -> DataFrame | None:
    """Per-partition next offset to assign, from already-recorded segments."""
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
    ):
        return None
    return (
        spark.read.schema(KAFKA_SCHEMA)
        .parquet(path)
        .groupBy("partition")
        .agg((F.max("offset") + F.lit(1)).alias("_base"))
    )


def produce_topic(
    spark: SparkSession,
    records: DataFrame,
    path: str,
    topic: str,
    n_partitions: int = 4,
    value_col: str = "value",
    key_col: str | None = None,
    timestamp_col: str | None = None,
) -> None:
    """Append records to a recorded topic (the ingest-producer edge, S9).

    ``records`` needs a string/binary ``value_col``; ordering within the
    produced batch follows a monotonic file order, offsets continue from
    whatever is already recorded. One parquet file per call per
    partition keeps segment files append-only, like log segments.
    """
    rec = records.withColumn("_seq", F.monotonically_increasing_id())
    if key_col is not None:
        key = F.col(key_col).cast("string")
        part = F.pmod(F.xxhash64(key), F.lit(n_partitions)).cast("int")
        key_bin = key.cast("binary")
    else:
        # Round-robin needs a CONTIGUOUS sequence; monotonically
        # increasing ids have gaps between input partitions. A global
        # row_number is a single-partition window — acceptable for a
        # fixture producer, never a scale path.
        rec = rec.withColumn(
            "_gid", F.row_number().over(Window.orderBy("_seq")) - 1
        )
        part = F.pmod(F.col("_gid"), F.lit(n_partitions)).cast("int")
        key_bin = F.lit(None).cast("binary")
    if timestamp_col is not None:
        # explicit cast: producing from a string column (e.g. raw
        # ISO-8601 created_at) must not record a string-typed segment
        # that poisons every later KAFKA_SCHEMA read. Integral columns
        # are epoch MILLIS (Kafka's CreateTime unit) — a bare cast
        # would read them as epoch seconds, ~50,000 years out.
        dt = dict(records.dtypes)[timestamp_col]
        if dt in ("int", "bigint", "smallint", "tinyint"):
            ts = F.timestamp_millis(F.col(timestamp_col))
        elif dt == "string" or dt.startswith(("timestamp", "date")):
            ts = F.col(timestamp_col).cast("timestamp")
        else:
            raise TypeError(
                f"produce_topic: timestamp_col {timestamp_col!r} has "
                f"unsupported type {dt}; pass a timestamp/date, an "
                "ISO-8601 string, or integral epoch-milliseconds"
            )
    else:
        ts = F.current_timestamp()
    staged = rec.select(
        key_bin.alias("key"),
        F.col(value_col).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        F.row_number().over(Window.partitionBy(part).orderBy("_seq")).alias("_rn"),
        ts.alias("timestamp"),
        F.lit(0).alias("timestampType"),  # 0 = CreateTime
    )
    base = _existing_next_offsets(spark, path)
    if base is None:
        staged = staged.withColumn("_base", F.lit(0).cast("bigint"))
    else:
        staged = staged.join(F.broadcast(base), "partition", "left").fillna(
            {"_base": 0}
        )
    out = staged.select(
        *[
            (F.col("_rn") - 1 + F.col("_base")).alias("offset")
            if c == "offset"
            else F.col(c)
            for c in _KAFKA_COLS
        ]
    )
    # One append-only FLAT segment file per produce call (like a log
    # segment): write via a temp dir, then move the single part file in.
    # Flat files keep batch and stream readers trivial (no recursive
    # listing) and make each produce call one new visible file — i.e.
    # one micro-batch for the streaming reader.
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f"_tmp-{uuid.uuid4().hex[:12]}")
    out.coalesce(1).write.parquet(tmp)
    part_file = next(
        f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
    )
    os.replace(
        os.path.join(tmp, part_file),
        os.path.join(path, f"segment-{uuid.uuid4().hex[:12]}.parquet"),
    )
    shutil.rmtree(tmp)


def expire_segments(path: str, keep_min_offset: int) -> None:
    """Delete recorded rows below an offset floor (log retention kicking
    in) — the precondition for exercising ``failOnDataLoss``. Rewrites
    segments; fine for fixtures, not a scale path."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    table = ds.dataset(
        [
            os.path.join(root, f)
            for root, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]
    ).to_table()
    kept = table.filter(ds.field("offset") >= keep_min_offset)
    # persist the retention floor: a FULLY expired partition leaves no
    # rows to derive its earliest offset from, and failOnDataLoss must
    # still fire for it (the real broker reports log-start-offset even
    # for empty partitions)
    import json

    # monotonic, like a real broker's log-start-offset: a later call
    # with a lower floor must not regress the persisted retention and
    # re-weaken the failOnDataLoss check
    retention_file = os.path.join(path, "_retention.json")
    if os.path.exists(retention_file):
        with open(retention_file) as fh:
            keep_min_offset = max(
                keep_min_offset, json.load(fh).get("earliest_floor", 0)
            )
    with open(retention_file, "w") as fh:
        json.dump({"earliest_floor": keep_min_offset}, fh)
    for root, _, fs in os.walk(path):
        for f in fs:
            if f.endswith(".parquet"):
                os.remove(os.path.join(root, f))
    # µs timestamps: arrow round-trips Spark's INT96/µs as ns otherwise,
    # which Spark's vectorized reader then rejects.
    pq.write_table(
        kept,
        os.path.join(path, "segment-compacted.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )


def read_fake_kafka_batch(
    spark: SparkSession,
    path: str,
    starting_offsets: dict[int, int] | str = "earliest",
    ending_offsets: dict[int, int] | str = "latest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Bounded replay with Kafka's offset-range contract (S2/S3).

    Offsets dicts map partition -> offset (start inclusive, end
    exclusive, like the connector). With ``fail_on_data_loss=True`` a
    requested start below the earliest retained offset raises; with
    False it clamps to what is still recorded (the connector's
    warn-and-continue behavior).

    DOCUMENTED DIVERGENCE from spark-sql-kafka: partitions absent from
    an offsets dict are EXCLUDED here (a convenient partition filter
    for fixtures), while the real connector REFUSES partial offset maps
    ("you must specify all TopicPartitions"). Code that will run
    against the real connector must list every partition (sentinels:
    the connector's -2 = earliest / -1 = latest).
    """
    raw = spark.read.schema(KAFKA_SCHEMA).parquet(path)
    if isinstance(starting_offsets, dict):
        if fail_on_data_loss:
            import json

            floor = 0
            ret = os.path.join(path, "_retention.json")
            if os.path.exists(ret):
                with open(ret) as fh:
                    floor = json.load(fh)["earliest_floor"]
            earliest = {
                r["partition"]: r["m"]
                for r in raw.groupBy("partition").agg(F.min("offset").alias("m")).collect()
            }
            for p, off in starting_offsets.items():
                # a partition with NO surviving rows falls back to the
                # retention floor — without it, total expiry of a
                # partition would silently PASS the very check that
                # exists to catch expiry
                eff = earliest.get(p, floor)
                if off < eff:
                    raise ValueError(
                        f"data loss: partition {p} requested offset {off} "
                        f"< earliest retained {eff} (failOnDataLoss=true)"
                    )
        cond = None
        for p, off in starting_offsets.items():
            this = (F.col("partition") == p) & (F.col("offset") >= off)
            cond = this if cond is None else cond | this
        raw = raw.filter(cond)
    if isinstance(ending_offsets, dict):
        cond = None
        for p, off in ending_offsets.items():
            this = (F.col("partition") == p) & (F.col("offset") < off)
            cond = this if cond is None else cond | this
        raw = raw.filter(cond)
    return raw


def read_fake_kafka_stream(spark: SparkSession, path: str) -> DataFrame:
    """Unbounded replay of a recorded topic (S1): the connector's schema
    through ``readStream`` so stateful downstream stages run for real."""
    return spark.readStream.schema(KAFKA_SCHEMA).parquet(path)
