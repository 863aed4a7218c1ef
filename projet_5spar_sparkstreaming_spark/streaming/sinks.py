"""Streaming sinks: foreachBatch driver + idempotent micro-batch writes.

The reference's foreachBatch sink blindly appends to JDBC per micro-batch
(reference: src/spark_stream.py:107-144) — a retried batch writes its
rows twice (T9). The engine's sinks are idempotent: each micro-batch
write is keyed by batch_id so replays overwrite instead of duplicate.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def foreach_batch_sink(
    stream_df: DataFrame,
    process: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger: dict | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """writeStream.foreachBatch with checkpointing (S8 parity —
    reference: src/spark_stream.py:147-154).

    ``trigger`` e.g. {"processingTime": "10 seconds"} or
    {"availableNow": True} for bounded catch-up runs.
    """
    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def idempotent_parquet_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Exactly-once-per-batch parquet sink.

    Each micro-batch lands in ``batch_id=N`` partition via dynamic
    partition overwrite: a replayed batch replaces its own partition
    instead of appending duplicates. The batch_id partition column
    doubles as the reference's provenance tag (lit(batch_id),
    reference: src/spark_stream.py:125,139).
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    os.makedirs(out_dir, exist_ok=True)
    return foreach_batch_sink(stream_df, _write, checkpoint_dir, trigger)


def idempotent_jdbc_sink(
    stream_df: DataFrame,
    url: str,
    table: str,
    checkpoint_dir: str,
    properties: dict[str, str] | None = None,
    driver: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Exactly-once-per-batch JDBC sink — the reference's stream->
    Postgres loop (reference: src/spark_stream.py:107-144) made
    replay-safe: each micro-batch DELETEs its own batch_id rows before
    inserting, so a batch retried after a crash replaces itself instead
    of duplicating. delete+insert per batch_id is the portable JDBC
    idempotency pattern (a MERGE would need engine-specific SQL).

    Executed in tests against embedded DuckDB over its JDBC driver
    (tools/jdbc_stream_roundtrip.py); the table must pre-exist with a
    ``batch_id BIGINT`` column (see ``jdbc_execute``) for engines whose
    DDL is not visible across concurrently open connections.
    """
    from projet_5spar_sparkstreaming_spark.sources.jdbc import (
        jdbc_execute,
        write_jdbc,
    )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        jdbc_execute(
            batch_df.sparkSession,
            url,
            f'DELETE FROM {table} WHERE "batch_id" = {int(batch_id)}',
            driver=driver,
        )
        write_jdbc(
            batch_df.withColumn("batch_id", F.lit(batch_id)),
            url,
            table,
            mode="append",
            properties=properties,
        )

    return foreach_batch_sink(stream_df, _write, checkpoint_dir, trigger)
