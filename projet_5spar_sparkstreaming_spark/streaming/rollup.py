"""Continuous aggregates: streaming incremental rollup materialization.

The hypertable/continuous-aggregate pattern: a stream maintains a
materialized time-bucket rollup incrementally, exactly-once, without
ever rescanning history. Design (the scalable shape, not a read-modify-
write loop):

- each micro-batch writes its PARTIAL aggregate rows (bucket, count,
  sum) into a ``batch_id=N`` partition via dynamic partition overwrite
  — a replayed batch replaces its own partition, so the sink stays
  exactly-once under retries (same mechanism as
  ``sinks.idempotent_parquet_sink``);
- readers merge partials with a tiny final aggregation over
  (buckets x batches) rows — orders of magnitude smaller than the
  event stream;
- a compaction (``plans/materialize.compact_table``) can periodically
  fold old partials; correctness never depends on it.

Additive aggregates only (count/sum/min/max — the rollups the
reference computes); avg is derived at read time from sum/count.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from projet_5spar_sparkstreaming_spark.streaming.sinks import foreach_batch_sink


def incremental_rollup_sink(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    bucket: str = "day",
    value_col: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Maintain a time-bucket rollup incrementally from a stream.

    Writes per-batch partial rows (bucket, cnt, total) under
    ``batch_id=N`` partitions. ``bucket`` is any ``date_trunc`` unit
    (day/hour/...). Read the merged rollup with ``read_rollup``.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        aggs = [F.count(F.lit(1)).alias("cnt")]
        if value_col is not None:
            aggs.append(F.sum(F.col(value_col)).alias("total"))
        partial = (
            batch_df.withColumn("bucket", F.date_trunc(bucket, F.col(ts_col)))
            .groupBy("bucket")
            .agg(*aggs)
            .withColumn("batch_id", F.lit(batch_id))
        )
        (
            partial.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    os.makedirs(out_dir, exist_ok=True)
    return foreach_batch_sink(stream, _write, checkpoint_dir, trigger)


def read_rollup(
    spark: SparkSession, out_dir: str, total_type: str | None = "double"
) -> DataFrame:
    """Merge the partial rollup rows into the final rollup. The merge
    input is (buckets x batches) rows — tiny next to the raw stream.

    Before the first micro-batch commits, the sink's pre-created dir is
    empty and schema inference would raise UNABLE_TO_INFER_SCHEMA; an
    explicit schema keeps "no data yet" an empty rollup, not an error.
    ``total_type`` describes the sink's ``total`` column for that
    fallback — the SQL type of ``sum(value_col)`` ("double" for
    double/float inputs, "bigint" for integral ones), or ``None`` for a
    count-only rollup (``value_col=None`` at the sink) — so the no-data
    and with-data schemas match.
    """
    # probe by ATTEMPTING the read instead of a driver-local os.walk —
    # works identically on HDFS/S3, where a local directory scan would
    # wrongly report "no data yet" forever
    from pyspark.errors import AnalysisException

    try:
        partials = spark.read.parquet(out_dir)
        partials.schema  # force schema inference now
    except AnalysisException:
        fields = "bucket timestamp, cnt bigint"
        aggs = [F.sum("cnt").alias("cnt")]
        if total_type is not None:
            fields += f", total {total_type}"
            aggs.append(F.sum("total").alias("total"))
        return spark.createDataFrame([], fields).groupBy("bucket").agg(*aggs)
    aggs = [F.sum("cnt").alias("cnt")]
    if "total" in partials.columns:
        aggs.append(F.sum("total").alias("total"))
    return partials.groupBy("bucket").agg(*aggs)
