"""JDBC source/sink wrappers (S4-S7 in SURVEY.md section 2.1).

The reference reads and writes Postgres with single-partition,
row-at-a-time JDBC everywhere (reference: src/batch_analytics.py:16,
src/spark_stream.py:117) — its dominant cost. These wrappers add the
scale knobs the reference lacked: partitioned reads
(partitionColumn/numPartitions) and batched writes. No Postgres exists in
this container; plan-level construction only is exercised in tests, and
Parquet is the primary storage path for the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Partition-parallel JDBC scan (the reference used 1 partition)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
) -> None:
    """JDBC sink with batched inserts (append/overwrite, S5/S6)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
