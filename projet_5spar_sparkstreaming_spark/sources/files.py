"""File sources: parquet tables and JSON-lines event streams.

Replaces the reference's Kafka-or-JDBC-only ingest (reference:
src/spark_stream.py:65-72, src/batch_load_raw_fix.py:35-43) with
columnar-first file sources. Parquet is the 100 TB path: predicate
pushdown, column pruning and partition pruning are free, unlike the
reference's full-table JDBC scans (SURVEY.md section 4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.schema import TESTDATA_TABLES, TOOT_SCHEMA


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS) — Spark has no ns timestamp type."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:  # noqa: BLE001 — directory datasets etc.: no special handling
        return []


from contextlib import contextmanager


@contextmanager
def _nanos_as_long(spark: SparkSession):
    """Scope ``spark.sql.legacy.parquet.nanosAsLong`` to one read.

    The conf is captured when the DataFrame is created (schema
    inference), so restoring it immediately afterwards does not affect
    that DataFrame's later execution — but it keeps the SHARED session
    honest: a later direct ``spark.read.parquet`` of ns-timestamp data
    gets the standard PARQUET_TYPE_ILLEGAL error instead of silently
    yielding raw longs.
    """
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if before is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, before)


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Schema comes from the parquet footer.

    TIMESTAMP(NANOS) columns (which Spark rejects: PARQUET_TYPE_ILLEGAL)
    are read as raw nanos via ``spark.sql.legacy.parquet.nanosAsLong``
    and truncated to microsecond timestamps — same truncation DuckDB
    applies, so oracle comparisons agree.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_cols(path)
    # Engine invariant: UTC session time. The driver may hand us its own
    # session; event-time semantics (and DuckDB-oracle agreement) depend
    # on LTZ timestamps rendering as UTC wall-clock. Same reason no-tz
    # microsecond parquet timestamps must infer as LTZ, not NTZ.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if not ns_cols:
        return spark.read.parquet(path)
    with _nanos_as_long(spark):
        df = spark.read.parquet(path)
    for c in ns_cols:
        # integer div (not double /): int64 nanos exceed double's 2^53 mantissa
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under evolving
    schemas (columns added over time). ``mergeSchema`` unions the file
    footers instead of trusting a random one; rows from files that
    predate a column read as NULL. At 100 TB, prefer pinning the merged
    schema in a metastore and passing ``.schema(...)`` explicitly —
    footer-merging lists every file's footer up front. This helper is
    the schema-drift-safe default for paths without a catalog entry.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark.read.option("mergeSchema", "true").parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the star schema as a dict of DataFrames (lazy; no scan yet)."""
    return {n: read_parquet_table(spark, sf_dir, n) for n in names}


def read_parquet_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The same table as an unbounded stream (file source).

    Applies the identical TIMESTAMP(NANOS) handling as the batch reader
    so stream and batch plans see one schema (stream/batch parity T8).
    """
    import pyspark.sql.types as T

    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_cols(path)
    batch_schema = read_parquet_table(spark, sf_dir, name).schema
    # file-stream sources take a directory; select our table via glob
    reader = spark.readStream.option("pathGlobFilter", f"{name}.parquet")
    if not ns_cols:
        return reader.schema(batch_schema).parquet(sf_dir)
    raw_fields = [
        T.StructField(f.name, T.LongType() if f.name in ns_cols else f.dataType, f.nullable)
        for f in batch_schema.fields
    ]
    with _nanos_as_long(spark):
        df = reader.schema(T.StructType(raw_fields)).parquet(sf_dir)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def read_jsonl_events(spark: SparkSession, path: str) -> DataFrame:
    """Parse a JSON-lines toot capture into the canonical schema.

    Mirrors the Kafka-value parse path (reference: src/spark_stream.py:74-78):
    ``from_json`` with explicit schema, PERMISSIVE — malformed lines (the
    reference's sample.jsonl contains plain-text junk lines) become
    all-null structs which the cleaning layer drops via the id null-guard.
    Reading as ``text`` + ``from_json`` rather than ``spark.read.json``
    keeps one shared parse path for files and Kafka values.
    """
    raw = spark.read.text(path)
    return (
        raw.select(F.from_json(F.col("value"), TOOT_SCHEMA).alias("data"))
        .select("data.*")
    )


def parse_toot_values(values: DataFrame, col: str = "value") -> DataFrame:
    """Shared JSON-value parse used by the Kafka batch + stream paths."""
    return (
        values.select(F.from_json(F.col(col).cast("string"), TOOT_SCHEMA).alias("data"))
        .select("data.*")
    )
