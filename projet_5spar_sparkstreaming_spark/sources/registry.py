"""Format-dispatching table IO: parquet / orc / json / csv.

The reference could only move rows through Kafka and JDBC; the engine
treats file formats as interchangeable behind one read/write call so
pipelines can land curated outputs wherever the consumer needs them.
Parquet (or ORC) is the 100 TB default — columnar, predicate pushdown,
splittable; JSON/CSV are interchange edges (schema required on read:
inference costs a full extra scan and guesses types).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_COLUMNAR = {"parquet", "orc"}
_TEXTUAL = {"json", "csv"}
SUPPORTED_FORMATS = _COLUMNAR | _TEXTUAL


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    csv_header: bool = True,
) -> None:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(SUPPORTED_FORMATS)}")
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", str(csv_header).lower())
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    csv_header: bool = True,
) -> DataFrame:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(SUPPORTED_FORMATS)}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in _TEXTUAL:
        raise ValueError(f"{fmt} read requires an explicit schema (no inference scans)")
    if fmt == "csv":
        reader = reader.option("header", str(csv_header).lower())
    return reader.load(path)
