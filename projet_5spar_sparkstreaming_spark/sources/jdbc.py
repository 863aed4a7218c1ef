"""JDBC source/sink wrappers (S4-S7 in SURVEY.md section 2.1).

The reference reads and writes Postgres with single-partition,
row-at-a-time JDBC everywhere (reference: src/batch_analytics.py:16,
src/spark_stream.py:117) — its dominant cost. These wrappers add the
scale knobs the reference lacked: partitioned reads
(partitionColumn/numPartitions) and batched writes. No Postgres exists in
this container, but the full S4-S7 surface is EXECUTED in tests against
an embedded DuckDB database through its JDBC driver (found in the local
maven/coursier cache by `find_duckdb_jdbc_jar`) — write, append,
overwrite, plain + partitioned read all round-trip for real; see
tools/jdbc_roundtrip.py and tests/test_jdbc.py.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def find_duckdb_jdbc_jar() -> str | None:
    """Locate a DuckDB JDBC driver jar in the usual local artifact caches.

    Searches coursier, ivy, and maven caches under $HOME. Returns the
    first match or None; callers (tests) should skip when absent. The
    jar is ~66 MB so it is deliberately not vendored into the repo.
    """
    home = os.path.expanduser("~")
    for root in (
        f"{home}/.cache/coursier",
        f"{home}/.ivy2",
        f"{home}/.m2",
    ):
        hits = glob.glob(f"{root}/**/duckdb_jdbc*.jar", recursive=True)
        if hits:
            return sorted(hits)[0]
    return None


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    custom_schema: str | None = None,
) -> DataFrame:
    """Partition-parallel JDBC scan (the reference used 1 partition).

    ``custom_schema`` ("colA BIGINT, colB DOUBLE") pins Spark-side types
    where the driver's metadata is imprecise — e.g. DuckDB reports
    BIGINT columns as unsigned, which Spark would widen to decimal(20,0).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if custom_schema is not None:
        reader = reader.option("customSchema", custom_schema)
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
    truncate: bool = False,
) -> None:
    """JDBC sink with batched inserts (append/overwrite, S5/S6).

    ``truncate=True`` makes overwrite TRUNCATE the existing table
    instead of DROP+CREATE — required for engines (e.g. embedded
    DuckDB) where a table created on the driver's connection is not
    yet visible to the per-partition insert connections, and generally
    cheaper since the schema survives. Pre-create the table with
    :func:`jdbc_execute` when targeting such engines.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("truncate", "true" if truncate else "false")
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def jdbc_execute(
    spark: SparkSession,
    url: str,
    sql: str,
    driver: str | None = None,
) -> None:
    """Run one DDL/DML statement over JDBC on a short-lived connection.

    Spark's JDBC writer cannot issue arbitrary DDL; the reference did
    its DDL out-of-band in psql. This routes a single statement through
    the session JVM's ``java.sql.DriverManager`` so table setup (e.g.
    ``CREATE TABLE IF NOT EXISTS``) stays on the same JDBC driver and
    is committed and visible before Spark's writer opens its own
    connections.
    """
    jvm = spark._jvm  # noqa: SLF001 — py4j JVM access is the supported route
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()
