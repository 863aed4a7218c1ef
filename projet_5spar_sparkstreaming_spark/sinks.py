"""Keyed upsert into a parquet table (MERGE semantics, T9 completion).

The reference appended blindly to Postgres (reference:
src/spark_stream.py:117) — retries duplicated rows. The streaming layer
already gives per-batch idempotency (streaming/sinks.py); this module
adds *keyed* upsert for batch maintenance jobs: update rows win by key
(optionally by a version column), rewrite staged then swapped.

Multi-writer protocol (Delta/Iceberg are not installable here, so the
table carries a minimal optimistic-concurrency commit of its own — the
write-audit-publish pattern):

- every committed table state has a VERSION TOKEN in ``<table>.version``
- a writer snapshots the token BEFORE reading the current table state
- commit = under a lock directory (``os.mkdir`` is atomic), re-read the
  token; if it changed since the snapshot another writer committed a
  state this merge never saw — the commit ABORTS with
  ``ConcurrentWriteError`` and the target is left exactly as the winner
  wrote it (no silent clobber, no partial state)
- on success the swap happens inside the lock and a fresh token is
  published

On plain parquet a keyed merge is a rewrite of affected data; a
transactional table format would make it a metadata operation. The
operator API is format-agnostic so swapping the storage layer later
doesn't touch callers. At 100 TB, restrict the rewrite to partitions
containing updated keys and replace the lock directory with the object
store's conditional-put (the token compare is unchanged).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this writer's snapshot and its
    commit attempt; the losing merge must be retried from the new state."""


def _version_path(table_path: str) -> str:
    return f"{table_path}.version"


def read_table_version(table_path: str) -> str | None:
    """Current commit token, or None for a never-committed table."""
    try:
        with open(_version_path(table_path)) as f:
            return f.read().strip()
    except FileNotFoundError:
        return None


def _publish_version(table_path: str) -> str:
    token = uuid.uuid4().hex
    tmp = f"{_version_path(table_path)}.tmp.{token[:8]}"
    with open(tmp, "w") as f:
        f.write(token)
    os.replace(tmp, _version_path(table_path))  # atomic on POSIX
    return token


class _TableLock:
    """mkdir-based mutex: atomic on POSIX filesystems; bounded wait."""

    def __init__(self, table_path: str, timeout_s: float = 30.0) -> None:
        self.path = f"{table_path}.lock"
        self.timeout_s = timeout_s

    def __enter__(self):
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                os.mkdir(self.path)
                return self
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(f"could not acquire {self.path}")
                time.sleep(0.05)

    def __exit__(self, *exc):
        os.rmdir(self.path)
        return False


def upsert_parquet(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    version_col: str | None = None,
    expected_version: str | None = "auto",
) -> str:
    """MERGE ``updates`` into the parquet table at ``table_path`` by key;
    returns the new commit token.

    With ``version_col``, the highest version wins and ties go to the
    update; without it, updates always replace existing rows. The write
    is staged to a sibling temp dir and swapped in, so readers never
    see a half-written table and a failed job leaves the target intact.

    Concurrency: ``expected_version="auto"`` (default) snapshots the
    table's commit token before reading it and aborts with
    ``ConcurrentWriteError`` if any other writer commits first
    (compare-and-swap under the table lock). Pass a token from
    ``read_table_version`` to span a longer read-modify-write, or
    ``None`` to skip the check (last-writer-wins, single-writer jobs).

    Swap caveat: the two-rename swap has a window where the target path
    is briefly absent, and directory rename is not atomic on object
    stores. Fine for a local filesystem; at 100 TB the swap must be a
    metastore pointer flip or a table-format commit — the merge plan
    AND the token CAS above it are unchanged.
    """
    check = expected_version is not None
    token0 = (
        read_table_version(table_path) if expected_version == "auto" else expected_version
    )

    tagged_updates = updates.withColumn("__gen", F.lit(1))
    if os.path.exists(table_path):
        current = spark.read.parquet(table_path).withColumn("__gen", F.lit(0))
        combined = current.unionByName(tagged_updates)
    else:
        combined = tagged_updates

    order = [F.col("__gen").desc()]
    if version_col is not None:
        order = [F.col(version_col).desc_nulls_last(), F.col("__gen").desc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    merged = (
        combined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__gen")
    )

    staging = f"{table_path}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)

    # staging is written OUTSIDE the lock (keeps the critical section to
    # renames), so any failure to acquire/commit — e.g. a lock timeout
    # behind a crashed writer — must remove the staged full table copy
    # or every retry leaks one
    try:
        with _TableLock(table_path):
            if check and read_table_version(table_path) != token0:
                raise ConcurrentWriteError(
                    f"{table_path}: table version changed since snapshot "
                    f"{token0!r}; merge was computed against a stale state — "
                    "re-read and retry"
                )
            if os.path.exists(table_path):
                old = f"{table_path}__old_{uuid.uuid4().hex[:8]}"
                os.rename(table_path, old)
                try:
                    os.rename(staging, table_path)
                except BaseException:
                    # the live table was already moved aside; restore it
                    # so a failed swap never leaves table_path missing
                    os.rename(old, table_path)
                    raise
                shutil.rmtree(old)
            else:
                os.rename(staging, table_path)
            return _publish_version(table_path)
    except BaseException:
        # staging is only deleted while table_path is intact (pre-swap
        # failures, or post-restore above) — never the sole merged copy
        shutil.rmtree(staging, ignore_errors=True)
        raise


def write_jsonl(
    df: DataFrame,
    out_dir: str,
    partition_by: Sequence[str] | None = None,
    compression: str | None = "gzip",
    shards: int | None = None,
) -> None:
    """Export a DataFrame as JSON-Lines shards — the delivery format
    training pipelines actually consume (one JSON object per line,
    optionally gzip, optionally hive-partitioned by e.g. lang/split).

    ``shards`` bounds the files per hive partition VALUE: rows
    repartition on the partition columns plus a bounded per-row salt,
    so each value spreads across up to ``shards`` tasks/files instead
    of collapsing into one (a bare repartition on the partition columns
    alone hashes every row of a value into a single task — one huge
    file and no skew bound). Without ``partition_by``, ``shards`` is
    the total file count. None keeps the upstream partitioning (at
    100 TB you want natural partitioning, not a repartition).
    Struct/array columns serialize as nested JSON; timestamps as
    ISO-8601 — Spark's native JSON writer, so the scan-side schema
    round-trips via ``spark.read.json``.
    """
    if shards is not None:
        # Hash ROW CONTENT, not monotonically_increasing_id: a
        # non-deterministic salt re-evaluates differently when a stage is
        # recomputed after a fetch failure / speculative retry, and
        # repartitioning on it can silently drop or duplicate rows (the
        # SPARK-23207 hazard). Content-hashed rows always land in the same
        # partition on recompute. Map columns are not hashable by
        # xxhash64 — at ANY nesting depth (array<map<...>>, struct with a
        # map field) — so hash the JSON form of any map-containing column.
        # Backtick-quote names so dots stay literal (a bare F.col('a.b')
        # parses as nested-field access and fails resolution).
        from pyspark.sql.types import ArrayType, MapType, StructType

        def _contains_map(dt) -> bool:
            if isinstance(dt, MapType):
                return True
            if isinstance(dt, ArrayType):
                return _contains_map(dt.elementType)
            if isinstance(dt, StructType):
                return any(_contains_map(f.dataType) for f in dt.fields)
            return False

        def _ref(name: str):
            return F.col("`" + name.replace("`", "``") + "`")

        row_hash = F.xxhash64(*[
            F.to_json(_ref(f.name)) if _contains_map(f.dataType)
            else _ref(f.name)
            for f in df.schema.fields
        ])
        if partition_by:
            salt = F.pmod(row_hash, F.lit(shards))
            df = df.withColumn("__shard_salt", salt).repartition(
                shards * 4, *partition_by, "__shard_salt"
            ).drop("__shard_salt")
        else:
            # hash- not round-robin-repartition for the same determinism
            df = df.repartition(shards, row_hash)
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(out_dir)
