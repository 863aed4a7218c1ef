"""Materialize derived tables to a partitioned parquet warehouse.

The reference overwrote whole Postgres tables per run (reference:
src/batch_analytics.py:26-52). Here derived tables land as parquet,
day-partitioned where a day key exists — the layout that makes
partition pruning work at 100 TB (SCALE.md storage layer). The
"materialize once, derive many" caching of the reference
(repartition+cache+count, src/batch_analytics.py:21-22) becomes: cache
the cleaned input, fan out the suite, write each result once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# derived tables that carry a day column -> partition by it
_DAY_PARTITIONED = {"daily_toot_counts": "day", "hashtags_per_day_counts": "day", "top_hashtag_per_day": "day"}


def write_table(
    df: DataFrame,
    warehouse: str,
    name: str,
    partition_col: str | None = None,
    bloom_filters: bool = False,
    compression: str | None = None,
) -> str:
    """Write a derived table; ``bloom_filters=True`` adds parquet bloom
    filters, the third pruning tier after partition pruning and min/max
    row-group stats — min/max is useless for high-cardinality unsorted
    keys (every row group spans the whole domain), a bloom skips row
    groups for equality probes at ~1 byte per distinct value.

    Table-level (all columns): parquet-mr's per-column
    ``parquet.bloom.filter.enabled#col`` keys do not round-trip through
    this writer version, so the selective form is: project the
    point-lookup table to its key+payload columns and write that.
    """
    path = os.path.join(warehouse, name)
    writer = df.write.mode("overwrite")
    if bloom_filters:
        writer = writer.option("parquet.bloom.filter.enabled", "true")
    if compression is not None:
        # snappy (default) optimizes CPU; zstd typically halves cold
        # storage + scan bytes — the right default for a 100 TB archive
        # tier read less often than it is stored
        writer = writer.option("compression", compression)
    if partition_col and partition_col in df.columns:
        writer = writer.partitionBy(partition_col)
    writer.parquet(path)
    return path


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Save ``df`` as a bucketed managed table (``saveAsTable``).

    Bucketing is the 100 TB co-location tool: two tables bucketed the
    same way on the same key join with ZERO exchange — the shuffle is
    paid once at write time and amortized over every subsequent join or
    aggregation on that key. Sorting within buckets additionally removes
    the join's sort step. ``n_buckets`` should be sized so one bucket of
    the big table fits an executor core (e.g. 100 TB / 200 MB ~ 500k is
    too many files — bucket the *join key space*, not bytes: 4-16k
    buckets is the practical cluster range; tests use small counts).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)


def compact_table(
    spark,
    path: str,
    target_rows_per_file: int,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into fewer, right-sized files.

    The small-files problem is the silent killer of 100 TB scans: a
    table appended by thousands of micro-batches ends up with millions
    of KB-sized files, and the scan pays per-file open/footer costs that
    dwarf the I/O. Compaction = read, repartition to ceil(rows/target),
    optionally sort within partitions (so min/max row-group stats become
    selective and data skipping works), then atomically swap the
    directory. Returns the new file count.

    On a real cluster the swap would be a metastore partition pointer
    flip; here it is a staged directory rename (same pattern as
    sinks.upsert_parquet). That two-rename swap leaves a window where
    the path is briefly absent and is not atomic on object stores —
    acceptable locally, but the 100 TB deployment must commit through a
    metastore or table format (Iceberg/Delta-style) instead.
    """
    import math
    import shutil

    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / max(1, target_rows_per_file)))
    if sort_cols:
        # range-partition + sort: files get DISJOINT min/max ranges on
        # the sort key, so a point/range predicate skips whole files via
        # footer stats, not just row groups
        compacted = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        compacted = df.repartition(n_files)
    staged = path.rstrip("/") + ".__compact_staging__"
    shutil.rmtree(staged, ignore_errors=True)
    compacted.write.mode("overwrite").parquet(staged)
    old = path.rstrip("/") + ".__compact_old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )


def materialize_suite(clean: DataFrame, warehouse: str) -> dict[str, str]:
    """Cache the cleaned input once, write all derived tables.

    Returns {table_name: path}. The cache is released afterwards.
    """
    from projet_5spar_sparkstreaming_spark.plans.toots import analytics_suite

    clean = clean.cache()
    try:
        clean.count()  # materialize before the fan-out (reference pattern)
        suite = analytics_suite(clean)
        return {
            name: write_table(df, warehouse, name, _DAY_PARTITIONED.get(name))
            for name, df in suite.items()
        }
    finally:
        clean.unpersist()
