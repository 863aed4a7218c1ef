"""Keyed upsert into a parquet table (MERGE semantics, T9 completion).

The reference appended blindly to Postgres (reference:
src/spark_stream.py:117) — retries duplicated rows. The streaming layer
already gives per-batch idempotency (streaming/sinks.py); this module
adds *keyed* upsert for batch maintenance jobs: update rows win by key
(optionally by a version column), rewrite staged then swapped.

On plain parquet a keyed merge is a rewrite of affected data; a
transactional table format (Delta/Iceberg — not in this container)
would make it a metadata operation. The operator API is format-agnostic
so swapping the storage layer later doesn't touch callers. At 100 TB,
restrict the rewrite to partitions containing updated keys.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_parquet(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    version_col: str | None = None,
) -> None:
    """MERGE ``updates`` into the parquet table at ``table_path`` by key.

    With ``version_col``, the highest version wins and ties go to the
    update; without it, updates always replace existing rows. The write
    is staged to a sibling temp dir and swapped in, so readers never
    see a half-written table and a failed job leaves the target intact.

    Swap caveat: the two-rename swap has a window where the target path
    is briefly absent, and directory rename is not atomic on object
    stores. Fine for a local filesystem; at 100 TB the swap must be a
    metastore pointer flip or a table-format (Iceberg/Delta-style)
    commit, with the merge plan above unchanged.
    """
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
    if os.path.exists(table_path):
        old = f"{table_path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(table_path, old)
        os.rename(staging, table_path)
        shutil.rmtree(old)
    else:
        os.rename(staging, table_path)
