"""Snapshot diff (CDC-style): classify rows as added / removed /
changed between two versions of a keyed table.

One full-outer hash join on the key — shuffle volume is O(rows) on the
key column plus only the compared columns, so at 100 TB you project the
snapshots down to (key, compare_cols) before calling. For very wide
compare sets, pass a single precomputed digest column instead (same
shape as fingerprint_dedup).

The reference has no CDC surface; this is engine-completeness for
incremental training-data pipelines (detect which documents changed
between crawls and re-embed only those).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change_type values, in output order
ADDED, REMOVED, CHANGED, UNCHANGED = "added", "removed", "changed", "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | Sequence[str],
    compare_cols: Sequence[str],
    keep_unchanged: bool = False,
) -> DataFrame:
    """Rows keyed by ``key`` with a ``change_type`` column.

    Output columns: key columns, then ``<col>_old`` / ``<col>_new`` for
    each compared column, then ``change_type``. ``changed`` means the
    key exists on both sides but at least one compared column differs
    (null-safe comparison).
    """
    keys = [key] if isinstance(key, str) else list(key)
    # explicit presence markers: a compared column may be NULL in a row
    # that nonetheless exists on that side
    o = old.select(
        *keys,
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    # join on the key columns only; outer join keeps one key column set
    joined = o.join(n, on=keys, how="full_outer")

    any_diff = F.lit(False)
    for c in compare_cols:
        any_diff = any_diff | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))

    change = (
        F.when(F.col("__in_old").isNull(), F.lit(ADDED))
        .when(F.col("__in_new").isNull(), F.lit(REMOVED))
        .when(any_diff, F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    out = joined.withColumn("change_type", change).drop("__in_old", "__in_new")
    if not keep_unchanged:
        out = out.filter(F.col("change_type") != UNCHANGED)
    return out
