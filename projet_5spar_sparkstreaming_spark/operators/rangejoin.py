"""Batch time-range join via time-binning.

Naive range joins (`a.ts BETWEEN b.ts AND b.ts + gap`) degenerate to a
broadcast-nested-loop or a per-key cross product. The scalable pattern
bins both sides into gap-width buckets: a right row within ``max_gap``
AFTER a left row lives in the left row's bin or the next one, so the
range join becomes an equi-join on (key, bin) over two bin copies,
followed by the exact bound filter. Shuffle volume: 2x the right side —
independent of match fan-out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Inner-join pairs where ``left_ts <= right_ts <= left_ts + max_gap``
    on equal keys. Column names must be disjoint apart from ``on``.
    """
    on = list(on)
    gap = F.lit(max_gap_seconds)
    lbin = (F.unix_timestamp(F.col(left_ts)) / gap).cast("long")
    rbin = (F.unix_timestamp(F.col(right_ts)) / gap).cast("long")
    l_binned = left.withColumn("__bin", lbin)
    # right row matches left rows in its own bin and the previous one
    r_binned = right.withColumn("__rbin", rbin).withColumn(
        "__bin", F.explode(F.array(F.col("__rbin"), F.col("__rbin") - 1))
    ).drop("__rbin")
    joined = l_binned.join(r_binned, on + ["__bin"])
    # exact bound at full timestamp precision (unix_timestamp truncates
    # to seconds and is used for binning only — a superset)
    return (
        joined.filter(
            (F.col(right_ts) >= F.col(left_ts))
            & (
                F.col(right_ts)
                <= F.col(left_ts) + F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
            )
        )
        .drop("__bin")
    )
