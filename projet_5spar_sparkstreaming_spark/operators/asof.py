"""As-of (point-in-time) join — for each left row, the most recent right
row with right.ts <= left.ts per key.

Spark has no native as-of join; the classic scalable construction is
union + single shuffle + forward-fill (no range join, no per-row
probing): tag both sides, sort each key partition by (ts, side), and
carry the last non-null right payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.

Cost: ONE shuffle on the key (same as any windowed op), sort within
partitions — at 100 TB this is strictly cheaper than the naive
"join on key then filter ts and rank" plan, which materializes every
(left, right) key pair before pruning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    prefix: str = "right_",
    tie_break: Sequence[str] | None = None,
) -> DataFrame:
    """Left rows + columns ``prefix+c`` holding the as-of right values
    (null when no right row precedes). Ties on ts: right row sorts
    before the left row (ts <= semantics, inclusive).

    ``tie_break``: right payload columns ordering MULTIPLE right rows
    that share the as-of timestamp — the greatest tie-break wins (it
    sorts last, so the forward-fill carries it). Without it, which of
    the tied right rows is picked is shuffle-order-dependent.
    """
    on = list(on)
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    # The right payload travels as ONE struct so the forward-fill is
    # atomic per right row — filling columns independently would stitch
    # together values from different right rows when payloads hold nulls.
    payload = F.struct(*[F.col(c) for c in right_value_cols])
    payload_type = (
        right.select(payload.alias("__p")).schema["__p"].dataType
    )
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        payload.alias("__payload"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    tie_order = [
        # nulls (left rows) first: among same-ts rows every right row
        # must still sort before the left row it can match
        F.col("__payload").getField(c).asc_nulls_first()
        for c in (tie_break or [])
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), *tie_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__filled", F.last("__payload", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__side") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *lcols,
        *[
            F.col("__filled").getField(c).alias(f"{prefix}{c}")
            for c in right_value_cols
        ],
    )
