"""Top-k-per-group with deterministic tie-break.

Generalizes the reference's top-hashtag-per-day (reference:
src/batch_analytics.py:47-49 — row_number over (day, cnt desc, hashtag
asc), keep rn=1) into the engine's reusable analytic-window operator
(SURVEY.md section 2.6 W2).

Scale note: row_number over a partitioned window is a single shuffle on
the group key with per-partition sort — no global sort. Skewed groups
are handled by AQE; for pathological skew pre-aggregate per (group,
salt) first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top ``k`` rows per group under a total order.

    ``order_cols`` must define a total order (include a tie-break key,
    e.g. ``[F.desc("cnt"), F.asc("hashtag")]``) or results are
    nondeterministic under Spark's partial ordering.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")
