"""Stream-stream joins with watermark-bounded state.

Beyond the reference (it had no joins at all, SURVEY.md section 2.4):
joining two unbounded streams requires bounding how long each side's
rows wait for a match — both sides carry watermarks and the join
condition carries a time bound, so the state store can evict.

State size: O(rows within the time bound per key), independent of
stream length — the property that makes this viable on an unbounded
100 TB/day stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_bound: str = "0 seconds",
    upper_bound: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows whose event times satisfy
    ``left_ts - lower_bound <= right_ts <= left_ts + upper_bound``
    on equal keys. Column names must be disjoint apart from ``on``;
    rename upstream if needed.

    Both sides are explicitly aliased so SELF-joins (two filtered views
    of one stream) resolve correctly: with ``lw[k] == rw[k]`` on a
    shared lineage Spark's ambiguity resolution can silently bind both
    references to one side, and on outer joins the kept key column can
    be the null-padded one. Output key columns coalesce left-then-right
    so unmatched rows keep their real key under EVERY outer type (a
    left-only projection would null the keys of right-outer's unmatched
    right rows).
    """
    lw = left.withWatermark(left_ts, watermark).alias("__ij_l")
    rw = right.withWatermark(right_ts, watermark).alias("__ij_r")
    key_cond = [F.col(f"__ij_l.{k}") == F.col(f"__ij_r.{k}") for k in on]
    time_cond = [
        F.col(f"__ij_r.{right_ts}")
        >= F.col(f"__ij_l.{left_ts}") - F.expr(f"INTERVAL {lower_bound}"),
        F.col(f"__ij_r.{right_ts}")
        <= F.col(f"__ij_l.{left_ts}") + F.expr(f"INTERVAL {upper_bound}"),
    ]
    joined = lw.join(rw, key_cond + time_cond, how)
    out = [
        F.coalesce(F.col(f"__ij_l.{k}"), F.col(f"__ij_r.{k}")).alias(k)
        for k in on
    ]
    out += [F.col(f"__ij_l.{c}").alias(c) for c in left.columns if c not in on]
    out += [F.col(f"__ij_r.{c}").alias(c) for c in right.columns if c not in on]
    return joined.select(*out)
