"""Time-bucketed rollups (A3-A5 in SURVEY.md section 2.5).

One operator covers the reference's hourly/daily/minute-window counts
(reference: src/batch_analytics.py:25-29 date_trunc/to_date;
src/spark_stream.py:122-123 window('1 minute')). The same expression
works batch and streaming — streaming adds a watermark upstream
(streaming/windows.py).

Scale note: a time-bucket groupBy map-side combines before the shuffle,
so the shuffle carries one row per (bucket, key-combo) per task — tiny.
With day-partitioned parquet, partition pruning makes bucket-range
queries scan only matching days.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(col: Column | str, granularity: str) -> Column:
    """'hour'/'day'/'minute'/... -> truncated event-time bucket column."""
    c = F.col(col) if isinstance(col, str) else col
    if granularity == "day":
        return F.to_date(c)
    return F.date_trunc(granularity, c)


def time_bucket_counts(
    df: DataFrame,
    ts_col: str,
    granularity: str,
    extra_keys: Sequence[str] = (),
    bucket_name: str | None = None,
) -> DataFrame:
    """count(*) per (time bucket, *extra_keys)."""
    name = bucket_name or granularity
    bucket = time_bucket(ts_col, granularity).alias(name)
    return df.groupBy(bucket, *extra_keys).agg(F.count("*").alias("cnt"))


def tumbling_window_counts(
    df: DataFrame, ts_col: str, duration: str, extra_keys: Sequence[str] = ()
) -> DataFrame:
    """Tumbling-window counts with the window struct flattened to
    window_start/window_end (reference: src/spark_stream.py:119-131)."""
    agg = df.groupBy(F.window(ts_col, duration), *extra_keys).agg(
        F.count("*").alias("cnt")
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *extra_keys,
        "cnt",
    )
