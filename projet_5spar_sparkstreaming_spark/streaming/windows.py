"""Watermarked stateful window aggregations.

Upgrades the reference's per-batch window recomputation (reference:
src/spark_stream.py:119-131 — tumbling windows recomputed inside
foreachBatch and appended per batch_id, so overlapping rows accumulate)
to true incremental state: ``withWatermark`` + ``groupBy(window())``
(SURVEY.md section 2.10 T3/T4, the biggest semantic gap).

The same expressions run on bounded DataFrames too — batch/stream
parity (T8) is a test invariant, not an aspiration.

Scale note: streaming state lives in the state store keyed by (window,
extra keys); the watermark bounds state size. Without it (reference
behavior) state grows unboundedly or windows double-count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    duration: str,
    watermark: str = "10 minutes",
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Tumbling event-time window counts with late-data bound.

    Output columns: window_start, window_end, *extra_keys, cnt — the
    reference's streamed_toot_counts shape minus the batch_id tag
    (provenance comes from the sink, not the operator).
    """
    agg = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration), *extra_keys)
        .agg(F.count("*").alias("cnt"))
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *extra_keys,
        "cnt",
    )


def windowed_distinct_counts(
    df: DataFrame,
    ts_col: str,
    duration: str,
    distinct_col: str,
    watermark: str = "10 minutes",
    rsd: float = 0.02,
) -> DataFrame:
    """Tumbling-window distinct cardinality via approx_count_distinct.

    Exact COUNT(DISTINCT) is unsupported in streaming (it would need
    every seen value kept in state); the HLL sketch keeps O(1/rsd^2)
    bytes of state per window and merges incrementally — the only shape
    that holds on an unbounded 100 TB/day stream. Batch parity is
    approximate by construction (rsd contract, tested like
    approx_count_distinct).
    """
    agg = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration))
        .agg(F.approx_count_distinct(distinct_col, rsd=rsd).alias("n_distinct"))
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_distinct",
    )


def sliding_window_counts(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    watermark: str = "10 minutes",
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Sliding windows (T6 — absent in reference, engine parity-plus)."""
    agg = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration, slide), *extra_keys)
        .agg(F.count("*").alias("cnt"))
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *extra_keys,
        "cnt",
    )


def session_window_counts(
    df: DataFrame,
    ts_col: str,
    gap: str,
    key_cols: Sequence[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: activity bursts per key separated by >= gap."""
    agg = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *key_cols)
        .agg(F.count("*").alias("cnt"))
    )
    return agg.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *key_cols,
        "cnt",
    )
