"""Streaming deduplication (T7 — absent in reference; its dedup was
batch-only, reference: src/batch_clean_historical.py).

``dropDuplicatesWithinWatermark`` keys state on the dedup columns and
evicts per the watermark — bounded state at any scale, versus a naive
``dropDuplicates`` on a stream whose state grows forever.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stream_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate events by key within the watermark horizon."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
