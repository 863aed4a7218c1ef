"""Stateful streaming ops on the transformWithStateInPandas API (Spark 4.x).

The successor to ``applyInPandasWithState`` (streaming/stateful.py): state
is declared as named, schema-typed variables on a handle, supports TTL,
and the processor is an object with an explicit lifecycle — the shape
Spark is standardizing custom stateful operators on.

``stream_first_seen`` is the 100 TB ingest primitive this engine needs:
exact streaming deduplication by key across micro-batches. Unlike the
built-in ``dropDuplicatesWithinWatermark`` (streaming/dedup.py) it does
not require an event-time watermark — state is bounded instead by an
optional processing-time TTL, the right trade for id-keyed dedup where
ids never legitimately recur (reference parity: the batch latest-per-key
dedup of src/batch_clean_historical.py:34-37, incrementalized).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


class _FirstSeenProcessor(StatefulProcessor):
    """Emits only the first row ever observed per key.

    One boolean ValueState row per key — the minimal state footprint an
    exact dedup can carry. Within the first batch a key appears in, the
    kept row is the minimum of ``order_col`` (deterministic); with no
    ``order_col`` it is the first row Spark hands us.
    """

    def __init__(self, out_cols: Sequence[str], order_col: str | None, ttl_ms: int | None):
        self._out_cols = list(out_cols)
        self._order_col = order_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "seen boolean", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        best: pd.DataFrame | None = None
        for pdf in rows:
            if not len(pdf):
                continue
            cand = (
                pdf.nsmallest(1, self._order_col)
                if self._order_col
                else pdf.head(1)
            )
            if best is None or (
                self._order_col
                and cand[self._order_col].iloc[0] < best[self._order_col].iloc[0]
            ):
                best = cand
        self._seen.update((True,))
        if best is not None:
            yield best[self._out_cols]

    def close(self) -> None:
        pass


def stream_first_seen(
    stream: DataFrame,
    key_cols: Sequence[str],
    order_col: str | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Exact streaming dedup: keep the first row per key, forever (or for
    ``ttl_ms`` of processing time, after which the key may re-emit —
    what bounds state at unbounded key cardinality).

    Scale: state is one boolean per key in the state store (RocksDB on a
    real cluster), partitioned by the groupBy hash — adding executors
    shards both the state and the probe work.
    """
    # transformWithState requires the RocksDB state store; the default
    # HDFS-backed provider is unsupported (driver worker crashes).
    # Runtime-settable, and correct for every other stateful op too —
    # RocksDB is what a real cluster runs for large keyed state.
    stream.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    out_schema = T.StructType([stream.schema[c] for c in stream.columns])
    proc = _FirstSeenProcessor(stream.columns, order_col, ttl_ms)
    return stream.groupBy(*[stream[c] for c in key_cols]).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
