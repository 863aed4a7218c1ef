"""Custom stateful streaming operators via applyInPandasWithState.

For semantics the built-in windowed aggregations can't express —
running per-key accumulators that survive across micro-batches and emit
on every update. State is explicit (one row per key in the state
store), Arrow-batched per group, bounded by key cardinality.

This is the engine's escape hatch tier (SURVEY.md: custom operators
(b)): used only when composition of built-ins genuinely cannot express
the operator.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
        T.StructField("max_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
        T.StructField("mx", T.DoubleType(), True),
    ]
)


def running_key_stats(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Running (count, sum, max) per key, emitted each micro-batch the
    key receives data. Survives restarts via the checkpoint state store.
    """

    def _update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, total, mx = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += len(pdf)
            total += float(vals.sum())
            batch_max = float(vals.max()) if len(vals) else None
            if batch_max is not None:
                mx = batch_max if mx is None else max(mx, batch_max)
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "max_value": [mx],
            }
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_first_seen(
    stream: DataFrame,
    key_cols: Sequence[str],
    order_col: str | Sequence[str] | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Exact streaming dedup: emit only the first row ever observed per
    key; duplicates in later micro-batches are suppressed by keyed state.

    The 100 TB ingest primitive: unlike the built-in
    ``dropDuplicatesWithinWatermark`` (streaming/dedup.py) it needs no
    event-time watermark — state (one boolean per key) is bounded
    instead by an optional processing-time TTL, after which a key may
    re-emit; the right trade for id-keyed dedup where ids never
    legitimately recur (reference parity: the batch latest-per-key
    dedup of src/batch_clean_historical.py:34-37, incrementalized).

    Within the first batch a key appears in, the kept row is the
    lexicographic minimum of ``order_col`` (a column name or a sequence
    of names — pass a tie-break column when the primary order can
    repeat per key, or the kept row is batch-order-dependent); with no
    ``order_col`` it is the first row Spark hands us.

    Built on ``applyInPandasWithState`` — Spark 4.x also offers
    ``transformWithStateInPandas`` (named TTL state variables), but its
    state-server protocol requires protobuf at runtime; this
    formulation has no extra dependency and executes everywhere. On a
    real cluster the state lives in the checkpoint state store
    (RocksDB), sharded by the groupBy hash — executors scale state and
    probe work together.
    """
    order_cols = (
        [order_col] if isinstance(order_col, str) else list(order_col or [])
    )
    out_schema = T.StructType([stream.schema[c] for c in stream.columns])
    state_schema = T.StructType([T.StructField("seen", T.BooleanType(), False)])
    out_cols = list(stream.columns)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def _first(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # Spark clears a key's previously-set timeout on every
            # invocation, so the TTL must be re-armed even on the
            # duplicate path — otherwise hot keys (the ones TTL exists
            # to bound) never expire and state grows without limit.
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return  # key already emitted; duplicates drop here
        # sort_values, NOT nsmallest: nsmallest rejects object (string)
        # dtypes outright, and NaN candidates would win cross-chunk
        # tuple comparisons (NaN < x is False both ways). One per-chunk
        # sorted head, then one final sort over the <=#chunks heads —
        # nulls lose consistently (na_position='last') regardless of
        # Arrow chunk boundaries.
        heads: list[pd.DataFrame] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            heads.append(
                pdf.sort_values(order_cols, na_position="last").head(1)
                if order_cols
                else pdf.head(1)
            )
        best: pd.DataFrame | None = None
        if heads:
            best = (
                pd.concat(heads)
                .sort_values(order_cols, na_position="last")
                .head(1)
                if order_cols
                else heads[0]
            )
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if best is not None:
            yield best[out_cols]

    return stream.groupBy(*[stream[c] for c in key_cols]).applyInPandasWithState(
        _first,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
