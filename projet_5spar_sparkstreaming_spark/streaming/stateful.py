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

from collections.abc import Iterable

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
