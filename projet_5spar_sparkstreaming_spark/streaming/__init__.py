from projet_5spar_sparkstreaming_spark.streaming.windows import (
    session_window_counts,
    sliding_window_counts,
    windowed_counts,
)
from projet_5spar_sparkstreaming_spark.streaming.dedup import (
    stream_dedup,
    stream_embed_neardup_ingest,
    stream_neardup_ingest,
)
from projet_5spar_sparkstreaming_spark.streaming.stateful import stream_first_seen
from projet_5spar_sparkstreaming_spark.streaming.rollup import (
    incremental_rollup_sink,
    read_rollup,
)
from projet_5spar_sparkstreaming_spark.streaming.sinks import (
    foreach_batch_sink,
    idempotent_parquet_sink,
)

__all__ = [
    "session_window_counts",
    "sliding_window_counts",
    "windowed_counts",
    "stream_dedup",
    "stream_embed_neardup_ingest",
    "stream_neardup_ingest",
    "stream_first_seen",
    "incremental_rollup_sink",
    "read_rollup",
    "foreach_batch_sink",
    "idempotent_parquet_sink",
]
