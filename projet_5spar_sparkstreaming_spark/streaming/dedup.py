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


def stream_neardup_ingest(
    docs_stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    trigger: dict | None = None,
):
    """NEAR-dup ingest guard for a document stream — the streaming twin
    of the daily-crawl dedup (`minhash_incremental_pairs`): each
    micro-batch is checked against the accumulated index of every
    previously seen document, near-dup arrivals are dropped, and
    survivors land in ``out_dir``.

    Admission rule (deterministic, order-of-arrival):
      - drop a doc if it near-dups ANY document from an earlier batch
        (cross-batch, via the banded index join — the index side is
        never self-joined), or a SMALLER-ID document in its own batch
        (within-batch self-join, min-id canonical);
      - ALL batch docs (kept or dropped) append to the index, so the
        rule is "near-dup of anything previously SEEN", not "of
        anything previously KEPT" — re-submitting a near-dup of a
        dropped doc still gets dropped.

    The index stores raw (id, text) and re-derives signatures per
    batch — correct but recomputing; at 100 TB/day the index would
    store the deterministic signatures/band buckets instead (the
    precompute framing documented on minhash_incremental_pairs) so a
    batch pays one scan of itself plus a bucket equi-join against
    stored bands. Batch writes are overwrite-by-batch-id subdirs, so
    checkpoint replays are idempotent for both outputs.
    """
    import os

    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        minhash_incremental_pairs,
        minhash_near_dup_pairs,
    )
    from projet_5spar_sparkstreaming_spark.streaming.sinks import foreach_batch_sink

    spark_ref = docs_stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(id_col, text_col).cache()
        drop_cross = None
        if os.path.isdir(index_dir) and any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(index_dir)
            for f in fs
        ):
            index = spark_ref.read.parquet(index_dir)
            drop_cross = (
                minhash_incremental_pairs(
                    batch, index, id_col, text_col, threshold=threshold
                )
                .select(F.col("id_a").alias(id_col))
                .distinct()
            )
        drop_within = (
            minhash_near_dup_pairs(batch, id_col, text_col, threshold=threshold)
            .select(F.col("id_b").alias(id_col))  # id_a < id_b: keep min id
            .distinct()
        )
        dropped = (
            drop_within if drop_cross is None
            else drop_cross.unionByName(drop_within).distinct()
        )
        survivors = batch.join(dropped, id_col, "left_anti")
        (
            survivors.write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )
        (
            batch.write.mode("overwrite")
            .parquet(os.path.join(index_dir, f"batch_id={batch_id}"))
        )
        batch.unpersist()

    os.makedirs(out_dir, exist_ok=True)
    return foreach_batch_sink(docs_stream, _process, checkpoint_dir, trigger)


def stream_embed_neardup_ingest(
    vecs_stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    trigger: dict | None = None,
):
    """Embedding twin of ``stream_neardup_ingest``: each micro-batch of
    vectors checks against the accumulated index with sign-LSH
    candidates + exact-cosine verify (``cosine_incremental_pairs`` —
    the index side is never self-joined), drops near-dup arrivals
    (cross-batch, or a smaller-id twin within the batch), and appends
    EVERYTHING seen to the index. Same admission rule, same
    idempotent batch-id subdir writes."""
    import os

    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        cosine_incremental_pairs,
        cosine_near_dup_pairs,
    )
    from projet_5spar_sparkstreaming_spark.streaming.sinks import foreach_batch_sink

    spark_ref = vecs_stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(id_col, vec_col).cache()
        drop_cross = None
        if os.path.isdir(index_dir) and any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(index_dir)
            for f in fs
        ):
            index = spark_ref.read.parquet(index_dir)
            drop_cross = (
                cosine_incremental_pairs(
                    batch, index, id_col, vec_col, threshold=threshold
                )
                .select(F.col("id_a").alias(id_col))
                .distinct()
            )
        drop_within = (
            cosine_near_dup_pairs(batch, id_col, vec_col, threshold=threshold)
            .select(F.col("id_b").alias(id_col))  # id_a < id_b: keep min id
            .distinct()
        )
        dropped = (
            drop_within if drop_cross is None
            else drop_cross.unionByName(drop_within).distinct()
        )
        survivors = batch.join(dropped, id_col, "left_anti")
        survivors.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        batch.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch_id={batch_id}")
        )
        batch.unpersist()

    os.makedirs(out_dir, exist_ok=True)
    return foreach_batch_sink(vecs_stream, _process, checkpoint_dir, trigger)
