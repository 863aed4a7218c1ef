"""Corpus curation: the end-to-end training-data pipeline.

Chains the north-star operators into the pipeline an LLM-data team
actually runs: surface-quality filter -> token-length bounds ->
near-exact dedup (normalization fingerprint, min-id canonical) —
with near-dup clustering (MinHash/Jaccard -> dedup_clusters) as the
optional second stage.

Every stage is a narrow native-expression filter except the dedup
shuffle (32-byte digest per row). At 100 TB the quality/token filters
run inside the parquet scan's codegen and typically drop 30-60% of rows
before anything is shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.functions.textstats import (
    quality_score,
    token_count,
)
from projet_5spar_sparkstreaming_spark.operators.dedup import fingerprint_dedup


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Quality-filter, length-bound and dedup a document corpus.

    Adds ``quality`` and ``n_tokens`` columns; keeps the minimum-id row
    per normalization fingerprint.
    """
    scored = docs.withColumn("quality", F.round(quality_score(text_col), 6)).withColumn(
        "n_tokens", token_count(text_col)
    )
    filtered = scored.filter(
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
    )
    return fingerprint_dedup(filtered, text_col, keep_by=id_col)


def curate_corpus_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    dedup_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of ``curate_corpus``: the SAME quality/length
    filter expressions run over an unbounded document stream (narrow,
    stream-safe — at 100 TB/day they drop rows inside the scan before
    any state), and the near-exact fingerprint dedup incrementalizes as
    keyed first-seen state on the normalization fingerprint
    (streaming/stateful.py:stream_first_seen): the first document with
    a given fingerprint passes, later near-identical copies are
    suppressed across micro-batches. ``dedup_ttl_ms`` bounds state for
    endless streams (a fingerprint may re-emit after the TTL).
    """
    from projet_5spar_sparkstreaming_spark.functions.textstats import doc_fingerprint
    from projet_5spar_sparkstreaming_spark.streaming.stateful import (
        stream_first_seen,
    )

    scored = docs_stream.withColumn(
        "quality", F.round(quality_score(text_col), 6)
    ).withColumn("n_tokens", token_count(text_col))
    filtered = scored.filter(
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
    )
    with_fp = filtered.withColumn("__fp", doc_fingerprint(text_col))
    deduped = stream_first_seen(
        with_fp, ["__fp"], order_col=id_col, ttl_ms=dedup_ttl_ms
    )
    return deduped.drop("__fp")
