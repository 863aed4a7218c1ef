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
