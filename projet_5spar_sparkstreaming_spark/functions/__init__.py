from projet_5spar_sparkstreaming_spark.functions.timestamps import normalize_timestamp
from projet_5spar_sparkstreaming_spark.functions.text import (
    clean_text,
    extract_hashtags,
    keyword_filter,
    strip_html,
)
from projet_5spar_sparkstreaming_spark.functions.textstats import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from projet_5spar_sparkstreaming_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "normalize_timestamp",
    "clean_text",
    "extract_hashtags",
    "keyword_filter",
    "strip_html",
    "doc_fingerprint",
    "language_id",
    "quality_score",
    "token_count",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
