"""Canonical schemas.

``TOOT_SCHEMA`` is the single event schema shared by every batch and
streaming job — the reference declared it three times with a String/Long
divergence on ``id`` (reference: src/spark_stream.py:37-50 uses String,
src/batch_load_raw_fix.py:12-24 uses Long). We standardize on StringType
for ``id``/``user_id`` (snowflake ids as opaque keys; federation ``acct``
strings argue for string keys — SURVEY.md section 7 hard part d) and cast
at numeric edges explicitly.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical Mastodon toot event schema (reference: src/mastodon_to_kafka.py:31-49).
TOOT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("created_at", T.StringType(), True),  # raw; normalize_timestamp parses
        T.StructField("language", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("hashtags", T.ArrayType(T.StringType()), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("username", T.StringType(), True),
        T.StructField("display_name", T.StringType(), True),
        T.StructField("favourites", T.LongType(), True),
        T.StructField("reblogs", T.LongType(), True),
        T.StructField("replies", T.LongType(), True),
        T.StructField("url", T.StringType(), True),
    ]
)

# Reduced notebook-shape schema (reference: 5SPAR.ipynb cell 34, Test.ipynb).
TOOT_MIN_SCHEMA = T.StructType(
    [
        T.StructField("username", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# Synthetic star-schema tables (TESTDATA.md). Names only; schemas live in
# the parquet footers and are never re-declared (no drift).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
