"""The toot analytics pipeline: raw -> clean -> derived tables.

Re-expresses the reference's three-stage chain (reference:
src/batch_load_raw_fix.py -> src/batch_clean_historical.py ->
src/batch_analytics.py) as pure DataFrame transforms, composable and
shared between batch and streaming (SURVEY.md section 2.10 T8). Sinks
are the caller's concern — these functions never write.

"Materialize once, derive many": ``analytics_suite`` derives all seven
tables from one cleaned DataFrame; callers cache it first (the
reference did repartition(4).cache() + count(), src/batch_analytics.py:21-22).
At 100 TB the equivalent is writing toots_clean as day-partitioned
parquet and letting the derived queries partition-prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.functions.timestamps import normalize_timestamp
from projet_5spar_sparkstreaming_spark.operators.dedup import latest_per_key
from projet_5spar_sparkstreaming_spark.operators.rollup import time_bucket_counts
from projet_5spar_sparkstreaming_spark.operators.topk import top_k_per_group


def clean_toots(raw: DataFrame) -> DataFrame:
    """Raw parsed toots -> curated table.

    Trim text/username, drop null-id / empty-text rows, normalize
    created_at, dedup latest-per-id (reference:
    src/batch_clean_historical.py:17-37; src/batch_load_raw_fix.py:52-53).
    """
    trimmed = raw.withColumn("text", F.trim("text")).withColumn(
        "username", F.trim("username")
    )
    filtered = trimmed.filter(
        F.col("id").isNotNull()
        & F.col("username").isNotNull()
        & F.col("text").isNotNull()
        & (F.col("text") != "")
    )
    ts = filtered.withColumn("created_at", normalize_timestamp("created_at"))
    return latest_per_key(ts, ["id"], "created_at", tie_break=("username",))


def hourly_toot_counts(clean: DataFrame, ts_col: str = "created_at") -> DataFrame:
    """(hour, toots) — reference: src/batch_analytics.py:25-26."""
    return time_bucket_counts(clean, ts_col, "hour", bucket_name="hour").select(
        "hour", F.col("cnt").alias("toots")
    )


def daily_toot_counts(clean: DataFrame, ts_col: str = "created_at") -> DataFrame:
    """(day, toots) — reference: src/batch_analytics.py:28-29."""
    return time_bucket_counts(clean, ts_col, "day", bucket_name="day").select(
        "day", F.col("cnt").alias("toots")
    )


def user_activity_counts(clean: DataFrame) -> DataFrame:
    """(username, toot_count) — reference: src/batch_analytics.py:32-33."""
    return clean.groupBy("username").agg(F.count("*").alias("toot_count"))


def active_users(clean: DataFrame, min_count: int = 5) -> DataFrame:
    """HAVING-style threshold on activity — reference:
    src/batch_analytics.py:35-36."""
    return user_activity_counts(clean).filter(F.col("toot_count") >= min_count)


def hashtags_per_day(clean: DataFrame, ts_col: str = "created_at") -> DataFrame:
    """(day, hashtag, cnt): explode + trim/lower + non-empty filter —
    reference: src/batch_analytics.py:40-45."""
    exploded = (
        clean.select(
            F.to_date(ts_col).alias("day"), F.explode("hashtags").alias("__raw")
        )
        .select("day", F.lower(F.trim("__raw")).alias("hashtag"))
        .filter(F.col("hashtag") != "")
    )
    return exploded.groupBy("day", "hashtag").agg(F.count("*").alias("cnt"))


def top_hashtag_per_day(clean: DataFrame, ts_col: str = "created_at") -> DataFrame:
    """Top-1 hashtag per day, ties broken lexicographically — reference:
    src/batch_analytics.py:47-49."""
    return top_k_per_group(
        hashtags_per_day(clean, ts_col),
        ["day"],
        [F.col("cnt").desc(), F.col("hashtag").asc()],
        k=1,
    )


def avg_toot_length_by_user(clean: DataFrame) -> DataFrame:
    """(username, avg_len) — reference: src/batch_analytics.py:51-52 and
    the streaming twin src/spark_stream.py:133-144 (same operator)."""
    return (
        clean.withColumn("__len", F.length("text"))
        .groupBy("username")
        .agg(F.round(F.avg("__len"), 6).alias("avg_len"))
    )


def analytics_suite(clean: DataFrame) -> dict[str, DataFrame]:
    """All seven derived tables from one cleaned input."""
    return {
        "hourly_toot_counts": hourly_toot_counts(clean),
        "daily_toot_counts": daily_toot_counts(clean),
        "user_activity_counts": user_activity_counts(clean),
        "active_users": active_users(clean),
        "hashtags_per_day_counts": hashtags_per_day(clean),
        "top_hashtag_per_day": top_hashtag_per_day(clean),
        "avg_toot_length_by_user_batch": avg_toot_length_by_user(clean),
    }
