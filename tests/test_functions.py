"""Unit tests: functions layer (timestamps, text, textstats, vectors)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.functions.timestamps import normalize_timestamp
from projet_5spar_sparkstreaming_spark.functions.text import (
    clean_text,
    extract_hashtags,
    hashtags_contain,
    keyword_filter,
    merge_text_content,
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


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


class TestNormalizeTimestamp:
    # the reference's observed formats (src/spark_stream.py:82-91, sample.jsonl)
    FORMATS = [
        "2025-10-03 18:14:46.665000+00:00",
        "2025-10-03 18:14:46+00:00",
        "2025-10-03T18:14:46.665Z",
        "2025-10-03T18:14:46.665+00:00",
        "2025-10-03T18:14:46Z",
        "2025-10-03 18:14:46",
    ]

    def test_all_formats_parse(self, spark):
        df = spark.createDataFrame([(s,) for s in self.FORMATS], ["raw"])
        out = df.select(normalize_timestamp("raw").alias("ts")).collect()
        assert all(r["ts"] is not None for r in out)
        assert all(r["ts"].year == 2025 and r["ts"].hour == 18 for r in out)

    def test_garbage_is_null_by_default(self, spark):
        df = spark.createDataFrame([("not a date",), (None,)], ["raw"])
        out = df.select(normalize_timestamp("raw").alias("ts")).collect()
        assert all(r["ts"] is None for r in out)

    def test_garbage_fallback_to_now(self, spark):
        df = spark.createDataFrame([("junk",)], ["raw"])
        out = df.select(
            normalize_timestamp("raw", fallback_to_now=True).alias("ts")
        ).collect()
        assert out[0]["ts"] is not None

    def test_micro_precision_not_truncated(self, spark):
        df = spark.createDataFrame([("2025-10-03 18:14:46.665000+00:00",)], ["raw"])
        out = df.select(normalize_timestamp("raw").alias("ts")).collect()
        assert out[0]["ts"].microsecond == 665000


class TestTextFunctions:
    def test_strip_html(self, spark):
        v = _one(spark, strip_html(F.lit("<p>hello <b>world</b></p>")))
        assert v == "hello world"

    def test_clean_text_collapses_whitespace(self, spark):
        v = _one(spark, clean_text(F.lit("  <br/>a \n\n b\t c  ")))
        assert v == "a b c"

    def test_extract_hashtags(self, spark):
        v = _one(spark, extract_hashtags(F.lit("Go #Spark and #DATA now #ai")))
        assert v == ["spark", "data", "ai"]

    def test_keyword_filter_case_insensitive(self, spark):
        df = spark.createDataFrame(
            [("I love SPARK",), ("nothing here",), ("data rocks",)], ["t"]
        )
        out = df.filter(keyword_filter("t", ["spark", "data"])).collect()
        assert len(out) == 2

    def test_hashtags_contain(self, spark):
        df = spark.createDataFrame([(["AI", "news"],), (["sports"],)], ["h"])
        out = df.filter(hashtags_contain("h", ["ai"])).collect()
        assert len(out) == 1

    def test_merge_text_content(self, spark):
        df = spark.createDataFrame(
            [("a", None), (None, "b"), ("x", "y"), (None, None)], ["text", "content"]
        )
        vals = [r["m"] for r in df.select(merge_text_content("text", "content").alias("m")).collect()]
        assert vals == ["a", "b", "x", None]


class TestTextStats:
    def test_token_count(self, spark):
        assert _one(spark, token_count(F.lit("Hello, world! it's me"))) == 4
        assert _one(spark, token_count(F.lit(""))) == 0

    def test_language_id(self, spark):
        assert _one(spark, language_id(F.lit("the cat and the dog is here"))) == "en"
        assert _one(spark, language_id(F.lit("le chat et la vie est belle"))) == "fr"
        assert _one(spark, language_id(F.lit("zzz qqq"))) == "und"

    def test_quality_score_bounds(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        stats = docs.select(quality_score("text").alias("q")).agg(
            F.min("q").alias("lo"), F.max("q").alias("hi")
        ).collect()[0]
        assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0

    def test_fingerprint_normalizes(self, spark):
        df = spark.createDataFrame(
            [("Hello,   World!",), ("hello world",), ("different",)], ["t"]
        )
        fps = [r["f"] for r in df.select(doc_fingerprint("t").alias("f")).collect()]
        assert fps[0] == fps[1] != fps[2]


class TestVectors:
    def test_dot_norm_cosine(self, spark):
        df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 1.0, 2.0])], ["a", "b"])
        row = df.select(
            dot_product("a", "b").alias("d"),
            l2_norm("a").alias("na"),
            cosine_similarity("a", "b").alias("c"),
        ).collect()[0]
        assert row["d"] == 8.0
        assert math.isclose(row["na"], 3.0)
        assert math.isclose(row["c"], 8.0 / 9.0)

    def test_cosine_zero_vector(self, spark):
        df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], ["a", "b"])
        assert df.select(cosine_similarity("a", "b").alias("c")).collect()[0]["c"] == 0.0
