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
    pii_counts,
    redact_pii,
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


class TestPII:
    SAMPLE = (
        "Mail a.user+tag@example.co.uk from 192.168.1.10, "
        "call (555) 123-4567 or 555-123-4567, SSN 123-45-6789."
    )

    def test_pii_counts(self, spark):
        df = spark.createDataFrame([(self.SAMPLE,), ("no pii here",)], ["t"])
        counts = pii_counts("t")
        rows = df.select(
            *[counts[k].alias(k) for k in sorted(counts)]
        ).collect()
        assert rows[0].asDict() == {
            "n_emails": 1, "n_ipv4": 1, "n_phones": 2, "n_ssn": 1
        }
        assert rows[1].asDict() == {
            "n_emails": 0, "n_ipv4": 0, "n_phones": 0, "n_ssn": 0
        }

    def test_redact_pii(self, spark):
        df = spark.createDataFrame([(self.SAMPLE,)], ["t"])
        out = df.select(redact_pii("t").alias("r")).collect()[0]["r"]
        assert "<EMAIL>" in out and "<IP>" in out
        assert "<SSN>" in out and "<PHONE>" in out
        assert "example.co.uk" not in out
        assert "123-45-6789" not in out
        assert "192.168.1.10" not in out

    def test_phone_not_matched_inside_digit_run(self, spark):
        # the leading (?:\(|\b) anchor: a longer digit run (card /
        # account fragment) must not have its tail redacted as a phone
        df = spark.createDataFrame(
            [("card 4555 123-4567",), ("id 20555-123-4567 x",)], ["t"]
        )
        c = pii_counts("t")
        rows = df.select(
            c["n_phones"].alias("p"), redact_pii("t").alias("r")
        ).collect()
        for r in rows:
            assert r["p"] == 0, r
            assert "<PHONE>" not in r["r"], r

    def test_pii_null_and_empty_edges(self, spark):
        # SQL-consistent null propagation (DuckDB agrees): null text ->
        # null counts/redaction, empty text -> zero counts, '' redaction
        df = spark.createDataFrame([(1, None), (2, "")], "id long, t string")
        c = pii_counts("t")
        rows = {
            r["id"]: r.asDict()
            for r in df.select(
                "id", *[c[k].alias(k) for k in sorted(c)],
                redact_pii("t").alias("r"),
            ).collect()
        }
        assert all(v is None for k, v in rows[1].items() if k != "id")
        assert rows[2] == {
            "id": 2, "n_emails": 0, "n_ipv4": 0, "n_phones": 0,
            "n_ssn": 0, "r": "",
        }

    def test_redaction_matches_duckdb_re2(self, spark):
        # the oracle contract: Java regex and RE2 agree on these spans
        import duckdb

        df = spark.createDataFrame(
            [(self.SAMPLE,), ("x 10.0.0.1 y bob@x.io",), ("clean",)], ["t"]
        )
        got = sorted(r["r"] for r in df.select(redact_pii("t").alias("r")).collect())
        want = sorted(
            r[0]
            for r in duckdb.sql(
                "SELECT regexp_replace(regexp_replace(regexp_replace("
                "regexp_replace(t, "
                "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
                "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'), "
                "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'), "
                "'(?:\\(|\\b)\\d{3}\\)?[ .-]\\d{3}[ .-]\\d{4}\\b', '<PHONE>', 'g') "
                "FROM (VALUES ('" + self.SAMPLE.replace("'", "''") + "'), "
                "('x 10.0.0.1 y bob@x.io'), ('clean')) v(t)"
            ).fetchall()
        )
        assert got == want


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
