"""score_rows (Arrow RE2 kernel) must be ROW-IDENTICAL to the pure
Column-expression definitions it fast-paths: token_count, the
quality alpha count, and doc_fingerprint. The SQL oracles replicate
the expression forms verbatim, so kernel==expression is the exact
condition under which swapping the corpus-scan implementation cannot
move a single graded hash.

Tricky-input coverage: NULLs, empties, every Java \\s member
(including \\x0B, which RE2's \\s lacks — the kernel spells the class
out), unicode case folding (İ, ß, Kelvin K), combining marks,
apostheses/underscores in tokens, and multi-space runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.functions.textstats import (
    _quality_from_counts,
    doc_fingerprint,
    quality_score,
    score_rows,
    token_count,
)

TRICKY = [
    None,
    "",
    " ",
    "Hello, World! It's 42",
    "a\x0bb",
    "tab\tnl\nvt\x0bff\x0ccr\rdone",
    "ÉLAN Straße K İ end",
    "i̇ combining",
    "under_score don't 'quoted'",
    "a  b   c    d",
    "  leading and trailing   ",
    "ALLCAPS",
    "1234567890",
    "!!!???...",
    "x" * 3000,
    "short",
    "word " * 500,
]


def _tricky_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY)], "doc_id long, text string"
    )


def _expr_reference(df):
    return df.select(
        "doc_id",
        token_count("text").alias("e_toks"),
        F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
        .cast("long")
        .alias("e_alpha"),
        doc_fingerprint("text").alias("e_fp"),
        quality_score("text").alias("e_q"),
    )


def _kernel(df):
    scored = score_rows(df, "text")
    return scored.select(
        "doc_id",
        F.col("__n_toks").alias("k_toks"),
        F.col("__n_alpha").alias("k_alpha"),
        F.col("__fp").alias("k_fp"),
        _quality_from_counts(
            F.length(F.col("text")).cast("double"),
            F.col("__n_alpha").cast("double"),
            F.col("__n_toks").cast("double"),
        ).alias("k_q"),
    )


def _assert_identical(df):
    joined = (
        _expr_reference(df)
        .join(_kernel(df), "doc_id")
        .select(
            "doc_id",
            (
                F.coalesce(F.col("e_toks") == F.col("k_toks"), F.lit(False))
                | (F.col("e_toks").isNull() & F.col("k_toks").isNull())
            ).alias("toks_ok"),
            (
                F.coalesce(F.col("e_alpha") == F.col("k_alpha"), F.lit(False))
                | (F.col("e_alpha").isNull() & F.col("k_alpha").isNull())
            ).alias("alpha_ok"),
            (
                F.coalesce(F.col("e_fp") == F.col("k_fp"), F.lit(False))
                | (F.col("e_fp").isNull() & F.col("k_fp").isNull())
            ).alias("fp_ok"),
            (
                F.coalesce(F.col("e_q") == F.col("k_q"), F.lit(False))
                | (F.col("e_q").isNull() & F.col("k_q").isNull())
            ).alias("q_ok"),
        )
    )
    bad = joined.filter(
        ~F.col("toks_ok") | ~F.col("alpha_ok") | ~F.col("fp_ok") | ~F.col("q_ok")
    ).collect()
    assert bad == [], f"kernel/expression mismatch rows: {bad}"


def test_score_rows_matches_expressions_tricky(spark):
    _assert_identical(_tricky_df(spark))


def test_score_rows_matches_expressions_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _assert_identical(docs.select("doc_id", "text"))


def test_score_rows_matches_expressions_random_unicode(spark):
    """Generative sweep: 500 seeded random strings mixing ASCII tokens,
    every Java \\s member, controls, combining marks, case-folding
    oddities (İ K ẞ ﬁ), surrogate-adjacent codepoints and emoji — any
    RE2-vs-java.util.regex or utf8_lower-vs-UTF8String.toLowerCase
    divergence that changes counts or the fingerprint shows up as a
    row mismatch here before it can flake an oracle."""
    import random

    rng = random.Random(20260815)
    alphabet = (
        [chr(c) for c in range(0x20, 0x7F)]
        + list(" \t\n\x0b\x0c\r")
        + ["é", "ß", "İ", "K", "ẞ", "ﬁ", "Ǆ", "ǅ", "ǆ", "̇", "́"]
        + ["中", "文", "🙂", "𝔸", " ", " ", " "]
    )
    rows = []
    for i in range(500):
        n = rng.randint(0, 60)
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _assert_identical(df)


def test_score_rows_expression_fallback_identical(spark, monkeypatch):
    """The no-pyarrow fallback must stay row-identical to the kernel —
    it is the documented degradation path, so it must not drift.
    Setting sys.modules['pyarrow'] = None makes ``import pyarrow``
    raise ImportError inside score_rows without touching the session
    (the reference/kernel computations below re-enable it)."""
    import sys

    df = _tricky_df(spark)
    monkeypatch.setitem(sys.modules, "pyarrow", None)
    fb = score_rows(df, "text")
    # plain projection — collect BEFORE restoring pyarrow so the plan
    # truly executed through the expression branch
    fb_rows = {
        r["doc_id"]: (r["__n_toks"], r["__n_alpha"], r["__fp"])
        for r in fb.collect()
    }
    monkeypatch.undo()
    k_rows = {
        r["doc_id"]: (r["__n_toks"], r["__n_alpha"], r["__fp"])
        for r in score_rows(df, "text").collect()
    }
    assert fb_rows == k_rows


def test_score_rows_passthrough_and_schema(spark):
    df = _tricky_df(spark).withColumn("extra", F.col("doc_id") * 2)
    out = score_rows(df, "text")
    assert out.columns == ["doc_id", "text", "extra", "__n_toks", "__n_alpha", "__fp"]
    rows = out.filter(F.col("doc_id") == 3).collect()
    assert rows[0]["extra"] == 6
    assert rows[0]["__n_toks"] == 4  # hello / world / it's / 42
