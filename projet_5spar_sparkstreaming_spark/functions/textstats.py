"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

North-star extensions beyond the reference's surface (BASELINE.json).
Everything is a native Column expression — at 100 TB these run inside
whole-stage codegen over the parquet scan with full column pruning; no
Python per row, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately small + deterministic so the oracle SQL can replicate them.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "fr": ["le", "la", "les", "et", "est"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "los", "las", "es", "una"],
}

# Word-ish tokens: letters/digits plus common BPE-style subword splits on
# apostrophes; mirrors a whitespace+punctuation tokenizer.
TOKEN_PATTERN = r"[A-Za-z0-9_']+"


def tokens(col: Column | str) -> Column:
    """array<string> of lowercase word tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def token_count(col: Column | str) -> Column:
    """Whitespace/regex token count (long)."""
    return F.size(tokens(col)).cast("long")


def language_id(col: Column | str) -> Column:
    """Heuristic language guess from stopword-marker hit counts.

    Counts occurrences of each language's marker words (as standalone
    tokens) and returns the argmax language code, 'und' when no marker
    hits. Ties break by fixed language order (en, fr, de, es) —
    deterministic so results are reproducible and oracle-checkable.
    """
    langs = F.array(*[F.lit(lang) for lang in _LANG_MARKERS])

    def over_scores(sc: Column) -> Column:
        best = F.array_max(sc)
        # array_position returns the FIRST max index — earlier languages
        # win ties, same ordering contract as the previous when-chain.
        return F.when(
            best > 0, F.element_at(langs, F.array_position(sc, best).cast("int"))
        ).otherwise(F.lit("und"))

    def over_toks(tk: Column) -> Column:
        def _marker_hits(words: list[str]):
            # Factory closure: a default-arg lambda would change the
            # lambda's arity and break higher-order-function binding.
            return F.size(F.filter(tk, lambda t: t.isin(*words)))

        scores = F.array(*[_marker_hits(w) for w in _LANG_MARKERS.values()])
        return F.transform(F.array(scores), over_scores)[0]

    # Double lambda binding: higher-order functions are interpreted (no
    # codegen CSE), so the old form re-ran the tokenizer regex once per
    # marker set and the score comparisons once per when() arm. Binding
    # the token array, then the score array, evaluates each exactly once
    # (doc_lang_id 0.79s -> measured ~0.3s at sf0.1).
    return F.transform(F.array(tokens(col)), over_toks)[0]


def _quality_from_counts(
    n_chars: Column, n_alpha: Column, n_toks: Column
) -> Column:
    """The quality blend over precomputed (chars, alpha-chars, tokens)
    counts — ONE arithmetic definition shared by the expression path
    (``quality_score``) and the Arrow fast path (``score_rows``), so
    the two produce bit-identical doubles (same ops, same order)."""
    length_ok = (
        F.when(n_chars >= 2000, F.lit(1.0))
        .when(n_chars >= 50, n_chars / F.lit(2000.0))
        .otherwise(n_chars / F.lit(200.0))
    )
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_toks > 0, n_alpha / n_toks).otherwise(F.lit(0.0))
    word_len_ok = F.when(
        (mean_word_len >= 3.0) & (mean_word_len <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round(
        F.least(F.lit(1.0), length_ok) * 0.4 + alpha_ratio * 0.4 + word_len_ok * 0.2, 6
    )


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality score from cheap surface features.

    Blend of: length band (50..2000 chars), alphabetic ratio, and
    mean-word-length band (3..12) — the standard cheap pre-filters a
    training-data pipeline applies before expensive model scoring.

    Pure-expression form (the SQL oracles replicate it verbatim). For
    whole-corpus scoring use ``score_rows``: java.util.regex spends
    ~100ns/char on the token/alpha classes, and a pushed-down filter
    on the scored columns re-evaluates the whole expression tree —
    measured 143s for a cold 500k-doc curation scan vs ~3s through
    the Arrow kernel (same outputs, SCALE_STRESS_r08).
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    n_toks = token_count(c).cast("double")
    return _quality_from_counts(n_chars, n_alpha, n_toks)


def doc_fingerprint(col: Column | str) -> Column:
    """Normalization fingerprint for near-exact dedup.

    lower -> strip non-alphanumerics -> collapse whitespace -> sha2-256.
    Two documents differing only in case/punctuation/whitespace collide.
    (A rolling/shingle hash variant lives in operators/dedup.py.)
    """
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", ""), r"\s+", " ")
    )
    return F.sha2(normalized, 256)


# Java \s == [ \t\n\x0B\f\r]; RE2's \s lacks \x0B, so the Arrow kernel
# spells the class out to keep fingerprint identity EXACTLY equal to
# the ``doc_fingerprint`` expression (and the SQL oracles).
_WS_CLASS = " \t\n\x0b\f\r"


def score_rows(
    df,
    text_col: str = "text",
    *,
    n_tokens_col: str = "__n_toks",
    n_alpha_col: str = "__n_alpha",
    fp_col: str | None = "__fp",
):
    """Corpus-scan fast path: append token count, alphabetic-char count
    and (optionally) the normalization fingerprint in ONE Arrow pass.

    Same outputs as ``token_count`` / the ``quality_score`` alpha term /
    ``doc_fingerprint`` (asserted row-identical in
    tests/test_textstats_arrow.py), but the regex work runs in RE2 via
    ``pyarrow.compute`` instead of java.util.regex — the negated char
    class ``[^a-z0-9\\s]`` alone costs ~140ns/char interpreted (49s for
    a 500k x 700B corpus scan; the whole kernel ~3s). Two structural
    wins besides raw regex speed: Catalyst cannot push a filter on the
    scored columns below the Python node, so quality/length filters
    don't re-evaluate the scan expressions (the expression path pays
    double — the pushdown re-eval trap); and quality arithmetic stays
    JVM-side over these counts (``_quality_from_counts``), bit-identical
    to the expression path.

    Falls back to the pure-expression columns when pyarrow is absent.
    NULL text yields NULL counts/fingerprint on both paths.
    """
    c = F.col(text_col)
    try:
        import pyarrow as pa  # noqa: F401
    except ImportError:
        out = df.withColumn(
            n_tokens_col, token_count(c)
        ).withColumn(
            n_alpha_col,
            F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("long"),
        )
        if fp_col is not None:
            out = out.withColumn(fp_col, doc_fingerprint(c))
        return out

    from pyspark.sql import types as T

    # Small test inputs arrive as 1 scan partition, which would
    # serialize the python stage on one core; at scale inputs already
    # carry >= cores partitions and this is a no-op (same policy as
    # operators/dedup.py:_ensure_min_parallelism, no key needed for a
    # per-row map). Streaming DataFrames can't probe .rdd — their
    # micro-batch parallelism is the source's concern.
    if not df.isStreaming:
        target = max(2, df.sparkSession.sparkContext.defaultParallelism // 2)
        if df.rdd.getNumPartitions() * 2 < target:
            df = df.repartition(target)

    in_names = list(df.columns)
    for name in (n_tokens_col, n_alpha_col, fp_col or ""):
        if name in in_names:
            raise ValueError(f"score_rows output column {name!r} already exists")
    want_fp = fp_col is not None

    def _score(batches):
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(batch.schema.get_field_index(text_col))
            # Java's toLowerCase applies Unicode SpecialCasing, whose
            # ONLY unconditional multi-char LOWERCASE mapping is
            # U+0130 İ -> i + U+0307 (combining dot); utf8_lower uses
            # the simple 1:1 mapping (-> i), which would merge token
            # runs the expression path splits ('İS' -> i/ s vs is).
            # Pre-expanding İ makes the two lowercasings identical on
            # every input (generative sweep in test_textstats_arrow).
            text_l = pc.replace_substring(text, "İ", "i̇")
            lower = pc.utf8_lower(text_l)
            n_toks = pc.count_substring_regex(lower, r"[A-Za-z0-9_']+")
            n_alpha = pc.count_substring_regex(text, "[A-Za-z]")
            cols = list(batch.columns)
            names = list(batch.schema.names)
            cols += [n_toks.cast(pa.int64()), n_alpha.cast(pa.int64())]
            names += [n_tokens_col, n_alpha_col]
            if want_fp:
                norm = pc.replace_substring_regex(
                    lower, f"[^a-z0-9{_WS_CLASS}]", ""
                )
                norm = pc.replace_substring_regex(norm, f"[{_WS_CLASS}]+", " ")
                norm = pc.utf8_trim(norm, " ")
                fp = pa.array(
                    [
                        None
                        if s is None
                        else hashlib.sha256(s.encode("utf-8")).hexdigest()
                        for s in norm.to_pylist()
                    ],
                    type=pa.string(),
                )
                cols.append(fp)
                names.append(fp_col)
            yield pa.RecordBatch.from_arrays(cols, names)

    fields = list(df.schema.fields) + [
        T.StructField(n_tokens_col, T.LongType(), True),
        T.StructField(n_alpha_col, T.LongType(), True),
    ]
    if want_fp:
        fields.append(T.StructField(fp_col, T.StringType(), True))
    return df.mapInArrow(_score, schema=T.StructType(fields))
