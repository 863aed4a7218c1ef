"""Text cleaning / extraction functions (C6-C14, C19 in SURVEY.md section 2.9).

All native Column expressions — these run inside whole-stage codegen.
The reference did HTML stripping producer-side in pure Python
(reference: src/mastodon_to_kafka.py:26-29); the engine owns it so the
same semantics apply to any ingest edge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

HASHTAG_PATTERN = r"#(\w+)"


def strip_html(col: Column | str) -> Column:
    """Remove HTML tags (reference: re.sub('<[^>]+>',''), producer-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "<[^>]+>", "")


def clean_text(col: Column | str) -> Column:
    """Strip HTML, collapse whitespace, trim (reference trim path:
    src/batch_load_raw_fix.py:52)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(strip_html(c), r"\s+", " "))


def extract_hashtags(col: Column | str) -> Column:
    """All ``#tag`` tokens from free text, lowercased, as array<string>.

    Reference extracts only the first via regexp_extract (PART3.ipynb:691);
    the engine uses regexp_extract_all for completeness.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.regexp_extract_all(c, F.lit(HASHTAG_PATTERN), 1), lambda x: F.lower(x)
    )


def keywords_rlike_pattern(keywords: Sequence[str]) -> str:
    """Case-insensitive escaped-alternation pattern for a keyword set —
    the ONE place the escaping contract lives ('c++' must match "c++"
    as a literal, never raise as a pattern)."""
    import re

    return "(?i)(" + "|".join(re.escape(k) for k in keywords) + ")"


def keyword_filter(col: Column | str, keywords: Sequence[str]) -> Column:
    """Case-insensitive OR-of-keywords predicate (reference:
    src/spark_stream.py:100-104 rlike over text).

    Keywords are regex-escaped: they are literal substrings in this
    API, so 'c++' must match "c++" rather than raise a pattern error
    (the reference's raw-regex behavior is not reproduced).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(keywords_rlike_pattern(keywords))


def hashtags_contain(col: Column | str, keywords: Sequence[str]) -> Column:
    """Array-side keyword predicate.

    The reference stringified the array and regexed it (reference:
    src/spark_stream.py:103 ``hashtags.cast('string').rlike``); ``exists``
    over the array is the idiomatic form and avoids the cast.
    """
    c = F.col(col) if isinstance(col, str) else col
    kws = F.array(*[F.lit(k.lower()) for k in keywords])
    return F.exists(c, lambda x: F.array_contains(kws, F.lower(x)))


"""PII patterns — deliberately restricted to syntax that Java regex
(Spark) and RE2 (DuckDB oracle) interpret identically: character
classes, bounded repetition, ``\\b`` anchors; no lookaround, no
backreferences. Greedy matching converges for these (no alternation
ambiguity), so backtracking (Java) and automaton (RE2) engines return
the same spans."""
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# leading "(" OR word boundary: without it the pattern would match the
# tail of a longer digit run ("card 4555 123-4567" -> phone at "555...")
PHONE_PATTERN = r"(?:\(|\b)\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b"
SSN_PATTERN = r"\b\d{3}-\d{2}-\d{4}\b"

_PII_REDACTIONS = (
    (EMAIL_PATTERN, "<EMAIL>"),
    (SSN_PATTERN, "<SSN>"),  # before PHONE: both are digit-group shapes
    (IPV4_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
)


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-row PII hit counts (emails / IPv4 / phones / SSNs) as native
    regexp_extract_all + size — codegen'd, no UDF. At 100 TB this is a
    pure projection over the scan: no shuffle, no state."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "n_emails": F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), 0)),
        "n_ipv4": F.size(F.regexp_extract_all(c, F.lit(IPV4_PATTERN), 0)),
        "n_phones": F.size(F.regexp_extract_all(c, F.lit(PHONE_PATTERN), 0)),
        "n_ssn": F.size(F.regexp_extract_all(c, F.lit(SSN_PATTERN), 0)),
    }


def redact_pii(col: Column | str) -> Column:
    """Replace PII spans with typed placeholder tokens. Order matters:
    SSN (3-2-4 digit groups) is rewritten before the phone pattern can
    see digit runs; emails before anything that could match their
    digits."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in _PII_REDACTIONS:
        c = F.regexp_replace(c, pattern, token)
    return c


def merge_text_content(text: Column | str, content: Column | str) -> Column:
    """First-non-null of alternate body fields (reference: Test.ipynb
    when/otherwise merge; 5SPAR.ipynb coalesce)."""
    t = F.col(text) if isinstance(text, str) else text
    c = F.col(content) if isinstance(content, str) else content
    return F.coalesce(t, c)
