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


def keyword_filter(col: Column | str, keywords: Sequence[str]) -> Column:
    """Case-insensitive OR-of-keywords predicate (reference:
    src/spark_stream.py:100-104 rlike over text).

    Keywords are regex-escaped: they are literal substrings in this
    API, so 'c++' must match "c++" rather than raise a pattern error
    (the reference's raw-regex behavior is not reproduced).
    """
    import re

    c = F.col(col) if isinstance(col, str) else col
    pattern = "(?i)(" + "|".join(re.escape(k) for k in keywords) + ")"
    return c.rlike(pattern)


def hashtags_contain(col: Column | str, keywords: Sequence[str]) -> Column:
    """Array-side keyword predicate.

    The reference stringified the array and regexed it (reference:
    src/spark_stream.py:103 ``hashtags.cast('string').rlike``); ``exists``
    over the array is the idiomatic form and avoids the cast.
    """
    c = F.col(col) if isinstance(col, str) else col
    kws = F.array(*[F.lit(k.lower()) for k in keywords])
    return F.exists(c, lambda x: F.array_contains(kws, F.lower(x)))


def merge_text_content(text: Column | str, content: Column | str) -> Column:
    """First-non-null of alternate body fields (reference: Test.ipynb
    when/otherwise merge; 5SPAR.ipynb coalesce)."""
    t = F.col(text) if isinstance(text, str) else text
    c = F.col(content) if isinstance(content, str) else content
    return F.coalesce(t, c)
