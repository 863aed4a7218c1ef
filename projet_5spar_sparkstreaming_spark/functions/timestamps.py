"""Timestamp normalization.

The reference parses 4-5 timestamp layouts with a ``coalesce`` cascade of
``to_timestamp`` attempts plus a ``current_timestamp()`` fallback
(reference: src/spark_stream.py:82-91, src/batch_load_raw_fix.py:58-70,
src/batch_clean_historical.py:22-31). This is the engine's single shared
implementation — SURVEY.md section 7 hard part (b) requires the cascade
to be replicated exactly so stream and batch agree.

All expressions are native Column ops: the whole cascade stays inside
whole-stage codegen; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: most specific first, so a micro-precision string is not
# truncated by a second-precision pattern.
_TS_FORMATS = (
    "yyyy-MM-dd HH:mm:ss.SSSSSSXXX",   # 2025-10-03 18:14:46.665000+00:00
    "yyyy-MM-dd HH:mm:ssXXX",          # 2025-10-03 18:14:46+00:00
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",    # 2025-10-03T18:14:46.665+00:00 / ...Z
    "yyyy-MM-dd'T'HH:mm:ssXXX",        # 2025-10-03T18:14:46Z
    "yyyy-MM-dd HH:mm:ss",             # bare
)


def normalize_timestamp(col: Column | str, fallback_to_now: bool = False) -> Column:
    """Multi-format timestamp parse with optional processing-time fallback.

    ``try_to_timestamp`` per format (null on mismatch, never an error),
    first-non-null wins. The Zulu suffix is normalized to an explicit
    offset first (reference: src/batch_load_raw_fix.py:59 regexp_replace
    'Z$' -> '+00:00').

    ``fallback_to_now=False`` by default: silently stamping unparseable
    event times with ``current_timestamp()`` (reference behavior,
    src/spark_stream.py:89) corrupts event-time analytics; the engine
    keeps nulls and lets callers opt in.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c.cast("string"), "Z$", "+00:00")
    attempts = [F.try_to_timestamp(c, F.lit(fmt)) for fmt in _TS_FORMATS]
    # Generic parse last: handles any remaining ISO variants Spark accepts.
    attempts.append(F.try_to_timestamp(c))
    if fallback_to_now:
        attempts.append(F.current_timestamp())
    return F.coalesce(*attempts)
