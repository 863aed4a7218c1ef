"""Skew-resistant aggregation: two-phase salted group-by.

For heavy-hitter keys (the reference corpus has one user ≈20% of rows,
FIXTURES.md), a plain groupBy puts the hot key's entire traffic on one
reduce task. Salting splits each key across ``n_salts`` partial groups
(phase 1: shuffle on (key, salt) — balanced), then combines the
partials (phase 2: shuffle on key, but now one row per (key, salt)).

Results are bit-identical to the unsalted aggregation for algebraic
aggregates (count/sum/min/max); this is the pattern AQE's skew handling
automates for joins but not for aggregations.

Note Spark already map-side-combines hash aggregations, which de-skews
count/sum in most cases; explicit salting matters when the combine is
ineffective (high-cardinality sub-keys, collect-style aggregates) — the
operator exists for those, and as the documented pattern.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    n_salts: int = 16,
    counts: bool = True,
    sums: Sequence[str] = (),
) -> DataFrame:
    """count(*) and/or sum(col) per key, computed skew-resistantly.

    Output columns: *key_cols, cnt (if counts), sum_<c> for each c.
    """
    key_cols = list(key_cols)
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    phase1_aggs = []
    if counts:
        phase1_aggs.append(F.count("*").alias("__cnt"))
    for c in sums:
        phase1_aggs.append(F.sum(c).alias(f"__sum_{c}"))
    partial = salted.groupBy(*key_cols, "__salt").agg(*phase1_aggs)
    phase2_aggs = []
    if counts:
        phase2_aggs.append(F.sum("__cnt").alias("cnt"))
    for c in sums:
        phase2_aggs.append(F.sum(f"__sum_{c}").alias(f"sum_{c}"))
    return partial.groupBy(*key_cols).agg(*phase2_aggs)
