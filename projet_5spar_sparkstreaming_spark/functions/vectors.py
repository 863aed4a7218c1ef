"""Vector math over array<float> embedding columns — native expressions.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side (no Python
per row); at 100 TB this is the difference between a codegen'd scan and
an Arrow round-trip. A vectorized pandas-UDF top-k path for wide fan-out
lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """sum(a_i * b_i) as double."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_from_norms(
    a: Column | str, b: Column | str, norm_a: Column | str, norm_b: Column | str
) -> Column:
    """cosine when the row norms are already materialized as columns.

    Bit-identical to ``cosine_similarity`` (same sqrt/product/division
    sequence), but the norms are computed once per ROW instead of once
    per PAIR — the form every pairwise join should use: 1 aggregate per
    pair instead of 5 (measured 4.3s -> ~1s on the sampled exact
    pairwise join at sf0.1)."""
    denom = _c(norm_a) * _c(norm_b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (||a|| * ||b||); null-safe on zero norms.

    The dot/denominator pair is BOUND via a one-element transform:
    aggregate/zip_with run interpreted (no codegen CSE), so referencing
    ``denom`` in both the guard and the division would re-run both norm
    aggregates per row."""
    pair = F.struct(
        dot_product(a, b).alias("dot"), (l2_norm(a) * l2_norm(b)).alias("den")
    )
    return F.transform(
        F.array(pair),
        lambda p: F.when(p["den"] > 0, p["dot"] / p["den"]).otherwise(F.lit(0.0)),
    )[0]
