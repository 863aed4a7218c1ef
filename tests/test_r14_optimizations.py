"""Focused tests for the r14 optimization rewrites: the split-long
exact sums that replaced wide-decimal aggregation in the TPC-H catalog
shapes, and the closure-matmul exact cosine pair scorer that replaced
the broadcast cross-join + per-pair HOF dot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_split_sum_matches_decimal_sum_including_negatives(spark):
    from projet_5spar_sparkstreaming_spark.plans.catalog import (
        _split_sum,
        _split_total,
        _split_val,
    )

    # signed 1e-4 fixed-point values spanning sign changes, zero, and
    # magnitudes past the 2^20 split base in both directions
    vals_e4 = [
        0,
        1,
        -1,
        49,
        50,
        51,
        -49,
        -50,
        -51,
        (1 << 20) - 1,
        1 << 20,
        (1 << 20) + 1,
        -(1 << 20) - 7,
        123_456_789_012,
        -987_654_321_001,
    ]
    df = spark.createDataFrame([(v,) for v in vals_e4], "v long")
    got = (
        df.agg(*_split_sum(F.col("v"), "x"))
        .select(
            _split_val("x", 4).alias("rounded"),
            _split_total("x").alias("total_e4"),
        )
        .collect()[0]
    )
    exact = sum(vals_e4)
    assert int(got["total_e4"]) == exact
    # decimal-sum reference: round(sum(v * 1e-4), 2) HALF_UP
    ref = (
        df.agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,0)"))
                / F.lit(10_000).cast("decimal(8,0)"),
                2,
            )
            .cast("double")
            .alias("r")
        ).collect()[0]["r"]
    )
    assert got["rounded"] == ref


def test_split_sum_groups_match_decimal_groups(spark):
    from projet_5spar_sparkstreaming_spark.plans.catalog import (
        _split_sum,
        _split_val,
    )

    rows = [(i % 7, (-1) ** i * (i * 137 + i * i * 11)) for i in range(5_000)]
    df = spark.createDataFrame(rows, "k int, v long")
    got = {
        r["k"]: r["s"]
        for r in df.groupBy("k")
        .agg(*_split_sum(F.col("v"), "x"))
        .select("k", _split_val("x", 4).alias("s"))
        .collect()
    }
    ref = {
        r["k"]: r["s"]
        for r in df.groupBy("k")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,0)"))
                / F.lit(10_000).cast("decimal(8,0)"),
                2,
            )
            .cast("double")
            .alias("s")
        )
        .collect()
    }
    assert got == ref


def test_exact_cosine_pairs_arrow_matches_hof_crossjoin(spark):
    numpy = pytest.importorskip("numpy")
    from projet_5spar_sparkstreaming_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
    )
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        exact_cosine_pairs_arrow,
    )

    rng = numpy.random.default_rng(7)
    vecs = rng.standard_normal((120, 16))
    vecs /= numpy.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    )
    a = df.filter(F.col("vec_id") % 5 == 0)
    got = sorted(
        tuple(r)
        for r in exact_cosine_pairs_arrow(
            a, df, "vec_id", "embedding", threshold=0.1
        ).collect()
    )
    av = a.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        l2_norm("embedding").alias("__na"),
    )
    bv = df.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        l2_norm("embedding").alias("__nb"),
    )
    ref = sorted(
        tuple(r)
        for r in F.broadcast(av)
        .crossJoin(bv)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_from_norms("va", "vb", "__na", "__nb"), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= 0.1)
        .collect()
    )
    assert got == ref
    assert len(got) > 0


def test_shingle_arrays_arrow_matches_hof_semantics(spark):
    """The Arrow shingler's per-doc sets must induce the SAME pairwise
    overlap structure as the JVM HOF shingler (hash family differs;
    shingle IDENTITY — which token sequences compare equal — must not),
    including the edge conventions: short docs (one truncated gram),
    empty docs (one shared sentinel), NULL text (no row)."""
    pytest.importorskip("numpy")
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        _shingle_arrays,
    )

    docs = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta zeta"),   # near-dup of 0
        (2, "alpha beta"),                     # short (<n): one truncated gram
        (3, "alpha beta"),                     # identical short doc
        (4, ""),                               # empty: sentinel shingle
        (5, ""),                               # matches other empty docs
        (6, None),                             # NULL: no shingles at all
        (7, "alpha beta gamma delta epsilon"),  # exact dup of 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def overlap_matrix(use_arrow: bool):
        rows = _shingle_arrays(
            df, "doc_id", "text", 3, use_arrow=use_arrow
        ).collect()
        # NULL-text docs: the HOF form keeps a row with a NULL array,
        # the Arrow form emits no row — downstream-identical (explode
        # drops the row, verify joins are inner on id); normalize here
        sets = {r["__id"]: set(r["__sh"]) for r in rows if r["__sh"] is not None}
        ids = sorted(sets)
        return ids, {
            (a, b): (len(sets[a] & sets[b]), len(sets[a]), len(sets[b]))
            for a in ids
            for b in ids
        }

    ids_a, mat_a = overlap_matrix(True)
    ids_h, mat_h = overlap_matrix(False)
    assert ids_a == ids_h == [0, 1, 2, 3, 4, 5, 7]  # NULL doc absent
    assert mat_a == mat_h
    # sanity: the structure itself is what the conventions promise
    assert mat_a[(2, 3)][0] == 1  # identical short docs share their gram
    assert mat_a[(4, 5)][0] == 1  # empty docs share the sentinel
    assert mat_a[(0, 7)][0] == mat_a[(0, 0)][1]  # exact dup: full overlap


def test_exact_cosine_pairs_arrow_bounded_a_side(spark):
    pytest.importorskip("numpy")
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        exact_cosine_pairs_arrow,
    )

    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="more than 10 rows"):
        exact_cosine_pairs_arrow(
            df, df, "vec_id", "embedding", threshold=0.5, max_a_rows=10
        )
