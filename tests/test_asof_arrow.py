"""Tests: as-of join semantics and Arrow knn parity with native knn."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.operators.asof import as_of_join
from projet_5spar_sparkstreaming_spark.operators.similarity import (
    brute_force_top_k,
    brute_force_top_k_arrow,
)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00", "p1"),
            ("u1", "2024-01-01 12:00:00", "p2"),
            ("u2", "2024-01-01 09:00:00", "p3"),  # before any right row
        ],
        ["user", "ts", "pid"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 09:30:00", 1.0),
            ("u1", "2024-01-01 11:00:00", 2.0),
            ("u1", "2024-01-01 13:00:00", 3.0),  # after all left rows
            ("u2", "2024-01-01 09:30:00", 4.0),
        ],
        ["user", "ts", "score"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = {
        r["pid"]: r["right_score"]
        for r in as_of_join(left, right, ["user"], "ts", "ts", ["score"]).collect()
    }
    assert out == {"p1": 1.0, "p2": 2.0, "p3": None}


def test_asof_join_inclusive_tie(spark):
    left = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", "p1")], ["user", "ts", "pid"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", 9.0)], ["user", "ts", "score"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = as_of_join(left, right, ["user"], "ts", "ts", ["score"]).collect()
    assert out[0]["right_score"] == 9.0  # equal ts counts (<=)


def test_arrow_knn_matches_native(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    native = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in brute_force_top_k(queries, emb, "vec_id", "vec_id", k=5).collect()
    }
    arrow = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in brute_force_top_k_arrow(queries, emb, "vec_id", "vec_id", k=5).collect()
    }
    assert native == arrow


def test_ivf_recall(spark, sf_dir):
    from projet_5spar_sparkstreaming_spark.operators.similarity import ivf_top_k

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_top_k(queries, emb, "vec_id", "vec_id", k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_top_k(
            queries, emb, "vec_id", "vec_id", k=5, n_centroids=16, n_probe=6
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"


def test_time_range_join_bin_boundaries(spark):
    from projet_5spar_sparkstreaming_spark.operators.rangejoin import time_range_join

    left = spark.createDataFrame(
        [("u", "2024-01-01 10:00:59", "l1")], ["k", "lts", "lid"]
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("u", "2024-01-01 10:00:58", "before"),      # before left -> no
            ("u", "2024-01-01 10:01:30", "in-next-bin"), # 31s after -> yes
            ("u", "2024-01-01 10:01:59", "at-bound"),    # exactly 60s -> yes
            ("u", "2024-01-01 10:02:00", "past-bound"),  # 61s -> no
            ("v", "2024-01-01 10:01:00", "wrong-key"),   # other key -> no
        ],
        ["k", "rts", "rid"],
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    got = sorted(
        r["rid"]
        for r in time_range_join(left, right, ["k"], "lts", "rts", 60).collect()
    )
    assert got == ["at-bound", "in-next-bin"]


def test_asof_join_null_payload_not_stitched(spark):
    """A null in one payload column must not be filled from an OLDER
    right row — the as-of payload is atomic per matched row."""
    left = spark.createDataFrame(
        [("u", "2024-01-01 12:00:00", "p1")], ["user", "ts", "pid"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("u", "2024-01-01 10:00:00", 1.0, "old-full"),
            ("u", "2024-01-01 11:00:00", None, "new-partial"),  # latest match
        ],
        ["user", "ts", "score", "tag"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = as_of_join(left, right, ["user"], "ts", "ts", ["score", "tag"]).collect()[0]
    assert row["right_tag"] == "new-partial"
    assert row["right_score"] is None  # NOT 1.0 from the older row


def test_arrow_knn_string_ids(spark):
    """Arrow knn and IVF derive id types from the input schema — string
    keys must work identically to longs (previously hard-coded long)."""
    from projet_5spar_sparkstreaming_spark.operators.similarity import ivf_top_k

    rows = [
        (f"doc-{i}", [float((i * 7 + j * 3) % 11) for j in range(8)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id string, embedding array<float>")
    queries = df.limit(4)
    out = brute_force_top_k_arrow(queries, df, "id", "id", k=3).collect()
    assert len(out) == 12
    assert all(isinstance(r["query_id"], str) and isinstance(r["neighbor_id"], str) for r in out)
    # IVF with string ids builds and returns typed ids too
    ivf = ivf_top_k(queries, df, "id", "id", k=3, n_centroids=4, n_probe=4).collect()
    assert ivf and all(isinstance(r["neighbor_id"], str) for r in ivf)


def test_arrow_knn_query_size_guard(spark):
    """The driver-side query collect raises past max_query_rows instead
    of silently materializing an unbounded side."""
    import pytest

    rows = [(i, [float(i + j) for j in range(4)]) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    with pytest.raises(ValueError, match="more than 10 rows"):
        brute_force_top_k_arrow(df, df, "id", "id", k=2, max_query_rows=10)
