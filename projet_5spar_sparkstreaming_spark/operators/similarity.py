"""Similarity search over embedding columns (array<float>).

North-star extension (BASELINE.json): approximate-nearest-neighbor for
training-data pipelines. Two paths:

- ``brute_force_top_k``: exact cosine top-k. The query side is
  broadcast (it is small by construction); the corpus streams through a
  codegen'd scan — no shuffle of the corpus at all, just a per-partition
  partial top-k then a tiny final top-k. This is the correctness
  baseline and is already the right *plan shape* at scale: broadcast
  the queries, never the corpus.

- ``lsh_bucketed_top_k``: random-hyperplane (sign) LSH. Corpus vectors
  hash to buckets once (linear scan, no shuffle beyond the bucket
  equi-join); only same-bucket candidates get exact scoring. With L
  tables of b bits the candidate set shrinks ~2^b-fold per table —
  the 100 TB path where a cross product is impossible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.functions.vectors import cosine_similarity
from projet_5spar_sparkstreaming_spark.operators.topk import top_k_per_group


def brute_force_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Deterministic tie-break: cosine desc, neighbor id asc.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    )
    joined = F.broadcast(q).crossJoin(c)
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("cosine"),
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    )


def _hyperplanes(dim: int, n_planes: int, table: int) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed per table)."""
    rng = np.random.RandomState(42 + table)
    return rng.randn(n_planes, dim).astype(float).tolist()


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    """Sign-bit bucket id of a vector against a set of hyperplanes —
    native expressions only (dot via zip_with over a literal array)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_bucketed_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 12,
    dim: int = 64,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via multi-table sign-LSH.

    Candidates = union over tables of same-bucket pairs; exact cosine
    re-scoring on candidates only; top-k per query. Recall grows with
    ``n_tables``; candidate cost shrinks with ``n_planes``.
    """
    def with_buckets(df: DataFrame, id_alias: str, vec_alias: str, idc: str, vecc: str):
        out = df.select(F.col(idc).alias(id_alias), F.col(vecc).alias(vec_alias))
        buckets = F.array(
            *[
                _bucket_expr(vec_alias, _hyperplanes(dim, n_planes, t))
                + F.lit(t << n_planes).cast("long")
                for t in range(n_tables)
            ]
        )
        return out.withColumn("__bucket", F.explode(buckets))

    q = with_buckets(queries, "query_id", "__qv", query_id, query_vec)
    c = with_buckets(corpus, "neighbor_id", "__cv", corpus_id, corpus_vec)
    cand = q.join(c, "__bucket")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("cosine"),
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    )
