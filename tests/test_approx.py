"""approx_count_distinct sanity vs exact counts (COVERAGE §2.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.sources.files import read_parquet_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    ev = read_parquet_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r["approx"] - r["exact"]) / max(r["exact"], 1)
        assert rel_err <= 0.1, f"{r['event_type']}: {r['approx']} vs {r['exact']}"


def test_approx_percentile_within_rank_tolerance(spark, sf_dir):
    """approx_percentile (Greenwald-Khanna sketch): the returned value's
    true rank must be within `accuracy`-implied error of the target
    rank — the sketch's actual contract, checked against exact data."""
    ev = read_parquet_table(spark, sf_dir, "events")
    n = ev.count()
    acc = 100  # rank error <= n / acc
    got = ev.agg(
        F.percentile_approx("value", [0.25, 0.5, 0.75], acc).alias("ap")
    ).collect()[0]["ap"]
    values = sorted(r["value"] for r in ev.select("value").collect())
    for target, approx_v in zip((0.25, 0.5, 0.75), got):
        import bisect

        rank = bisect.bisect_left(values, approx_v)
        assert abs(rank - target * n) <= n / acc + 1, (
            f"p{target}: value {approx_v} at rank {rank}, want ~{target * n}"
        )


def test_auto_ivf_probe_holds_probed_fraction():
    """r10: a fixed n_probe erodes recall as cells scale ~sqrt(n)
    (measured 0.996 -> 0.874 going 5M -> 50M rows at n_probe=4);
    auto_ivf_probe holds a constant fraction of cells with a floor."""
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_ivf_centroids,
        auto_ivf_probe,
    )

    assert auto_ivf_probe(16) == 4  # floor
    assert auto_ivf_probe(559) == 4  # the 5M tier: same as the old fixed 4
    assert auto_ivf_probe(1768) == 14  # the 50M tier: fraction held
    assert auto_ivf_probe(4096) == 33
    # monotone in cells
    vals = [auto_ivf_probe(auto_ivf_centroids(10**e)) for e in range(3, 10)]
    assert vals == sorted(vals)


def test_ivf_top_k_auto_probe_resolves(spark):
    import numpy as np

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        brute_force_top_k_arrow,
        ivf_top_k,
    )

    rng = np.random.default_rng(4)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 5")
    approx = ivf_top_k(
        q, df, "vec_id", "vec_id", k=3, n_centroids="auto", n_probe="auto"
    )
    exact = brute_force_top_k_arrow(q, df, "vec_id", "vec_id", k=3)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.5  # auto resolved and sane


def test_needs_ivf_rebuild_predicate_pure_metadata():
    """The rebuild-when-outgrown policy is a pure metadata predicate:
    trips at growth_factor x sized_for_rows, resets with the field,
    declines explicitly for pre-r12 metas (the old min-batch fallback
    read a post-compaction merged count as the sizing — inflated, so
    the trigger was suppressed; r12 advice), and never trips on
    missing/empty metadata."""
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        needs_ivf_rebuild,
    )

    assert not needs_ivf_rebuild(None)
    assert not needs_ivf_rebuild({"batches": {}})
    base = {"batches": {"0": 100, "1": 100, "2": 100}, "sized_for_rows": 100}
    assert not needs_ivf_rebuild(base)  # 300 < 4*100
    grown = {**base, "batches": {**base["batches"], "3": 100}}
    assert needs_ivf_rebuild(grown)  # 400 >= 4*100
    assert not needs_ivf_rebuild(grown, growth_factor=8.0)
    # a rebuild resets sized_for_rows to the flip-time total
    assert not needs_ivf_rebuild({**grown, "sized_for_rows": 400})
    # legacy meta without the field: DECLINE until compact/rebuild
    # backfills it — after a compaction the min batch is a merged SUM,
    # so any inference from batch counts is corrupted evidence
    legacy = {"batches": {"0": 50, "1": 50, "2": 50, "3": 50}}
    assert not needs_ivf_rebuild(legacy)
    assert not needs_ivf_rebuild({"batches": {"0": 100, "1": 50}})
    # build sized for an EXPECTED corpus (expected_rows) doesn't trip
    # while the stream is still filling up to it
    assert not needs_ivf_rebuild(
        {"batches": {"0": 10, "1": 500}, "sized_for_rows": 2_000_000}
    )


def test_needs_embed_lsh_rebuild_predicate_pure_metadata():
    """Embed-family rebuild policy: pure metadata, trips when the
    sizing math at the CURRENT total wants >= 1 more plane than the
    index pinned, resets after a rebuild updates the params."""
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_lsh_params,
        needs_embed_lsh_rebuild,
    )

    assert not needs_embed_lsh_rebuild(None)
    assert not needs_embed_lsh_rebuild({"batches": {}, "n_planes": 4, "dim": 64})
    p100, _ = auto_lsh_params(100, dim=64)
    p1200, _ = auto_lsh_params(1200, dim=64)
    assert p1200 > p100  # planes grow ~log2(n)
    small = {"n_planes": p100, "dim": 64, "batches": {"0": 100}}
    assert not needs_embed_lsh_rebuild(small)
    grown = {**small, "batches": {"0": 100, "1": 400, "2": 700}}
    assert needs_embed_lsh_rebuild(grown)
    # after a rebuild the pinned planes match the sizing math again
    assert not needs_embed_lsh_rebuild({**grown, "n_planes": p1200})
    # min_extra_planes raises the bar
    assert not needs_embed_lsh_rebuild(grown, min_extra_planes=(p1200 - p100 + 1))
