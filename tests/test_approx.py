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
