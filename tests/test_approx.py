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
