"""Bucketed managed tables: the co-located-join path (write_bucketed).

At 100 TB the shuffle on a repeated fact-fact join key is the dominant
cost; bucketing both sides identically pays it once at write time.
These tests pin the property the layout promises: the bucketed join
plans WITHOUT an Exchange, and returns the same result as the plain
join.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.plans.materialize import write_bucketed
from projet_5spar_sparkstreaming_spark.sources.files import read_parquet_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    # The in-memory catalog forgets managed tables across sessions but
    # their warehouse dirs persist; clear orphans so overwrite works.
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"/root/repo/spark-warehouse/{name}", ignore_errors=True)
    orders = read_parquet_table(spark, sf_dir, "orders")
    li = read_parquet_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _joined(spark):
    # merge hint: at test scale Catalyst would broadcast tiny orders
    # (bypassing bucketing); at 100 TB both sides are fact-sized and
    # sort-merge is what the planner picks on its own.
    orders = spark.table("b_orders").hint("merge")
    li = spark.table("b_lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    df = _joined(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # Join itself must not shuffle either side: the only allowed
    # Exchange is the one feeding the final small aggregation.
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in join_section


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    got = {r["o_orderpriority"]: (r["n"], r["total"]) for r in _joined(spark).collect()}
    orders = read_parquet_table(spark, sf_dir, "orders")
    li = read_parquet_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )
    want = {r["o_orderpriority"]: (r["n"], r["total"]) for r in plain.collect()}
    assert got == want


def test_day_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Partition pruning: a day filter over a day-partitioned table must
    reach the scan as a PartitionFilter (listing-time pruning), not a
    data filter — the layout property SCALE.md's storage layer claims."""
    from projet_5spar_sparkstreaming_spark.plans.materialize import write_table

    ev = read_parquet_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = write_table(ev, str(tmp_path), "events_by_day", partition_col="day")

    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "2024-01-05" in plan
    # and the result only contains the requested day
    days = [r["day"] for r in back.select("day").distinct().collect()]
    assert [str(d) for d in days] == ["2024-01-05"]


def test_compact_table_rightsizes_and_sorts(spark, sf_dir, tmp_path):
    """Compaction: many small files -> few right-sized ones, same rows;
    with sort_cols the files carry DISJOINT min/max ranges on the sort
    key (footer-stats data skipping actually possible)."""
    import os

    import pyarrow.parquet as pq

    from projet_5spar_sparkstreaming_spark.plans.materialize import compact_table

    ev = read_parquet_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "frag")
    ev.repartition(40).write.parquet(path)  # simulate micro-batch fragmentation
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    total = spark.read.parquet(path).count()

    n_after = compact_table(spark, path, target_rows_per_file=total // 4 + 1,
                            sort_cols=["event_id"])
    assert n_after < n_before and n_after <= 4
    assert spark.read.parquet(path).count() == total

    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # event_id
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint key ranges across files


def test_write_table_bloom_filters(spark, tmp_path):
    """Bloom-filtered writes produce valid parquet with extra index
    bytes; data round-trips identically. (pyarrow in this container
    can't introspect bloom offsets, so presence is asserted via the
    size delta on identical data.)"""
    from projet_5spar_sparkstreaming_spark.plans.materialize import write_table

    df = spark.createDataFrame(
        [(i, f"user_{i % 997}") for i in range(20000)], "id long, user string"
    ).coalesce(1)
    plain = write_table(df, str(tmp_path), "no_bloom")
    bloomed = write_table(df, str(tmp_path), "bloom", bloom_filters=True)

    import os

    def total(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )

    assert total(bloomed) > total(plain)
    a = {tuple(r) for r in spark.read.parquet(plain).collect()}
    b = {tuple(r) for r in spark.read.parquet(bloomed).collect()}
    assert a == b and len(a) == 20000


def test_write_table_zstd_compression(spark, tmp_path):
    from projet_5spar_sparkstreaming_spark.plans.materialize import write_table

    df = spark.createDataFrame(
        [(i, "the same repetitive payload text " * 10) for i in range(5000)],
        "id long, text string",
    ).coalesce(1)
    snappy = write_table(df, str(tmp_path), "snappy_t")
    zstd = write_table(df, str(tmp_path), "zstd_t", compression="zstd")

    import os

    def total(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )

    assert total(zstd) < total(snappy)
    assert spark.read.parquet(zstd).count() == 5000
