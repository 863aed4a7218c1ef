"""Self-determinism fuzz: every catalog query must hash identically
under different shuffle-partition counts.

This catches the whole class of order-dependent results (double sums /
averages whose partial-aggregation order leaks into rounded output)
WITHOUT an external oracle — if the result changes when the partition
count changes, it would also change between local[32] and a
1000-executor cluster. Usage:

    python tools/determinism_check.py [sf_dir] [partitions_a] [partitions_b]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.verify_local import table_hash  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    parts_a = sys.argv[2] if len(sys.argv) > 2 else "32"
    parts_b = sys.argv[3] if len(sys.argv) > 3 else "7"

    # streaming / ML entries need their own harness; everything batch runs
    skip = {"stream_minute_counts", "sentiment_scores"}
    only = set(sys.argv[4:])  # optional query-name subset

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("determinism_check")
        .getOrCreate()
    )
    failures = 0
    for q in catalog():
        if q.name in skip or (only and q.name not in only):
            continue
        hashes = []
        for parts in (parts_a, parts_b):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            df = q.build(spark, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            hashes.append(table_hash(df.columns, rows))
        ok = hashes[0] == hashes[1]
        print(f"{'PASS' if ok else 'FAIL'}  {q.name}")
        failures += 0 if ok else 1
    print(f"\n{failures} order-dependent quer{'y' if failures == 1 else 'ies'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
