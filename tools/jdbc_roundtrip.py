"""Executed JDBC round-trip (SURVEY.md section 2.1 S4-S7).

Runs in its OWN process because the JDBC driver jar must be on the
driver classpath when the JVM launches — the shared test session can't
load it after the fact. Exercises, against an embedded DuckDB database
file (standing in for the reference's Postgres,
reference: src/batch_analytics.py:16, src/batch_clean_historical.py:14):

- S5 append sink (`write_jdbc`, batched inserts)
- S6 overwrite sink
- S7 options-form sink (driver class via properties dict)
- S4 plain scan + partition-parallel scan (partitionColumn/bounds)

Prints one JSON line with the observed counts/checksums; the pytest
wrapper (tests/test_jdbc.py) asserts on it.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    db_path = sys.argv[1]

    from projet_5spar_sparkstreaming_spark.sources.jdbc import (
        find_duckdb_jdbc_jar,
        jdbc_execute,
        read_jdbc_table,
        write_jdbc,
    )

    jar = find_duckdb_jdbc_jar()
    if jar is None:
        print(json.dumps({"skip": "no duckdb jdbc jar"}))
        return

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("jdbc_roundtrip")
        .config("spark.jars", jar)
        .config("spark.driver.extraClassPath", jar)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    url = f"jdbc:duckdb:{db_path}"
    props = {"driver": "org.duckdb.DuckDBDriver"}

    # Source rows: deterministic toy of the reference's toots_clean shape.
    rows = [(i, f"user_{i % 7}", float(i) * 1.5, f"2024-01-{1 + i % 28:02d}") for i in range(200)]
    src = (
        spark.createDataFrame(rows, "id bigint, username string, score double, day string")
        .withColumn("day", F.to_date("day"))
        .repartition(2)
    )

    # DDL out-of-band (the reference used psql for this) — DuckDB's JDBC
    # driver does not expose a table created on one open connection to
    # concurrently opened ones, so Spark's implicit CREATE TABLE in
    # append mode can't be used here.
    jdbc_execute(
        spark,
        url,
        "CREATE TABLE IF NOT EXISTS toots_clean "
        '("id" BIGINT, "username" VARCHAR, "score" DOUBLE, "day" DATE)',
        driver="org.duckdb.DuckDBDriver",
    )

    # S5: append sink (two appends -> 400 rows).
    write_jdbc(src, url, "toots_clean", mode="append", properties=props)
    write_jdbc(src, url, "toots_clean", mode="append", properties=props)
    n_after_append = read_jdbc_table(spark, url, "toots_clean", properties=props).count()

    # S6: overwrite sink (back to 200 rows; truncate keeps the schema).
    write_jdbc(src, url, "toots_clean", mode="overwrite", properties=props, truncate=True)
    # customSchema pins id to BIGINT (DuckDB metadata reports it unsigned,
    # which Spark would otherwise widen to decimal(20,0)).
    back = read_jdbc_table(
        spark, url, "toots_clean", properties=props, custom_schema="id BIGINT"
    )
    n_after_overwrite = back.count()

    # Round-trip fidelity: order-insensitive checksum over all columns.
    def checksum(df):
        hashed = df.select(
            F.xxhash64("id", "username", F.round("score", 6), "day").alias("h")
        )
        return hashed.select(F.expr("bit_xor(h)").alias("x")).collect()[0]["x"]

    src_sum = checksum(src)
    back_sum = checksum(back)

    # S4: partition-parallel scan — 4 bounded partitions over id.
    part = read_jdbc_table(
        spark,
        url,
        "toots_clean",
        properties=props,
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=200,
    )
    n_partitioned = part.count()
    n_input_parts = part.rdd.getNumPartitions()

    # S4 analytics on the JDBC scan (reference batch_analytics groupBy).
    top = (
        read_jdbc_table(spark, url, "toots_clean", properties=props)
        .groupBy("username")
        .count()
        .orderBy(F.desc("count"), "username")
        .limit(1)
        .collect()[0]
    )

    # Reference flow parity (src/batch_analytics.py): the analytics
    # suite computed over a JDBC round-trip must equal the same suite
    # over the in-memory frame. mastodon_posts is array-free, so the
    # four non-hashtag analytics apply.
    from projet_5spar_sparkstreaming_spark.plans.toots import (
        active_users,
        avg_toot_length_by_user,
        daily_toot_counts,
        hourly_toot_counts,
        user_activity_counts,
    )

    toots = spark.createDataFrame(
        [
            (
                f"user_{i % 9}",
                ("great post " * (1 + i % 7)).strip(),
                f"2024-02-{1 + i % 10:02d} {i % 24:02d}:15:00",
            )
            for i in range(300)
        ],
        "username string, text string, created_at string",
    ).withColumn("created_at", F.col("created_at").cast("timestamp"))
    jdbc_execute(
        spark,
        url,
        "CREATE TABLE IF NOT EXISTS mastodon_posts "
        '("username" VARCHAR, "text" VARCHAR, "created_at" TIMESTAMP)',
        driver="org.duckdb.DuckDBDriver",
    )
    write_jdbc(toots, url, "mastodon_posts", mode="overwrite", properties=props, truncate=True)
    back_toots = read_jdbc_table(spark, url, "mastodon_posts", properties=props)

    def suite_sums(df):
        out = {}
        for name, adf in {
            "hourly": hourly_toot_counts(df),
            "daily": daily_toot_counts(df),
            "user_activity": user_activity_counts(df),
            "active": active_users(df, min_count=30),
            "avg_len": avg_toot_length_by_user(df),
        }.items():
            hashed = adf.select(F.xxhash64(*adf.columns).alias("h"))
            out[name] = hashed.select(F.expr("bit_xor(h)")).collect()[0][0]
        return out

    analytics_match = suite_sums(toots) == suite_sums(back_toots)

    print(
        json.dumps(
            {
                "n_after_append": n_after_append,
                "n_after_overwrite": n_after_overwrite,
                "roundtrip_checksum_match": bool(src_sum == back_sum),
                "n_partitioned": n_partitioned,
                "n_input_parts": n_input_parts,
                "top_user": [top["username"], top["count"]],
                "analytics_suite_match": bool(analytics_match),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
