"""Executed streaming -> JDBC round-trip (reference parity: the
stream->Postgres foreachBatch loop of src/spark_stream.py:107-144,
made replay-safe).

Own process because the JDBC jar must be on the classpath at JVM
launch. Streams a 2-file JSON directory (maxFilesPerTrigger=1 -> two
micro-batches) through ``idempotent_jdbc_sink`` into embedded DuckDB,
then REPROCESSES the same input from a fresh checkpoint: the delete-
before-insert batch keying must leave the table unchanged instead of
doubling it. Prints one JSON line for the pytest wrapper.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    workdir = sys.argv[1]
    db_path = os.path.join(workdir, "stream.duckdb")

    from projet_5spar_sparkstreaming_spark.sources.jdbc import (
        find_duckdb_jdbc_jar,
        jdbc_execute,
        read_jdbc_table,
    )

    jar = find_duckdb_jdbc_jar()
    if jar is None:
        print(json.dumps({"skip": "no duckdb jdbc jar"}))
        return

    from pyspark.sql import SparkSession

    from projet_5spar_sparkstreaming_spark.streaming.sinks import idempotent_jdbc_sink

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("jdbc_stream_roundtrip")
        .config("spark.jars", jar)
        .config("spark.driver.extraClassPath", jar)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    url = f"jdbc:duckdb:{db_path}"
    props = {"driver": "org.duckdb.DuckDBDriver"}

    src = os.path.join(workdir, "in")
    os.makedirs(src, exist_ok=True)
    for i, fname in enumerate(("p0.json", "p1.json")):
        with open(os.path.join(src, fname), "w") as f:
            for j in range(10):
                f.write(json.dumps({"user": f"u{j % 3}", "value": i * 10 + j}) + "\n")
    # pin mtimes: micro-batch order follows file modification time
    now = os.path.getmtime(os.path.join(src, "p1.json"))
    os.utime(os.path.join(src, "p0.json"), (now - 60, now - 60))

    jdbc_execute(
        spark,
        url,
        'CREATE TABLE IF NOT EXISTS posts ("user" VARCHAR, "value" BIGINT, "batch_id" BIGINT)',
        driver="org.duckdb.DuckDBDriver",
    )

    def run(checkpoint: str) -> None:
        stream = (
            spark.readStream.schema("user string, value long")
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        q = idempotent_jdbc_sink(
            stream,
            url,
            "posts",
            os.path.join(workdir, checkpoint),
            properties=props,
            driver="org.duckdb.DuckDBDriver",
            trigger={"availableNow": True},
        )
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError("jdbc stream not terminated in 180s")

    run("chk_a")
    back = read_jdbc_table(spark, url, "posts", properties=props, custom_schema="value BIGINT, batch_id BIGINT")
    rows_first = back.count()
    batches_first = sorted(r["batch_id"] for r in back.select("batch_id").distinct().collect())

    # fresh checkpoint -> the SAME input replays as the same batch ids;
    # delete-before-insert must replace, not duplicate
    run("chk_b")
    back2 = read_jdbc_table(spark, url, "posts", properties=props, custom_schema="value BIGINT, batch_id BIGINT")
    rows_second = back2.count()
    total_value = back2.groupBy().sum("value").collect()[0][0]

    print(
        json.dumps(
            {
                "rows_after_first": rows_first,
                "batch_ids": [int(b) for b in batches_first],
                "rows_after_replay": rows_second,
                "total_value": int(total_value),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
