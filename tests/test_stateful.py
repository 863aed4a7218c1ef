"""applyInPandasWithState custom stateful operator test."""

from __future__ import annotations

import json

from projet_5spar_sparkstreaming_spark.streaming.stateful import running_key_stats


def test_running_key_stats(spark, tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    rows = [
        {"user": "a", "value": 1.0},
        {"user": "a", "value": 3.0},
        {"user": "b", "value": 10.0},
    ]
    (d / "p0.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("user string, value double").json(str(d))
    )
    out = running_key_stats(stream, "user", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("state_tbl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["key"]: r for r in spark.sql("select * from state_tbl").collect()}
    assert got["a"]["n_events"] == 2
    assert got["a"]["total_value"] == 4.0
    assert got["a"]["max_value"] == 3.0
    assert got["b"]["n_events"] == 1
    assert got["b"]["total_value"] == 10.0


def test_stream_first_seen_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: rows emitted exactly
    once, duplicates in later micro-batches suppressed by keyed state."""
    import json

    from projet_5spar_sparkstreaming_spark.streaming.stateful import (
        stream_first_seen,
    )

    d = tmp_path / "dedup_in"
    d.mkdir()
    # Two files -> two micro-batches (maxFilesPerTrigger=1). Key "a"
    # repeats within batch 0 (order_col picks seq=1) and again in batch 1
    # (state suppresses it). "c" is new in batch 1.
    (d / "p0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc": "a", "seq": 2, "payload": "a-second"},
                {"doc": "a", "seq": 1, "payload": "a-first"},
                {"doc": "b", "seq": 1, "payload": "b-first"},
            ]
        )
    )
    (d / "p1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc": "a", "seq": 3, "payload": "a-late-dup"},
                {"doc": "c", "seq": 1, "payload": "c-first"},
            ]
        )
    )
    # the file source orders micro-batches by modification time; pin
    # mtimes so p0 deterministically forms batch 0
    import os
    import time

    now = time.time()
    os.utime(d / "p0.json", (now - 60, now - 60))
    os.utime(d / "p1.json", (now, now))
    stream = (
        spark.readStream.schema("doc string, seq long, payload string")
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    out = stream_first_seen(stream, ["doc"], order_col="seq")
    chk = str(tmp_path / "chk_first_seen")
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_tbl")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r["doc"]: r for r in spark.sql("select * from first_seen_tbl").collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["payload"] == "a-first"  # in-batch order_col tie-break
    assert rows["b"]["payload"] == "b-first"
    assert rows["c"]["payload"] == "c-first"
    n = spark.sql("select count(*) as n from first_seen_tbl").collect()[0]["n"]
    assert n == 3  # the batch-1 duplicate of "a" was suppressed by state


def test_stream_first_seen_with_ttl_executes(spark, tmp_path):
    """TTL variant (ProcessingTimeTimeout) executes; with a long TTL the
    behavior within the run is identical to no-TTL first-seen."""
    import json

    from projet_5spar_sparkstreaming_spark.streaming.stateful import (
        stream_first_seen,
    )

    d = tmp_path / "ttl_in"
    d.mkdir()
    (d / "p0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc": "x", "seq": 1, "payload": "x-first"},
                {"doc": "x", "seq": 2, "payload": "x-dup"},
                {"doc": "y", "seq": 1, "payload": "y-first"},
            ]
        )
    )
    stream = spark.readStream.schema("doc string, seq long, payload string").json(
        str(d)
    )
    out = stream_first_seen(stream, ["doc"], order_col="seq", ttl_ms=3_600_000)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_ttl_tbl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk_ttl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["doc"]: r["payload"]
        for r in spark.sql("select * from first_seen_ttl_tbl").collect()
    }
    assert rows == {"x": "x-first", "y": "y-first"}


def test_stream_first_seen_string_order_col(spark, tmp_path):
    """String (object-dtype) order columns must work: pandas nsmallest
    rejects them, which used to kill the whole streaming query; the
    sort_values path handles any orderable dtype."""
    import os

    from projet_5spar_sparkstreaming_spark.streaming.stateful import (
        stream_first_seen,
    )

    src = str(tmp_path / "ss_src")
    chk = str(tmp_path / "ss_chk")
    os.makedirs(src)
    spark.createDataFrame(
        [("a", "id2"), ("a", "id1"), ("b", "id9")], ["doc", "sid"]
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc string, sid string").parquet(src)
    out = stream_first_seen(stream, ["doc"], order_col="sid")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_str_order")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc"]: r["sid"] for r in spark.table("ss_str_order").collect()}
    assert got == {"a": "id1", "b": "id9"}
