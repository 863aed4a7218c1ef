"""Stream-stream interval join + keyed parquet upsert tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.sinks import upsert_parquet
from projet_5spar_sparkstreaming_spark.streaming.joins import interval_join


def _write_events(d, name, rows):
    (d / name).write_text("\n".join(json.dumps(r) for r in rows))


def test_stream_stream_interval_join(spark, tmp_path):
    ldir = tmp_path / "purchases"
    rdir = tmp_path / "signups"
    ldir.mkdir()
    rdir.mkdir()
    _write_events(
        ldir,
        "p.json",
        [
            {"user": "a", "p_ts": "2024-01-01 10:05:00", "amount": 5.0},
            {"user": "a", "p_ts": "2024-01-01 11:00:00", "amount": 7.0},  # too late
            {"user": "b", "p_ts": "2024-01-01 10:06:00", "amount": 9.0},  # no signup
        ],
    )
    _write_events(
        rdir,
        "s.json",
        [
            {"user": "a", "s_ts": "2024-01-01 10:00:00", "plan": "pro"},
        ],
    )
    left = (
        spark.readStream.schema("user string, p_ts string, amount double")
        .json(str(ldir))
        .withColumn("p_ts", F.col("p_ts").cast("timestamp"))
    )
    right = (
        spark.readStream.schema("user string, s_ts string, plan string")
        .json(str(rdir))
        .withColumn("s_ts", F.col("s_ts").cast("timestamp"))
    )
    joined = interval_join(
        left,
        right,
        ["user"],
        "p_ts",
        "s_ts",
        lower_bound="10 minutes",  # signup at most 10 min before purchase
        upper_bound="0 seconds",
        watermark="30 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_tbl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ssj_tbl").collect()
    # only (a, 10:05) purchase joins the 10:00 signup within 10 minutes
    assert len(rows) == 1
    assert rows[0]["user"] == "a" and rows[0]["amount"] == 5.0 and rows[0]["plan"] == "pro"


def test_upsert_parquet_keyed(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("k1", "v1", 1), ("k2", "v2", 1)], ["k", "v", "ver"]
    )
    upsert_parquet(spark, path, base, ["k"])
    updates = spark.createDataFrame(
        [("k2", "v2-new", 2), ("k3", "v3", 1)], ["k", "v", "ver"]
    )
    upsert_parquet(spark, path, updates, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"k1": "v1", "k2": "v2-new", "k3": "v3"}

    # idempotent: re-applying the same updates changes nothing
    upsert_parquet(spark, path, updates, ["k"])
    again = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert again == got


def test_upsert_parquet_two_writer_race_loser_aborts(spark, tmp_path):
    """Optimistic-concurrency CAS: two writers merge from the SAME table
    snapshot; the first commit wins, the second must abort with
    ConcurrentWriteError and leave the winner's data untouched (no
    silent clobber of a state the loser's merge never saw)."""
    import pytest as _pytest

    from projet_5spar_sparkstreaming_spark.sinks import (
        ConcurrentWriteError,
        read_table_version,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([("k1", "v1")], ["k", "v"])
    upsert_parquet(spark, path, base, ["k"])

    # both writers snapshot the same committed version
    snapshot = read_table_version(path)
    writer_a = spark.createDataFrame([("k2", "from-a")], ["k", "v"])
    writer_b = spark.createDataFrame([("k2", "from-b"), ("k3", "b3")], ["k", "v"])

    # B commits first against the shared snapshot
    upsert_parquet(spark, path, writer_b, ["k"], expected_version=snapshot)
    # A's merge was computed against the pre-B state: must abort
    with _pytest.raises(ConcurrentWriteError):
        upsert_parquet(spark, path, writer_a, ["k"], expected_version=snapshot)

    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"k1": "v1", "k2": "from-b", "k3": "b3"}  # winner intact
    # no staging/old debris left behind by the aborted writer
    leftovers = [p for p in tmp_path.iterdir() if "__staging" in p.name or "__old" in p.name]
    assert leftovers == []

    # A retries from the NEW snapshot and succeeds
    upsert_parquet(spark, path, writer_a, ["k"])
    got2 = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got2["k2"] == "from-a"


def test_upsert_parquet_versioned_stale_update_loses(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([("k1", "fresh", 5)], ["k", "v", "ver"])
    upsert_parquet(spark, path, base, ["k"], version_col="ver")
    stale = spark.createDataFrame([("k1", "stale", 3)], ["k", "v", "ver"])
    upsert_parquet(spark, path, stale, ["k"], version_col="ver")
    got = spark.read.parquet(path).collect()
    assert len(got) == 1 and got[0]["v"] == "fresh"  # higher version kept


def test_format_registry_roundtrip(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from projet_5spar_sparkstreaming_spark.sources.registry import (
        read_table,
        write_table,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    expect = sorted((r["doc_id"], r["n_chars"]) for r in docs.collect())
    for fmt in ["parquet", "orc", "json", "csv"]:
        p = str(tmp_path / f"t_{fmt}")
        write_table(docs, p, fmt=fmt)
        back = read_table(spark, p, fmt=fmt, schema=docs.schema)
        got = sorted((r["doc_id"], r["n_chars"]) for r in back.collect())
        assert got == expect, fmt

    with _pytest.raises(ValueError):
        write_table(docs, str(tmp_path / "x"), fmt="xml")
    with _pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "t_csv"), fmt="csv", schema=None)


def test_stream_stream_left_outer_join_emits_on_expiry(spark, tmp_path):
    """Left-outer stream-stream join: unmatched left rows are held in
    state and emitted with nulls only once the GLOBAL watermark (min
    across both sources) passes their bound — verified with a restart
    and watermark-advancing sentinels on BOTH streams."""
    ldir = tmp_path / "purchases"
    rdir = tmp_path / "signups"
    ckpt = str(tmp_path / "ckpt")
    ldir.mkdir()
    rdir.mkdir()
    _write_events(
        ldir,
        "p0.json",
        [
            {"user": "a", "p_ts": "2024-01-01 10:05:00", "amount": 5.0},
            {"user": "b", "p_ts": "2024-01-01 10:06:00", "amount": 9.0},  # no signup
        ],
    )
    _write_events(
        rdir, "s0.json", [{"user": "a", "s_ts": "2024-01-01 10:00:00", "plan": "pro"}]
    )

    def build():
        left = (
            spark.readStream.schema("user string, p_ts string, amount double")
            .json(str(ldir))
            .withColumn("p_ts", F.col("p_ts").cast("timestamp"))
        )
        right = (
            spark.readStream.schema("user string, s_ts string, plan string")
            .json(str(rdir))
            .withColumn("s_ts", F.col("s_ts").cast("timestamp"))
        )
        return interval_join(
            left,
            right,
            ["user"],
            "p_ts",
            "s_ts",
            lower_bound="10 minutes",
            upper_bound="0 seconds",
            watermark="30 minutes",
            how="left_outer",
        )

    out_dir = str(tmp_path / "ssj_out")

    def run():
        # parquet sink: memory sinks cannot recover from a checkpoint
        q = (
            build()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir).collect()

    first = run()
    # matched row emits immediately; unmatched ones are still in state
    assert {(r["user"], r["plan"]) for r in first} == {("a", "pro")}

    # sentinels push both watermarks to 12:00 - 30min = 11:30 > 10:06
    _write_events(
        ldir, "p1.json", [{"user": "z", "p_ts": "2024-01-01 12:00:00", "amount": 0.0}]
    )
    _write_events(
        rdir, "s1.json", [{"user": "z", "s_ts": "2024-01-01 12:00:00", "plan": "none"}]
    )
    second = run()
    # b's purchase expired unmatched -> emitted with null plan
    assert ("b", None) in {(r["user"], r["plan"]) for r in second}


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema drift: files written before a column existed read as NULL
    under the merged schema; no file's footer is silently trusted."""
    from projet_5spar_sparkstreaming_spark.sources.files import read_parquet_evolving

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "name", "score"]
    ).write.mode("append").parquet(path)

    df = read_parquet_evolving(spark, path)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {1: None, 2: 9.5}


def test_upsert_parquet_failed_swap_restores_live_table(spark, tmp_path, monkeypatch):
    """If the staging->table rename fails after the live table was
    already moved aside, the live table must be restored — never left
    nonexistent with the only merged copy deleted."""
    import os

    path = str(tmp_path / "tbl_swapfail")
    base = spark.createDataFrame([("k1", "v1")], ["k", "v"])
    upsert_parquet(spark, path, base, ["k"])

    real_rename = os.rename

    def failing_rename(src, dst):
        if dst == path and "__staging_" in src:
            raise OSError("simulated swap failure")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    updates = spark.createDataFrame([("k1", "v1-new")], ["k", "v"])
    import pytest as _pytest

    with _pytest.raises(OSError, match="simulated swap failure"):
        upsert_parquet(spark, path, updates, ["k"])
    monkeypatch.undo()

    # live table restored with the pre-merge contents, staging cleaned
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"k1": "v1"}
    leftovers = [d for d in os.listdir(str(tmp_path)) if "__staging_" in d or "__old_" in d]
    assert leftovers == []


def test_write_jsonl_roundtrip(spark, sf_dir, tmp_path):
    """JSONL export: curated docs shard to gzip JSON-lines partitioned
    by lang, and read back row-identical through spark.read.json (the
    consumer side of a training-data delivery)."""
    from projet_5spar_sparkstreaming_spark.sinks import write_jsonl

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text", "n_chars")
        .filter(F.col("doc_id") < 200)
    )
    out = str(tmp_path / "export")
    write_jsonl(docs, out, partition_by=["lang"], shards=2)

    import glob
    import os

    files = glob.glob(os.path.join(out, "lang=*", "*.json.gz"))
    assert files, "expected gzip jsonl shards under lang= partitions"
    langs = {p.split("lang=")[1].split(os.sep)[0] for p in files}
    assert len(langs) > 1
    # shards bounds files PER PARTITION VALUE and actually spreads rows
    # (the salt): each lang <= shards files, and at least one lang uses
    # more than one file
    per_lang = {
        lang: sum(1 for p in files if f"lang={lang}" in p) for lang in langs
    }
    assert all(c <= 2 for c in per_lang.values()), per_lang
    assert any(c > 1 for c in per_lang.values()), per_lang

    back = spark.read.json(out)
    a = {
        (r["doc_id"], r["lang"], r["text"], r["n_chars"])
        for r in docs.collect()
    }
    b = {
        (r["doc_id"], r["lang"], r["text"], int(r["n_chars"]))
        for r in back.collect()
    }
    assert a == b


def test_write_jsonl_nested_map_and_dotted_names(spark, tmp_path):
    """Regression (r7 advice): the content-hash shard salt must route
    NESTED map types (array<map>, struct-with-map) through to_json —
    xxhash64 rejects MapType at any depth, not just top level — and
    must reference dotted column names literally (F.col('a.b') parses
    as a nested field; df['a.b'] does not)."""
    from projet_5spar_sparkstreaming_spark.sinks import write_jsonl

    df = spark.createDataFrame(
        [
            (1, [{"k": "v"}], {"tags": {"x": "1"}}, "d1"),
            (2, [{"k": "w"}], {"tags": {"y": "2"}}, "d2"),
            (3, [], {"tags": {}}, "d3"),
        ],
        "id long, maps array<map<string,string>>, "
        "meta struct<tags: map<string,string>>, `dot.ted` string",
    )
    out = str(tmp_path / "nested")
    write_jsonl(df, out, shards=2, compression=None)
    back = spark.read.json(out)
    assert back.count() == 3
    got = {r["id"]: r["dot.ted"] for r in back.collect()}
    assert got == {1: "d1", 2: "d2", 3: "d3"}
