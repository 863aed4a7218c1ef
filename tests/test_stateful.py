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
