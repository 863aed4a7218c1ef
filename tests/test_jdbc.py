"""Executed JDBC tests (SURVEY.md section 2.1 S4-S7).

The round-trip runs in a subprocess (tools/jdbc_roundtrip.py) because
the JDBC driver jar must be on the classpath at JVM launch — the shared
test session can't add it later. Skips only when no DuckDB JDBC jar
exists in the local artifact caches.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from projet_5spar_sparkstreaming_spark.sources.jdbc import find_duckdb_jdbc_jar

pytestmark = pytest.mark.skipif(
    find_duckdb_jdbc_jar() is None,
    reason="no DuckDB JDBC jar in local artifact caches",
)


def test_jdbc_roundtrip_s4_s7(tmp_path):
    db = tmp_path / "rt.duckdb"
    proc = subprocess.run(
        [sys.executable, "tools/jdbc_roundtrip.py", str(db)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert "skip" not in out
    # S5 append twice -> 400; S6 truncate-overwrite -> 200.
    assert out["n_after_append"] == 400
    assert out["n_after_overwrite"] == 200
    # Values survive the round trip bit-exactly (order-insensitive).
    assert out["roundtrip_checksum_match"] is True
    # S4 partition-parallel scan: all rows, 4 bounded input partitions.
    assert out["n_partitioned"] == 200
    assert out["n_input_parts"] == 4
    # S4 analytics on the JDBC scan: 200 rows over 7 users, id%7 -> user_0
    # appears ceil(200/7) = 29 times and wins the tie-break.
    assert out["top_user"] == ["user_0", 29]
    # the reference's analytics suite over the JDBC round-trip equals
    # the same suite over the in-memory frame
    assert out["analytics_suite_match"] is True


def test_streaming_jdbc_sink_idempotent_replay(tmp_path):
    proc = subprocess.run(
        [sys.executable, "tools/jdbc_stream_roundtrip.py", str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert "skip" not in out
    # two micro-batches landed once each
    assert out["rows_after_first"] == 20
    assert out["batch_ids"] == [0, 1]
    # reprocessing the same input from a fresh checkpoint replaces the
    # same batch ids instead of appending duplicates
    assert out["rows_after_replay"] == 20
    assert out["total_value"] == sum(range(20))  # values 0..19 once each
