"""r9 verdict task 5: the engine scopes the vectorized parquet
reader's batch size around its OWN wide-vector jobs (the conf is read
at ACTION time, so only engine-owned actions — the embed ingest
guard's foreachBatch body, the wide-store compaction rewrites — can
scope it; lazy query builders cannot scope a caller's later action).
Narrow scans must keep the 4096 default (the r9 global pin measured
~2x slower on 5M-row narrow scans)."""

from __future__ import annotations

import pytest

from projet_5spar_sparkstreaming_spark.session import (
    scoped_conf,
    wide_vector_reader_capacity,
)

KEY = "spark.sql.parquet.columnarReaderBatchSize"


def test_capacity_formula():
    # narrow arrays: default already safe -> None (no conf change)
    assert wide_vector_reader_capacity(64) is None
    assert wide_vector_reader_capacity(None) is None
    assert wide_vector_reader_capacity(0) is None
    # dim 768 doubles: 8MB / (768*8) = 1365 rows (~25MB at the default)
    assert wide_vector_reader_capacity(768) == 1365
    # absurdly wide: floor at 512 so row-group overhead never dominates
    assert wide_vector_reader_capacity(1_000_000) == 512
    # float32 elements halve the pressure: dim-768 f32 batches are
    # ~12.5MB at the default — under the 16MB cutover, no change
    assert wide_vector_reader_capacity(768, elem_bytes=4) is None
    assert wide_vector_reader_capacity(1536, elem_bytes=4) == 1365


def test_scoped_conf_sets_and_restores(spark):
    default = spark.conf.get(KEY)
    with scoped_conf(spark, {KEY: 1024}):
        assert spark.conf.get(KEY) == "1024"
        # nesting restores to the OUTER override, not the default
        with scoped_conf(spark, {KEY: 512}):
            assert spark.conf.get(KEY) == "512"
        assert spark.conf.get(KEY) == "1024"
    assert spark.conf.get(KEY) == default
    # exception path still restores
    with pytest.raises(ValueError):
        with scoped_conf(spark, {KEY: 2048}):
            raise ValueError("boom")
    assert spark.conf.get(KEY) == default


def test_embed_guard_scopes_wide_reader_conf(spark, tmp_path, monkeypatch):
    """During a wide-dim (768) micro-batch the guard must run under
    the computed capacity; after the stream the session is back at the
    default; a narrow-dim (64) stream never changes the conf."""
    import json as _json
    import os
    import time

    import numpy as np

    import projet_5spar_sparkstreaming_spark.session as session_mod
    from projet_5spar_sparkstreaming_spark.streaming.dedup import (
        stream_embed_neardup_ingest,
    )

    default = spark.conf.get(KEY)
    observed: list[tuple[dict, str]] = []
    real = session_mod.scoped_conf

    class Spy(real):
        def __enter__(self):
            r = real.__enter__(self)
            # observe on the scope's OWN session: foreachBatch bodies
            # run on the stream's CLONED SparkSession, so the override
            # lands there (and can never leak to the caller's session)
            observed.append((dict(self._confs), self._spark.conf.get(KEY)))
            return r

    monkeypatch.setattr(session_mod, "scoped_conf", Spy)

    def run(dim: int, tag: str):
        rng = np.random.RandomState(5)
        src = tmp_path / f"src_{tag}"
        src.mkdir()
        for b in range(2):
            rows = [
                {
                    "vec_id": b * 10 + i,
                    "embedding": [float(x) for x in rng.randn(dim)],
                }
                for i in range(3)
            ]
            p = src / f"b{b}.json"
            p.write_text("\n".join(_json.dumps(r) for r in rows))
            ts = time.time() - (2 - b) * 60
            os.utime(p, (ts, ts))
        stream = (
            spark.readStream.schema(f"vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = stream_embed_neardup_ingest(
            stream,
            str(tmp_path / f"out_{tag}"),
            str(tmp_path / f"idx_{tag}"),
            str(tmp_path / f"chk_{tag}"),
            trigger={"availableNow": True},
            dim=dim,
        )
        q.awaitTermination(180)

    run(768, "wide")
    wide_caps = [c.get(KEY) for c, _ in observed]
    wide_during = [v for _, v in observed]
    assert all(c == "1365" for c in wide_caps), wide_caps
    assert all(v == "1365" for v in wide_during), wide_during
    assert spark.conf.get(KEY) == default, "conf not restored after stream"

    observed.clear()
    run(64, "narrow")
    # narrow dims: the scope is a no-op (empty conf dict), default holds
    assert all(c == {} for c, _ in observed), observed
    assert all(v == default for _, v in observed), observed
    assert spark.conf.get(KEY) == default
