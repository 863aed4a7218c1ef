"""Trigger auto-sizing: the proportional controller must pick batch
sizes whose resulting per-batch duration lands inside a declared band
around the target, across the cost regimes the ingest guards actually
exhibit (fixed-dominated through marginal-dominated)."""

from __future__ import annotations

import pytest

from projet_5spar_sparkstreaming_spark.streaming.tuning import (
    batch_durations_sec,
    recommend_files_per_trigger,
)


def _progress(durations_sec):
    """Fake StreamingQueryProgress list: one warmup batch plus the
    given steady durations."""
    return [
        {"durationMs": {"triggerExecution": int(s * 1000)}, "numInputRows": 1000}
        for s in [durations_sec[0] * 3] + list(durations_sec)
    ]


@pytest.mark.parametrize(
    "fixed_sec,marginal_sec_per_file",
    [
        (2.0, 0.01),  # the measured ingest-guard regime: fixed dominates
        (2.0, 0.5),   # mixed
        (0.5, 1.0),   # marginal dominates
        (0.1, 0.05),  # tiny batches, target far above one file's cost
    ],
)
def test_controller_converges_into_target_band(fixed_sec, marginal_sec_per_file):
    """Iterating recommend_files_per_trigger across (re)starts against
    a linear cost model duration = fixed + marginal*files must settle
    on a size whose duration is within [0.5, 1.5]x the target — or be
    pinned at a clamp when the target is unreachable (then the clamped
    size must be the best achievable side)."""
    target = 10.0
    lo, hi = 0.5 * target, 1.5 * target
    min_f, max_f = 1, 256

    def duration(files):
        return fixed_sec + marginal_sec_per_file * files

    x = 1
    for _ in range(6):  # a handful of restarts
        prog = _progress([duration(x)] * 4)
        nxt = recommend_files_per_trigger(
            prog, current=x, target_batch_sec=target,
            min_files=min_f, max_files=max_f,
        )
        if nxt == x:
            break
        x = nxt
    d = duration(x)
    if lo <= d <= hi:
        return
    # outside the band is only legal at a clamp, and only when the
    # clamp genuinely prevents reaching the band
    assert x in (min_f, max_f)
    if x == max_f:
        assert d < lo  # even the biggest batch is faster than the band
    else:
        assert d > hi  # even one file is slower than the band


def test_recommendation_monotone_in_observed_duration():
    """Slower observed batches -> smaller (or equal) recommendation;
    the controller must never respond to overload by growing the
    batch."""
    recs = [
        recommend_files_per_trigger(
            _progress([d] * 4), current=8, target_batch_sec=10.0
        )
        for d in (2.0, 5.0, 10.0, 20.0, 40.0)
    ]
    assert recs == sorted(recs, reverse=True)
    assert recs[2] == 8  # on-target duration keeps the current size


def test_degenerate_progress_is_safe():
    """Fewer than two batches (no steady state) keeps the current
    setting; zero-duration medians clamp to max_files; the result is
    always inside [min_files, max_files]."""
    assert recommend_files_per_trigger([], current=4) == 4
    one_batch = _progress([1.0])[:1]  # warmup only, no steady batches
    assert recommend_files_per_trigger(one_batch, current=4) == 4
    zeros = _progress([0.0] * 3)
    assert recommend_files_per_trigger(zeros, current=4, max_files=32) == 32
    tiny = _progress([0.001] * 3)
    assert (
        recommend_files_per_trigger(
            tiny, current=1, target_batch_sec=10.0, max_files=16
        )
        == 16
    )
    huge = _progress([1e6] * 3)
    assert recommend_files_per_trigger(huge, current=9, min_files=2) == 2


def test_batch_durations_excludes_warmup():
    prog = _progress([1.0, 2.0, 3.0])
    assert batch_durations_sec(prog) == [1.0, 2.0, 3.0]  # warmup dropped


def test_cold_start_auto_trigger_end_to_end(spark, tmp_path):
    """r9 verdict task 3: the guards' DEFAULT start-up — a cold start
    through start_with_auto_trigger — must observe its own canary
    batches, restart at the recommendation from the SAME checkpoint,
    and converge: post-restart batches carry ~n x the canary's rows
    (the trigger was actually applied), never overshoot the declared
    band's top, and the canary->restart sequence stays exactly-once."""
    import json as _json
    import os
    import time

    from projet_5spar_sparkstreaming_spark.streaming.dedup import (
        stream_neardup_ingest,
    )
    from projet_5spar_sparkstreaming_spark.streaming.tuning import (
        start_with_auto_trigger,
    )

    n_files, docs_per_file = 10, 40
    src = tmp_path / "src"
    src.mkdir()
    did = 0
    for f in range(n_files):
        lines = []
        for _ in range(docs_per_file):
            toks = " ".join(f"tok{did}_{j}" for j in range(25))
            lines.append(_json.dumps({"doc_id": did, "text": toks}))
            did += 1
        p = src / f"b{f:02d}.json"
        p.write_text("\n".join(lines))
        ts = time.time() - (n_files - f) * 60
        os.utime(p, (ts, ts))

    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    chk = str(tmp_path / "chk")
    # generous target: on a CONTENDED box (full suite + a concurrent
    # sweep sharing the cores) a canary batch can take ~5s, and a
    # target at that level makes the controller CORRECTLY recommend 1
    # — which is convergence, but not what this test is pinning. 15s
    # keeps the recommendation >1 under any realistic load while the
    # clamp (max_files=4) still bounds the step.
    target = 15.0

    def make_query(fpt: int):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", str(fpt))
            .json(str(src))
        )
        return stream_neardup_ingest(
            stream, out, idx, chk, trigger={"availableNow": True}
        )

    q, n, canary_prog = start_with_auto_trigger(
        make_query,
        canary_batches=1,
        target_batch_sec=target,
        max_files=4,
    )
    q.awaitTermination(300)
    restart_prog = list(q.recentProgress)

    assert n > 1, f"controller recommended {n} from {len(canary_prog)} batches"
    # the recommended trigger was actually applied: restarted batches
    # (except a trailing remainder) carry n files' worth of rows
    full_batches = [
        int(p["numInputRows"])
        for p in restart_prog
        if int(p["numInputRows"]) == n * docs_per_file
    ]
    assert full_batches, (
        f"no restarted batch carried n*rows/file = {n * docs_per_file}: "
        f"{[int(p['numInputRows']) for p in restart_prog]}"
    )
    # convergence, clamp-aware: one proportional step never overshoots
    # the band's top (duration is monotone in batch size and the step
    # was sized for the target)
    import statistics as _stats

    durs = [
        float(p["durationMs"]["triggerExecution"]) / 1000.0
        for p in restart_prog
    ]
    assert _stats.median(durs) <= 1.5 * target, durs
    # exactly-once across the canary stop + restart: every distinct doc
    # kept exactly once (all docs distinct, so survivors = all)
    kept = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(kept) == list(range(n_files * docs_per_file))


def test_auto_trigger_surfaces_canary_failure(spark, tmp_path):
    """ADVICE r10: a canary that terminates with an exception must be
    surfaced, not silently restarted at the same setting — the tuned
    query would fail identically and the operator would never see the
    root cause."""
    import pytest

    from projet_5spar_sparkstreaming_spark.streaming.tuning import (
        start_with_auto_trigger,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text('{"doc_id": 1, "text": "x"}\n')
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    def make_query(fpt: int):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", str(fpt))
            .json(str(src))
        )

        def boom(df, bid):
            raise RuntimeError("canary body failure")

        return (
            stream.writeStream.foreachBatch(boom)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )

    with pytest.raises(Exception) as ei:
        q, n, prog = start_with_auto_trigger(
            make_query, canary_batches=1, canary_timeout_sec=120
        )
        # if the start somehow succeeded, don't leak the query
        q.stop()
    assert "canary" in str(ei.value).lower() or "boom" in str(
        ei.value
    ).lower() or "failure" in str(ei.value).lower()
    _ = out
