"""Trigger auto-sizing for micro-batch ingest streams.

The ingest guards' per-batch cost is dominated by FIXED micro-batch
overhead (multi-stage joins + three output writes cost ~2s whether the
batch holds 800 rows or 8,000 — measured in SCALE_STRESS_r08), so
throughput is controlled by ONE knob: rows admitted per trigger
(``maxFilesPerTrigger`` for file sources, ``maxOffsetsPerTrigger`` for
Kafka). Structured Streaming pins source options for the life of a
query, so sizing is applied at (re)start time: observe a running (or
canary) query's progress, recommend the setting for the next start.

``recommend_files_per_trigger`` is a proportional controller on the
observed steady-state batch duration — the same feedback shape as
Spark's public DStream-era rate estimator
(``org.apache.spark.streaming.scheduler.rate.PIDRateEstimator``),
reduced to the P term because batch duration is monotone in batch size
(duration = fixed + marginal·rows), which makes the fixed-point
iteration ``x ← x · target/duration(x)`` converge from either side.

Absent in the reference — its streaming job used the default
unthrottled trigger (reference: src/spark_stream.py:146-151); required
here because the index-backed ingest guards have real per-batch fixed
cost that batch sizing amortizes 3x+ (BENCH r8: 336 → 1,018 rows/s).
"""

from __future__ import annotations

import statistics


def batch_durations_sec(progress: list) -> list[float]:
    """Steady-state micro-batch durations (seconds) from a list of
    ``StreamingQueryProgress``-shaped dicts (``q.recentProgress``),
    EXCLUDING the first batch — stream startup and code-path warming
    are fixed cost, not throughput."""
    return [
        float(p["durationMs"]["triggerExecution"]) / 1000.0 for p in progress[1:]
    ]


def recommend_files_per_trigger(
    progress: list,
    current: int,
    target_batch_sec: float = 10.0,
    min_files: int = 1,
    max_files: int = 256,
) -> int:
    """Recommend ``maxFilesPerTrigger`` (or, scaled by rows-per-file,
    ``maxOffsetsPerTrigger``) for the next (re)start of a micro-batch
    stream, from its observed progress at the ``current`` setting.

    Proportional step: ``current · target / median(steady duration)``,
    clamped to [min_files, max_files]. One step lands inside the
    target band whenever fixed cost dominates (the ingest-guard
    regime); iterating across restarts converges in general because
    duration is monotone increasing in batch size. Returns ``current``
    unchanged when progress holds fewer than two batches (no steady
    state to measure)."""
    durs = batch_durations_sec(progress)
    if not durs:
        return current
    med = statistics.median(durs)
    if med <= 0:
        return max_files
    rec = int(round(current * target_batch_sec / med)) or 1
    return max(min_files, min(max_files, rec))
