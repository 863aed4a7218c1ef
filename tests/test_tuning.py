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
