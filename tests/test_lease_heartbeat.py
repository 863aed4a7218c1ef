"""Cross-host lease heartbeat (r13 verdict task 1): the r13
(boot_id, pid, pid_start) liveness probe is same-host only by design,
so a writer crashing on ANOTHER host used to stall peers for the full
30-min ``stale_sec`` TTL. The heartbeat closes that: a live holder
re-stamps ``{lock}.hb`` every ``hb_sec`` and DECLARES in its holder
JSON how long a silence means death (``hb_dead_sec``); waiters on any
host break a declared-heartbeat holder once its silence exceeds that
promise — at heartbeat scale, not TTL scale.

Foreign-host holders here are hand-crafted holder JSONs whose
host/boot_id can never match this machine, so the pid probe declines
and ONLY the heartbeat (or TTL) path can admit the waiter — exactly
the object-storage deployment fsio.py exists for. The full
random-SIGKILL integration runs in tests/test_lease_fuzz.py's
foreign_host mode.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from projet_5spar_sparkstreaming_spark import fsio
from projet_5spar_sparkstreaming_spark.fsio import writer_lease


def _foreign_lock(idx: str, age_sec: float, **extra) -> str:
    """Create a lock file whose holder claims a host+boot_id that can
    never match this machine, backdated ``age_sec``; returns the lock
    path."""
    lock = idx + ".writer.lock"
    holder = {
        "pid": 1,
        "pid_start": "42",
        "host": "some-other-host",
        "boot_id": "not-this-boot",
        "token": "foreign-token",
        "acquired_unix": time.time() - age_sec,
        **extra,
    }
    with open(lock, "w") as f:
        json.dump(holder, f)
    old = time.time() - age_sec
    os.utime(lock, (old, old))
    return lock


def _write_hb(idx: str, token: str, age_sec: float) -> str:
    hb = idx + ".writer.lock.hb"
    with open(hb, "w") as f:
        json.dump({"token": token, "heartbeat_unix": time.time() - age_sec}, f)
    old = time.time() - age_sec
    os.utime(hb, (old, old))
    return hb


def test_foreign_holder_heartbeat_silence_breaks_at_heartbeat_scale(
    spark, tmp_path
):
    # declared-heartbeat foreign holder, no stamp ever landed, lock 10 s
    # old > its promised hb_dead_sec=2: the waiter must break and
    # acquire in seconds — with stale_sec at the production 1800 s, any
    # acquisition at all proves the TTL was not the mechanism
    idx = str(tmp_path / "idx")
    lock = _foreign_lock(idx, age_sec=10.0, hb_sec=0.5, hb_dead_sec=2.0)
    t0 = time.monotonic()
    with writer_lease(spark, idx, timeout_sec=30.0, stale_sec=1800.0,
                      poll_sec=0.1):
        pass
    assert time.monotonic() - t0 < 15.0
    assert not os.path.exists(lock)


def test_foreign_holder_stale_heartbeat_breaks(spark, tmp_path):
    # a stamp DID land but went silent (killed after some mutations):
    # silence judged from the stamp's mtime, not the (much older) lock
    idx = str(tmp_path / "idx")
    _foreign_lock(idx, age_sec=300.0, hb_sec=0.5, hb_dead_sec=2.0)
    _write_hb(idx, "foreign-token", age_sec=10.0)
    t0 = time.monotonic()
    with writer_lease(spark, idx, timeout_sec=30.0, stale_sec=1800.0,
                      poll_sec=0.1):
        pass
    assert time.monotonic() - t0 < 15.0


def test_foreign_holder_fresh_heartbeat_blocks(spark, tmp_path):
    # fresh stamp = alive: the waiter must NOT break it, even though
    # the lock itself is old — it times out instead
    idx = str(tmp_path / "idx")
    lock = _foreign_lock(idx, age_sec=300.0, hb_sec=0.5, hb_dead_sec=60.0)
    _write_hb(idx, "foreign-token", age_sec=0.0)
    with pytest.raises(TimeoutError):
        with writer_lease(spark, idx, timeout_sec=2.0, stale_sec=1800.0,
                          poll_sec=0.1):
            pass
    assert os.path.exists(lock)  # untouched


def test_foreign_holder_mismatched_stamp_is_silence(spark, tmp_path):
    # a PREVIOUS holder's stale stamp (different token) must not vouch
    # for the current one: silence falls back to the lock's own age
    idx = str(tmp_path / "idx")
    _foreign_lock(idx, age_sec=10.0, hb_sec=0.5, hb_dead_sec=2.0)
    _write_hb(idx, "some-older-token", age_sec=0.0)  # fresh but not his
    t0 = time.monotonic()
    with writer_lease(spark, idx, timeout_sec=30.0, stale_sec=1800.0,
                      poll_sec=0.1):
        pass
    assert time.monotonic() - t0 < 15.0


def test_legacy_foreign_holder_keeps_ttl_path(spark, tmp_path):
    # a holder that never declared the heartbeat contract (mixed-version
    # writer) must keep the conservative TTL: no stamp file and an old
    # lock is NOT death evidence for it
    idx = str(tmp_path / "idx")
    lock = _foreign_lock(idx, age_sec=300.0)  # no hb_sec/hb_dead_sec
    with pytest.raises(TimeoutError):
        with writer_lease(spark, idx, timeout_sec=2.0, stale_sec=1800.0,
                          poll_sec=0.1):
            pass
    assert os.path.exists(lock)
    # ... while the TTL itself still works for it
    with writer_lease(spark, idx, timeout_sec=10.0, stale_sec=60.0,
                      poll_sec=0.1):
        pass


def test_live_holder_stamps_and_cleans_up(spark, tmp_path, monkeypatch):
    # a real holder: declares the contract, re-stamps while held (the
    # stamp file's mtime advances), and removes its stamp at release
    monkeypatch.setenv("SPARK_GRAFT_LEASE_HB_SEC", "0.3")
    monkeypatch.setenv("SPARK_GRAFT_LEASE_HB_DEAD_SEC", "5")
    idx = str(tmp_path / "idx")
    lock = idx + ".writer.lock"
    hb = lock + ".hb"
    with writer_lease(spark, idx):
        holder = json.load(open(lock))
        assert holder["hb_sec"] == pytest.approx(0.3)
        assert holder["hb_dead_sec"] == pytest.approx(5.0)
        assert os.path.exists(hb)  # first stamp precedes the mutation
        first = json.load(open(hb))
        assert first["token"] == holder["token"]
        m0 = os.path.getmtime(hb)
        deadline = time.time() + 10.0
        while time.time() < deadline:
            if os.path.exists(hb) and os.path.getmtime(hb) > m0:
                break
            time.sleep(0.1)
        assert os.path.getmtime(hb) > m0, "heartbeat never re-stamped"
    assert not os.path.exists(lock)
    assert not os.path.exists(hb)
    assert not os.path.exists(hb + ".old") and not os.path.exists(hb + ".tmp")


def test_release_never_deletes_successor_stamp(spark, tmp_path):
    # release deletes the lock FIRST; if a successor stamps before our
    # heartbeat cleanup runs, the token check must leave their stamp
    # alone (they would otherwise read as silent for one interval)
    idx = str(tmp_path / "idx")
    hb = idx + ".writer.lock.hb"
    release_gate = threading.Event()
    real_read = fsio._read_holder
    swapped = {"done": False}

    def hooked(spark_, path):
        out = real_read(spark_, path)
        if path == hb and not swapped["done"] and release_gate.is_set():
            # simulate the successor stamping between the releaser's
            # read and delete: overwrite with a foreign token NOW —
            # the releaser decided on OUR token, so its delete of the
            # file it read is the benign residual race documented in
            # writer_lease; a successor stamp arriving BEFORE the read
            # (this hook) must survive
            swapped["done"] = True
            return {"token": "successor-token", "heartbeat_unix": time.time()}
        return out

    fsio._read_holder = hooked
    try:
        with writer_lease(spark, idx):
            release_gate.set()
    finally:
        fsio._read_holder = real_read
    assert swapped["done"], "release cleanup never consulted the stamp"
    assert os.path.exists(hb), "successor's stamp was deleted at release"
    os.remove(hb)


def test_first_stamp_retries_past_releaser_delete_race(spark, tmp_path):
    # under writer churn the PREVIOUS holder's release deletes its own
    # stamp right as the NEW holder's first stamp is mid-write_json
    # (observed in the foreign-host fuzz as a spurious rename failure
    # at acquisition): the first stamp must retry once and the
    # acquisition succeed — only a SECOND consecutive failure aborts
    idx = str(tmp_path / "idx")
    hb = idx + ".writer.lock.hb"
    real_write = fsio.write_json
    fails = {"n": 0}

    def flaky(spark_, path, obj):
        if path == hb and fails["n"] == 0:
            fails["n"] += 1
            raise IOError(f"rename {path}.tmp -> {path} failed")
        return real_write(spark_, path, obj)

    fsio.write_json = flaky
    try:
        with writer_lease(spark, idx):
            assert os.path.exists(hb), "retry never landed the stamp"
    finally:
        fsio.write_json = real_write
    assert fails["n"] == 1
    assert not os.path.exists(idx + ".writer.lock")

    # persistent stamp failure (FS genuinely broken) still aborts the
    # acquisition AND releases the lock
    def broken(spark_, path, obj):
        if path == hb:
            raise IOError("persistent stamp failure")
        return real_write(spark_, path, obj)

    fsio.write_json = broken
    try:
        with pytest.raises(IOError, match="persistent stamp failure"):
            with writer_lease(spark, idx):
                pass
    finally:
        fsio.write_json = real_write
    assert not os.path.exists(idx + ".writer.lock"), "faulted acquire orphaned the lock"
