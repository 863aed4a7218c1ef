"""Concurrent lease FUZZ (r11 verdict task 4; all three index families
since r13 per the r12 verdict task 3): N real processes race
append / compact / rebuild on ONE shared index while the parent
SIGKILLs them at random, then the full invariant set is checked.

The r11 breaker-vs-new-holder fix and the boot-id host identity were
verified by staged shims — one interleaving per test. This harness
generalizes: random interleavings of real writers, random corpse
locks for survivors to break (the dead-pid immediate break and the
tombstone rename race run for real, repeatedly), whole-store rewrites
(compact/rebuild) racing appends, and kill -9 landing anywhere
including mid-meta-swap. The fencing this validates guards 11
meta-mutation sites across the IVF, minhash, and embed-LSH families —
r12 fuzzed only IVF; the minhash append/compact and the r12
whole-store ``rebuild_embed_lsh_index`` rewrite path now race under
the same harness. Invariants after the carnage + replay of in-flight
appends (what a streaming checkpoint would do):

  1. the meta is readable and covers every ACKNOWLEDGED append's rows;
  2. the live data tree matches the meta total EXACTLY (orphans from
     killed in-flight appends are either replay-overwritten or shed by
     the next whole-store rewrite);
  3. every acknowledged or replayed id range is stored exactly once;
  4. exactly one live version serves queries through the public path;
  5. a fresh compact (+ rebuild where the family has one) from the
     parent still succeeds (no wedged lock, no drift-guard false
     positive).

Since r14 the whole matrix also runs in ``foreign_host`` mode (r13
verdict task 1): every worker's fsio host identity is spoofed to a
unique fake host, disabling the same-host (boot_id, pid, pid_start)
fast break for EVERY corpse lock — only the lease heartbeat
(fsio._holder_heartbeat_silent) can admit waiters before the 30-min
TTL. The parent measures kill -> next-completed-op gaps and the first
post-carnage replay and asserts both stay at heartbeat scale.
"""

from __future__ import annotations

import os
import random
import signal
import subprocess
import sys
import time

import pytest

# r15 (verdict task 5): kill-9 fuzz harness — excluded from the
# default run (pytest.ini deselects `slow`); run with -m "" / -m slow
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tools", "lease_fuzz_child.py")
sys.path.insert(0, os.path.join(REPO, "tools"))

from lease_fuzz_child import (  # noqa: E402
    IDS_PER_BATCH,
    ROWS_PER_APPEND,
    batch_docs,
    batch_rows,
)

N_WORKERS = 4
FUZZ_SEC = 35.0  # minimum fuzz window; extends to FUZZ_CAP for coverage
FUZZ_CAP = 300.0  # hard wall when the box is too contended to make ops
SEED_ROWS = 200

# foreign-host mode (r13 verdict task 1): every worker's fsio identity
# is spoofed to a UNIQUE fake host, so nobody can use the same-host
# dead-pid fast break on anybody's corpse lock — the lease heartbeat is
# the only sub-TTL liveness signal, and it must carry the whole fuzz.
# Short knobs keep the break latency inside the fuzz window; stale_sec
# stays at the production 1800 s (mutation call sites use the default),
# so ANY post-corpse progress is heartbeat-break evidence.
FOREIGN_HB_SEC = "2"
FOREIGN_HB_DEAD_SEC = "8"
# loose liveness ceiling for kill -> next acknowledged op in foreign
# mode: hb_dead (8 s) + lease poll + a full Spark mutation under
# contention. TTL-scale stalls (600 s acquisition timeout / 1800 s
# stale break) sit two orders of magnitude above it.
FOREIGN_MAX_GAP_SEC = 240.0


def _spawn(slot: int, epoch: int, idx: str, jdir: str, family: str,
           mode: str = "same_host"):
    journal = os.path.join(jdir, f"w{slot}.journal")
    err = open(os.path.join(jdir, f"w{slot}.e{epoch}.stderr"), "w")
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="1g")
    if mode == "foreign_host":
        env["SPARK_GRAFT_FUZZ_SPOOF_HOST"] = f"fuzz-foreign-w{slot}e{epoch}"
        env["SPARK_GRAFT_LEASE_HB_SEC"] = FOREIGN_HB_SEC
        env["SPARK_GRAFT_LEASE_HB_DEAD_SEC"] = FOREIGN_HB_DEAD_SEC
    proc = subprocess.Popen(
        [sys.executable, CHILD, idx, journal, str(slot), str(epoch), family],
        stdout=subprocess.DEVNULL,
        stderr=err,
        start_new_session=True,
        env=env,
    )
    return proc, journal


def _kill(proc) -> None:
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait(timeout=30)


def _parse_journals(jdir: str) -> dict:
    acked_appends: dict[int, int] = {}
    inflight: set[int] = set()
    acked_compacts = acked_rebuilds = aborts = 0
    done_times: list[float] = []  # ACK/ABORT unix times (@-suffixed)
    for name in sorted(os.listdir(jdir)):
        if not name.endswith(".journal"):
            continue
        with open(os.path.join(jdir, name)) as f:
            raw = f.read()
        lines = raw.split("\n")
        if raw and not raw.endswith("\n"):
            lines = lines[:-1]  # torn final line from a kill mid-write
        for line in lines:
            parts = line.split()
            if parts[:2] == ["START", "APPEND"]:
                inflight.add(int(parts[2]))
            elif parts[:2] == ["ACK", "APPEND"]:
                bid = int(parts[2])
                acked_appends[bid] = int(parts[3])
                inflight.discard(bid)
            elif parts[:2] == ["ACK", "COMPACT"]:
                acked_compacts += 1
            elif parts[:2] == ["ACK", "REBUILD"]:
                acked_rebuilds += 1
            elif parts[:1] == ["ABORT"]:
                # designed outcomes: drift-guard abort or the lease
                # fence firing — an aborted append stays in ``inflight``
                # (started, never acknowledged) and is replayed
                aborts += 1
            else:
                continue
            # op COMPLETIONS (ACK/ABORT) prove a writer got THROUGH the
            # lease; their times bound how long any corpse lock stalled
            # the fleet (START lines don't — a started op may be parked
            # waiting on the lease)
            if parts[:1] != ["START"] and parts and parts[-1].startswith("@"):
                try:
                    done_times.append(float(parts[-1][1:]))
                except ValueError:
                    pass
    return {
        "acked_appends": acked_appends,
        "inflight": sorted(inflight),
        "acked_compacts": acked_compacts,
        "acked_rebuilds": acked_rebuilds,
        "aborts": aborts,
        "done_times": sorted(done_times),
    }


def _kill_gaps(jdir: str, done_times: list[float]) -> list[float]:
    """Seconds from each parent kill to the FIRST op completion (ACK or
    designed ABORT, any worker) after it — the fleet-liveness bound a
    corpse lock's break latency shows up in. Kills with no later
    completion (e.g. the last kill of the window) contribute nothing."""
    kills_path = os.path.join(jdir, "kills.times")
    if not os.path.exists(kills_path):
        return []
    gaps = []
    with open(kills_path) as f:
        for line in f:
            try:
                k = float(line.strip())
            except ValueError:
                continue
            later = [d for d in done_times if d > k]
            if later:
                gaps.append(round(later[0] - k, 3))
    return gaps


def _write_parent_metrics(
    jdir: str, mode: str, gaps: list[float], first_replay_sec
) -> None:
    """Persist the parent-side latency evidence next to the journals so
    tools/fuzz_extended.py can lift it into the committed artifact."""
    import json as _json

    with open(os.path.join(jdir, "parent_metrics.json"), "w") as f:
        _json.dump(
            {
                "mode": mode,
                "kill_to_next_done_sec": gaps,
                "max_kill_to_next_done_sec": max(gaps) if gaps else None,
                "first_replay_sec": first_replay_sec,
            },
            f,
        )


class _IvfFamily:
    """Family adapter: seed build, in-flight replay, store invariants,
    fresh whole-store ops, and a public-path query check."""

    name = "ivf"
    meta_name = "_centroids.json"

    def seed(self, spark, idx):
        import numpy as np

        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            build_ivf_index,
        )

        rng = np.random.RandomState(3)
        rows = []
        for i in range(SEED_ROWS):
            v = rng.randn(8)
            rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
        seed = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        build_ivf_index(seed, idx, "vec_id", "embedding", n_centroids=8, batch_id=0)
        return seed

    def replay(self, spark, idx, bid):
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            append_to_ivf_index,
        )

        df = spark.createDataFrame(
            batch_rows(bid), "vec_id long, embedding array<double>"
        )
        append_to_ivf_index(df, idx, "vec_id", "embedding", bid)

    def store_ids(self, spark, idx, meta):
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            _ivf_data_dir,
        )

        live = _ivf_data_dir(spark, idx, int(meta.get("version", 0)))
        store = spark.read.option("basePath", live).parquet(live)
        return [r["id"] for r in store.select("id").collect()]

    def fresh_ops(self, spark, idx):
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            compact_ivf_index,
            rebuild_ivf_index,
        )

        compact_ivf_index(spark, idx, keep_last=2, target_partitions=4)
        rebuild_ivf_index(spark, idx, n_centroids=8, target_partitions=4)

    def query_check(self, spark, idx, seed):
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            query_ivf_index,
        )

        probes = seed.limit(5)
        served = query_ivf_index(
            spark, probes, idx, "vec_id", "embedding",
            k=1, exclude_self=False, route="brute",
        )
        assert sorted(
            (r["query_id"], r["neighbor_id"]) for r in served.collect()
        ) == [(i, i) for i in range(5)]

    def read_probe(self, spark, idx, seed):
        # cheap mid-fuzz public-path read: the probe path (meta ->
        # centroids -> partition-pruned scan) against whatever version
        # is live RIGHT NOW
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            query_ivf_index,
        )

        rows = query_ivf_index(
            spark, seed.limit(2), idx, "vec_id", "embedding",
            k=1, n_probe=2, exclude_self=False, route="ivf",
        ).collect()
        for r in rows:
            assert r["cosine"] == r["cosine"]  # finite, not NaN


class _MinhashFamily:
    name = "minhash"
    meta_name = "_meta.json"

    def seed(self, spark, idx):
        from projet_5spar_sparkstreaming_spark.operators.dedup import (
            build_minhash_index,
        )

        rows = [
            (i, " ".join(f"seed{i}_{j}" for j in range(30)))
            for i in range(SEED_ROWS)
        ]
        seed = spark.createDataFrame(rows, "doc_id long, text string")
        build_minhash_index(seed, idx, "doc_id", "text", batch_id=0)
        return seed

    def replay(self, spark, idx, bid):
        from projet_5spar_sparkstreaming_spark.operators.dedup import (
            append_to_minhash_index,
        )

        df = spark.createDataFrame(batch_docs(bid), "doc_id long, text string")
        append_to_minhash_index(df, idx, "doc_id", "text", bid)

    def store_ids(self, spark, idx, meta):
        from projet_5spar_sparkstreaming_spark.fsio import versioned_subdir

        version = int(meta.get("version", 0))
        sigs = spark.read.option(
            "basePath", versioned_subdir(idx, "sigs", version)
        ).parquet(versioned_subdir(idx, "sigs", version))
        ids = [r["id"] for r in sigs.select("id").collect()]
        # the bands tree must track the sigs tree exactly: bands rows
        # per doc == meta's band count
        bands = spark.read.option(
            "basePath", versioned_subdir(idx, "bands", version)
        ).parquet(versioned_subdir(idx, "bands", version))
        assert bands.count() == len(ids) * int(meta["bands"])
        return ids

    def fresh_ops(self, spark, idx):
        from projet_5spar_sparkstreaming_spark.operators.dedup import (
            compact_minhash_index,
        )

        compact_minhash_index(spark, idx, keep_last=2, target_partitions=4)

    def query_check(self, spark, idx, seed):
        from projet_5spar_sparkstreaming_spark.operators.dedup import (
            minhash_query_index,
        )

        # an exact copy of seed doc 0 under a new id must match it
        probe = spark.createDataFrame(
            [(10_000_000_000, " ".join(f"seed0_{j}" for j in range(30)))],
            "doc_id long, text string",
        )
        pairs = minhash_query_index(probe, idx, "doc_id", "text", threshold=0.8)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (10_000_000_000, 0) in got or (0, 10_000_000_000) in got, got

    def read_probe(self, spark, idx, seed):
        # cheap mid-fuzz public-path read: params from the live meta,
        # bucket join against whatever sigs/bands version is live now
        from projet_5spar_sparkstreaming_spark.operators.dedup import (
            minhash_query_index,
        )

        probe = spark.createDataFrame(
            [(10_000_000_001, " ".join(f"seed1_{j}" for j in range(30)))],
            "doc_id long, text string",
        )
        minhash_query_index(
            probe, idx, "doc_id", "text", threshold=0.8
        ).collect()


class _EmbedFamily:
    name = "embed"
    meta_name = "_meta.json"

    def seed(self, spark, idx):
        import numpy as np

        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            build_embed_lsh_index,
        )

        rng = np.random.RandomState(3)
        rows = []
        for i in range(SEED_ROWS):
            v = rng.randn(8)
            rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
        seed = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        build_embed_lsh_index(
            seed, idx, "vec_id", "embedding", dim=8,
            expected_rows=SEED_ROWS + 40 * ROWS_PER_APPEND, batch_id=0,
        )
        return seed

    def replay(self, spark, idx, bid):
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            append_to_embed_lsh_index,
        )

        df = spark.createDataFrame(
            batch_rows(bid), "vec_id long, embedding array<double>"
        )
        append_to_embed_lsh_index(df, idx, "vec_id", "embedding", bid)

    def store_ids(self, spark, idx, meta):
        from projet_5spar_sparkstreaming_spark.fsio import versioned_subdir

        version = int(meta.get("version", 0))
        vecs = spark.read.option(
            "basePath", versioned_subdir(idx, "vecs", version)
        ).parquet(versioned_subdir(idx, "vecs", version))
        ids = [r["id"] for r in vecs.select("id").collect()]
        # buckets tree tracks the vecs tree: n_tables rows per vector
        buckets = spark.read.option(
            "basePath", versioned_subdir(idx, "buckets", version)
        ).parquet(versioned_subdir(idx, "buckets", version))
        assert buckets.count() == len(ids) * int(meta["n_tables"])
        return ids

    def fresh_ops(self, spark, idx):
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            compact_embed_lsh_index,
            rebuild_embed_lsh_index,
        )

        compact_embed_lsh_index(spark, idx, keep_last=2, target_partitions=4)
        rebuild_embed_lsh_index(spark, idx, target_partitions=4)

    def query_check(self, spark, idx, seed):
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            embed_lsh_query_index,
        )

        # an exact copy of seed vec 0 under a new id must match it
        probe = seed.filter(F.col("vec_id") == 0).select(
            F.lit(10_000_000_000).cast("long").alias("vec_id"), "embedding"
        )
        pairs = embed_lsh_query_index(
            probe, idx, "vec_id", "embedding", threshold=0.95
        )
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (10_000_000_000, 0) in got or (0, 10_000_000_000) in got, got

    def read_probe(self, spark, idx, seed):
        # cheap mid-fuzz public-path read against the live version
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            embed_lsh_query_index,
        )

        probe = seed.filter(F.col("vec_id") == 1).select(
            F.lit(10_000_000_001).cast("long").alias("vec_id"), "embedding"
        )
        embed_lsh_query_index(
            probe, idx, "vec_id", "embedding", threshold=0.95
        ).collect()


FAMILIES = {f.name: f for f in (_IvfFamily(), _MinhashFamily(), _EmbedFamily())}


@pytest.mark.parametrize("mode", ["same_host", "foreign_host"])
@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_lease_fuzz_concurrent_mutations_survive_random_kill9(
    spark, tmp_path, family, mode
):
    from projet_5spar_sparkstreaming_spark.fsio import read_json

    fam = FAMILIES[family]
    n_workers, fuzz_sec = N_WORKERS, FUZZ_SEC
    idx = str(tmp_path / "fuzz_idx")
    jdir = str(tmp_path / "journals")
    os.makedirs(jdir)

    # seed: batch 0, ids 0..SEED_ROWS-1 (disjoint from worker ranges)
    seed = fam.seed(spark, idx)

    workers: dict[int, tuple] = {}
    epochs = {s: 0 for s in range(n_workers)}
    for s in range(n_workers):
        workers[s] = _spawn(s, 0, idx, jdir, family, mode)

    killed_pids: set[int] = set()
    prng = random.Random(99)
    t_min = time.time() + fuzz_sec
    t_cap = time.time() + FUZZ_CAP
    kills = 0

    def _coverage_met() -> bool:
        # the vacuity floor as a LOOP CONDITION, not a flaky assert: on
        # an idle box this is met within fuzz_sec; under heavy external
        # load (e.g. a full test suite sharing the cores) the children
        # need longer to get real ops acknowledged, so the fuzz keeps
        # going — up to FUZZ_CAP — until enough of each op class ran
        j_ = _parse_journals(jdir)
        return (
            len(j_["acked_appends"]) >= 2
            and len(j_["acked_appends"]) + len(j_["inflight"]) >= 5
            and j_["acked_compacts"] + j_["acked_rebuilds"] >= 1
            and kills >= 2
        )
    # CONCURRENT READER (r13): the reader-safe-version-flip claim says
    # a public-path query that loads the meta NOW scans a tree that
    # stays resolvable — retained until the NEXT compaction. The parent
    # exercises that claim DURING the carnage, not just after: one
    # public read per fuzz iteration. A single failure is tolerated
    # per the documented retention window (a reader slower than one
    # full compaction cycle can lose its tree; a fresh meta read must
    # then succeed) — two consecutive failures = a genuinely broken
    # public read path, and the fuzz fails with both errors.
    reader_reads = 0

    def _read_or_fail_twice():
        nonlocal reader_reads
        try:
            fam.read_probe(spark, idx, seed)
        except Exception as first:
            try:
                fam.read_probe(spark, idx, seed)
            except Exception as second:
                raise AssertionError(
                    "public read path failed twice in a row during fuzz: "
                    f"first={first!r} second={second!r}"
                ) from second
        reader_reads += 1

    try:
        # let the first JVMs come up before the first kill
        time.sleep(12)
        while time.time() < t_min or (
            time.time() < t_cap and not _coverage_met()
        ):
            slot = prng.randrange(n_workers)
            proc, journal = workers[slot]
            if proc.poll() is not None and proc.pid not in killed_pids:
                raise AssertionError(
                    f"worker {slot} died on its own (exit {proc.returncode}) — "
                    f"see {jdir}/w{slot}.e{epochs[slot]}.stderr"
                )
            spawned = (
                os.path.exists(journal)
                and f"SPAWN {slot} {epochs[slot]}" in open(journal).read()
            )
            if spawned:
                killed_pids.add(proc.pid)
                _kill(proc)
                kills += 1
                with open(os.path.join(jdir, "kills.times"), "a") as kf:
                    kf.write(f"{time.time():.3f}\n")
                epochs[slot] += 1
                workers[slot] = _spawn(
                    slot, epochs[slot], idx, jdir, family, mode
                )
            _read_or_fail_twice()
            time.sleep(prng.uniform(3.0, 6.0))
    finally:
        for slot, (proc, _) in workers.items():
            if proc.poll() is None:
                killed_pids.add(proc.pid)
            _kill(proc)

    # no worker may have died of anything but our SIGKILL
    for slot, (proc, _) in workers.items():
        if proc.pid not in killed_pids and proc.returncode not in (0, None):
            raise AssertionError(
                f"worker {slot} errored (exit {proc.returncode}) — see "
                f"{jdir}/w{slot}.e{epochs[slot]}.stderr"
            )

    j = _parse_journals(jdir)
    assert kills >= 2, f"only {kills} kills — fuzz never got going"
    assert reader_reads >= 3, f"only {reader_reads} concurrent reads — vacuous"
    # coverage was the loop condition; reaching here without it means
    # even FUZZ_CAP seconds couldn't get ops through — a wedge, not load
    assert len(j["acked_appends"]) >= 2, ("no appends acknowledged "
                                          f"within {FUZZ_CAP}s", j)
    assert len(j["acked_appends"]) + len(j["inflight"]) >= 5, j
    assert j["acked_compacts"] + j["acked_rebuilds"] >= 1, j

    # kill -> next-completed-op latency: in foreign mode the spoof
    # disables the same-host fast break, so every gap here is bounded
    # by the heartbeat break — TTL-scale stalls (600 s acquisition
    # timeout, 1800 s stale TTL) would blow straight through the bound
    gaps = _kill_gaps(jdir, j["done_times"])
    if mode == "foreign_host":
        assert gaps, "no completed op after any kill — fleet wedged"
        assert max(gaps) < FOREIGN_MAX_GAP_SEC, (max(gaps), gaps)

    # replay every killed in-flight append verbatim (same batch_id,
    # same rows) — exactly what the streaming checkpoint does. The
    # FIRST replay is timed: it must get past whatever corpse lock the
    # final mass-kill left behind (heartbeat-scale in foreign mode).
    t0 = time.time()
    first_replay_sec = None
    for bid in j["inflight"]:
        fam.replay(spark, idx, bid)
        if first_replay_sec is None:
            first_replay_sec = round(time.time() - t0, 3)
            if mode == "foreign_host":
                assert first_replay_sec < FOREIGN_MAX_GAP_SEC, first_replay_sec
    _write_parent_metrics(jdir, mode, gaps, first_replay_sec)

    def check_invariants() -> dict:
        meta = read_json(spark, f"{idx}/{fam.meta_name}")
        assert meta is not None, "meta unreadable after fuzz"
        ids = fam.store_ids(spark, idx, meta)
        total = len(ids)
        meta_total = sum(int(v) for v in meta["batches"].values())
        assert total == meta_total, (total, meta_total)
        expected = SEED_ROWS + ROWS_PER_APPEND * (
            len(j["acked_appends"]) + len(j["inflight"])
        )
        assert total == expected, (total, expected)
        # every acknowledged/replayed id range stored exactly once
        assert len(ids) == len(set(ids)), "duplicate ids in store"
        idset = set(ids)
        assert set(range(SEED_ROWS)) <= idset, "seed rows lost"
        for bid in list(j["acked_appends"]) + j["inflight"]:
            lo = bid * IDS_PER_BATCH
            got = sum(1 for i_ in range(lo, lo + ROWS_PER_APPEND) if i_ in idset)
            assert got == ROWS_PER_APPEND, (bid, got)
        assert len(idset) == expected
        return meta

    check_invariants()

    # survivors' locks are gone / breakable: fresh whole-store ops and
    # a public-path query must succeed from the parent
    fam.fresh_ops(spark, idx)
    meta = check_invariants()
    fam.query_check(spark, idx, seed)
    assert int(meta["version"]) >= 1
