"""Lease-fuzz WORKER for the concurrent index-mutation stress test
(tests/test_lease_fuzz.py — r11 verdict task 4, extended to all three
persistent index families in r13 per the r12 verdict task 3).

The r11 breaker-vs-new-holder fix (fsio.py) was verified by STAGED
shims: one interleaving per test. This worker generalizes that to real
concurrency: N of these processes race append / compact / rebuild on
ONE shared index while the parent SIGKILLs them at random. Every
mutation is journaled to a per-worker file with a ``START`` line
*before* the op and an ``ACK`` line only *after* it returns, so the
parent can distinguish acknowledged ops (must be durable) from
in-flight ops at kill time (must be replayable) and check the full
invariant set afterwards: meta covers every acknowledged batch, the
stored rows match the meta exactly after in-flight replays, one live
version serves queries, and a fresh compact(+rebuild) still succeed.

Families (the fencing they exercise guards 11 meta-mutation sites
across all three — r12 fuzzed only IVF):
  ivf      append_to_ivf_index / compact_ivf_index / rebuild_ivf_index
  minhash  append_to_minhash_index / compact_minhash_index (no rebuild:
           band structure is size-independent by construction, SCALE.md)
  embed    append_to_embed_lsh_index / compact_embed_lsh_index /
           rebuild_embed_lsh_index (the r12 whole-store rewrite path)

Ops are deterministic functions of their batch_id (seeded numpy), so
the parent can REPLAY any killed in-flight append verbatim — exactly
what a streaming checkpoint does with an uncommitted micro-batch.

Usage: python tools/lease_fuzz_child.py INDEX JOURNAL WORKER_SLOT EPOCH [FAMILY]
  INDEX        shared index path
  JOURNAL      this worker's append-only journal file
  WORKER_SLOT  0..N-1 (partitions the batch_id space)
  EPOCH        respawn counter (keeps batch_ids unique across respawns)
  FAMILY       ivf (default) | minhash | embed

Foreign-host mode (r13 verdict task 1): when the env var
``SPARK_GRAFT_FUZZ_SPOOF_HOST`` is set, this worker's fsio host
identity (hostname + boot_id) is patched to that value BEFORE any lock
is taken, so the holder JSONs it writes claim a host no other process
shares — every sibling (and the parent) then sees its corpse locks as
FOREIGN, the same-host (boot_id, pid, pid_start) fast break declines,
and the only sub-TTL liveness signal left is the lease heartbeat. The
parent gives each spawn a UNIQUE spoof value so workers can't
fast-break each other either. Combined with short
``SPARK_GRAFT_LEASE_HB_SEC`` / ``SPARK_GRAFT_LEASE_HB_DEAD_SEC``, the
fuzz then proves corpse locks are broken at heartbeat scale, not
TTL/timeout scale, under real kill -9.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 8
ROWS_PER_APPEND = 50
IDS_PER_BATCH = 1000  # id range stride per batch_id


def batch_rows(batch_id: int):
    """The deterministic (id, vec) rows of append ``batch_id`` — shared
    with the parent so killed in-flight appends can be replayed
    verbatim (same batch_id, same rows), like a checkpoint replay."""
    import numpy as np

    rng = np.random.RandomState(batch_id % (2**31 - 1))
    lo = batch_id * IDS_PER_BATCH
    out = []
    for i in range(ROWS_PER_APPEND):
        v = rng.randn(DIM)
        v /= np.linalg.norm(v)
        out.append((int(lo + i), [float(x) for x in v]))
    return out


def batch_docs(batch_id: int):
    """Deterministic (doc_id, text) rows for the minhash family — each
    doc's token stream is a pure function of its id, so replays are
    verbatim and no two docs near-dup each other by accident."""
    lo = batch_id * IDS_PER_BATCH
    return [
        (int(lo + i), " ".join(f"tok{lo + i}_{j}" for j in range(30)))
        for i in range(ROWS_PER_APPEND)
    ]


def _make_ops(family: str, spark, index: str):
    """(append, compact, rebuild_or_None) closures for ``family``; each
    append takes a batch_id and returns the row count."""
    if family == "ivf":
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            append_to_ivf_index,
            compact_ivf_index,
            rebuild_ivf_index,
        )

        def _append(batch_id: int) -> int:
            df = spark.createDataFrame(
                batch_rows(batch_id), "vec_id long, embedding array<double>"
            )
            return append_to_ivf_index(df, index, "vec_id", "embedding", batch_id)

        return (
            _append,
            lambda: compact_ivf_index(spark, index, keep_last=2, target_partitions=2),
            lambda: rebuild_ivf_index(spark, index, n_centroids=8, target_partitions=2),
        )
    if family == "minhash":
        from projet_5spar_sparkstreaming_spark.operators.dedup import (
            append_to_minhash_index,
            compact_minhash_index,
        )

        def _append(batch_id: int) -> int:
            df = spark.createDataFrame(
                batch_docs(batch_id), "doc_id long, text string"
            )
            return append_to_minhash_index(df, index, "doc_id", "text", batch_id)

        return (
            _append,
            lambda: compact_minhash_index(spark, index, keep_last=2, target_partitions=2),
            None,  # band structure is size-independent: no rebuild op
        )
    if family == "embed":
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            append_to_embed_lsh_index,
            compact_embed_lsh_index,
            rebuild_embed_lsh_index,
        )

        def _append(batch_id: int) -> int:
            df = spark.createDataFrame(
                batch_rows(batch_id), "vec_id long, embedding array<double>"
            )
            return append_to_embed_lsh_index(
                df, index, "vec_id", "embedding", batch_id
            )

        return (
            _append,
            lambda: compact_embed_lsh_index(spark, index, keep_last=2, target_partitions=2),
            lambda: rebuild_embed_lsh_index(spark, index, target_partitions=2),
        )
    raise ValueError(f"unknown family {family!r}")


def main() -> None:
    index, journal, slot, epoch = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        int(sys.argv[4]),
    )
    family = sys.argv[5] if len(sys.argv) > 5 else "ivf"
    import random
    import time

    spoof = os.environ.get("SPARK_GRAFT_FUZZ_SPOOF_HOST")
    if spoof:
        # foreign-host mode: this worker's locks must look like they
        # came from a host nobody here is on (see module docstring)
        from projet_5spar_sparkstreaming_spark import fsio

        fsio._host_boot_id = lambda: f"boot-{spoof}"

        class _SpoofSocket:
            gethostname = staticmethod(lambda: spoof)

        fsio._socket = _SpoofSocket()

    from projet_5spar_sparkstreaming_spark.fsio import LeaseLostError
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark(f"lease_fuzz_w{slot}", master="local[2]")
    append, compact, rebuild = _make_ops(family, spark, index)
    rng = random.Random(1000 * slot + epoch)
    jf = os.open(journal, os.O_WRONLY | os.O_APPEND | os.O_CREAT, 0o644)

    def log(line: str) -> None:
        # trailing @<unix> lets the parent measure kill -> next-ack
        # latency (heartbeat-scale break evidence in foreign mode)
        os.write(jf, (f"{line} @{time.time():.3f}\n").encode())
        os.fsync(jf)

    log(f"SPAWN {slot} {epoch}")
    print("READY", flush=True)
    ops = ["append", "compact"] + (["rebuild"] if rebuild else [])
    weights = [0.8, 0.1, 0.1] if rebuild else [0.8, 0.2]
    for i in range(10_000):  # parent kills us long before this runs out
        # mostly appends; compactions and rebuilds stir the version
        # flips and whole-store rewrites the appends race against
        op = rng.choices(ops, weights)[0]
        try:
            if op == "append":
                # slot+1 keeps every worker batch_id disjoint from the
                # parent's seed batch 0
                batch_id = (slot + 1) * 1_000_000 + epoch * 10_000 + i
                log(f"START APPEND {batch_id}")
                n = append(batch_id)
                log(f"ACK APPEND {batch_id} {n}")
            elif op == "compact":
                log("START COMPACT")
                compact()
                log("ACK COMPACT")
            else:
                log("START REBUILD")
                rebuild()
                log("ACK REBUILD")
        except LeaseLostError:
            # DESIGNED abort: our lease was displaced mid-mutation by a
            # breaker judging some corpse-lock stale — the commit fence
            # fired instead of clobbering the meta. A streaming caller
            # retries the batch; the fuzz just moves on (a started,
            # never-acked append is replayed by the parent).
            log(f"ABORT {op.upper()} lease_lost")
        except RuntimeError as e:
            if "meta drift" not in str(e):
                raise
            # DESIGNED abort: the flip-time drift guard saw another
            # admitted writer advance the meta under us — index
            # unchanged, the next compact/rebuild picks the work up.
            log(f"ABORT {op.upper()} drift")


if __name__ == "__main__":
    main()
