"""Kill -9 crash-injection CHILD for the STREAMING ingest guards
(tests/test_crash_injection.py — r10 verdict task 5).

The batch-op harness (tools/crash_child.py) kills builds/appends/
compactions; this child runs a REAL streaming guard
(``stream_neardup_ingest`` / ``stream_embed_neardup_ingest``) over a
file source with ``availableNow`` and hangs at a mid-micro-batch
barrier on the SECOND batch (batch 0 must commit a real index first),
printing ``READY`` for the parent to SIGKILL the process group. The
parent then restarts the guard from the SAME checkpoint and asserts
the ``batch_id`` replay exclusion yields exactly-once outputs and a
consistent index.

Usage: python tools/crash_stream_child.py GUARD KILLPOINT SRC OUT IDX CHK
  GUARD      minhash | embed
  KILLPOINT  before_index_append -> survivors parquet written, killed
                                    at the index-append entry (index
                                    untouched, checkpoint uncommitted)
             mid_append_meta     -> append's batch data written,
                                    killed before its meta update
                                    lands (orphan batch subdir +
                                    writer lock held by a corpse)
             mid_first_build     -> killed during the FIRST micro-
                                    batch's build: index data written,
                                    meta never lands (r11 advice: the
                                    data-present/meta-None wedge with
                                    no .old aside — the .building
                                    marker must let the replay
                                    self-heal instead of retrying
                                    forever)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import projet_5spar_sparkstreaming_spark.fsio as fsio  # noqa: E402


def _hang(tag: str = "READY") -> None:
    print(tag, flush=True)
    time.sleep(300)  # the parent kills us long before this returns


def install_barrier(guard: str, killpoint: str) -> None:
    import projet_5spar_sparkstreaming_spark.operators.dedup as dd
    import projet_5spar_sparkstreaming_spark.operators.similarity as sim

    armed = {"on": False}

    if killpoint == "mid_first_build":
        # hang at the BUILD's meta write: the index data (written just
        # before) is on disk, _meta.json/_centroids.json never lands,
        # and the .building marker (written before the build's delete)
        # is still up — the exact crashed-first-build state
        real_wj = fsio.write_json

        def hooked_build_wj(spark, path, obj):
            if path.endswith("_meta.json") or path.endswith("_centroids.json"):
                _hang()
            real_wj(spark, path, obj)

        fsio.write_json = hooked_build_wj
        return

    if killpoint == "post_build_meta":
        # hang BETWEEN the build's committed meta write and its
        # clear_build_marker — the r12-advice stale-marker window: the
        # index is fully valid but '{index}.building' survives the
        # crash, and without the r13 shed a later transient meta-None
        # read would be misread as a crashed build and rebuilt over
        def hooked_cm(spark, path):
            _hang()

        fsio.clear_build_marker = hooked_cm
        return

    def wrap_append(real):
        # both append signatures carry batch_id as the 5th positional
        def hooked(*args, **kwargs):
            batch_id = kwargs.get("batch_id", args[4] if len(args) > 4 else 0)
            if int(batch_id) >= 1:
                if killpoint == "before_index_append":
                    _hang()
                armed["on"] = True  # mid_append_meta: hang at meta write
            return real(*args, **kwargs)

        return hooked

    if guard == "minhash":
        dd.append_to_minhash_index = wrap_append(dd.append_to_minhash_index)
    elif guard == "embed":
        sim.append_to_embed_lsh_index = wrap_append(
            sim.append_to_embed_lsh_index
        )
    else:  # ivf: the maintenance guard appends via the same shape
        sim.append_to_ivf_index = wrap_append(sim.append_to_ivf_index)

    if killpoint == "mid_append_meta":
        real_wj = fsio.write_json

        def hooked_wj(spark, path, obj):
            if armed["on"] and (
                path.endswith("_meta.json") or path.endswith("_centroids.json")
            ):
                _hang()
            real_wj(spark, path, obj)

        fsio.write_json = hooked_wj
    elif killpoint != "before_index_append":
        raise SystemExit(f"unknown killpoint {killpoint!r}")


def main() -> None:
    guard, killpoint, src, out, idx, chk = sys.argv[1:7]
    install_barrier(guard, killpoint)

    from projet_5spar_sparkstreaming_spark.session import get_spark
    from projet_5spar_sparkstreaming_spark.streaming.dedup import (
        stream_embed_neardup_ingest,
        stream_ivf_ingest,
        stream_neardup_ingest,
    )

    spark = get_spark("crash_stream_child", master="local[4]")
    if guard == "minhash":
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "2")
            .json(src)
        )
        q = stream_neardup_ingest(
            stream, out, idx, chk, trigger={"availableNow": True}
        )
    else:
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "2")
            .json(src)
        )
        if guard == "embed":
            q = stream_embed_neardup_ingest(
                stream, out, idx, chk, dim=16, trigger={"availableNow": True}
            )
        else:
            q = stream_ivf_ingest(
                stream, idx, chk, trigger={"availableNow": True},
                expected_index_rows=4096,
            )
    q.awaitTermination(240)
    # reaching here means the barrier never fired — the parent treats a
    # clean exit as a scenario error
    print("COMPLETED_WITHOUT_BARRIER", flush=True)


if __name__ == "__main__":
    main()
