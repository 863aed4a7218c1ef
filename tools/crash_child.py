"""Kill -9 crash-injection CHILD for the index-lifecycle harness
(tests/test_crash_injection.py).

Runs ONE index mutation (build / append / compact, any family) in its
own process with a barrier hook installed, prints ``READY`` when the
barrier is reached, and sleeps there until the parent SIGKILLs it —
producing the mid-operation on-disk states that monkeypatched
exception paths cannot (a dead process mid-parquet-write or between
write_json's two renames, with an orphaned writer lock still held).

Usage: python tools/crash_child.py FAMILY OP BARRIER INDEX_PATH
  FAMILY  minhash | embed | ivf
  OP      build | append | compact
  BARRIER before_meta_write  -> batch data fully written, killed just
                                before the meta update lands
          mid_meta_rename    -> killed between write_json's two
                                renames (live meta ABSENT, .old is the
                                only durable copy)
          mid_data_write     -> killed while the batch parquet write
                                is in flight (parent kills on the
                                WRITE_START line, jittered)
          post_lock_create   -> killed BETWEEN the writer lease's
                                create(lock, overwrite=false) and its
                                holder-JSON write — the torn JSON-less
                                lock no liveness probe can judge
                                (r13 verdict task 5); broken only by
                                fsio's 60 s JSON-less grace
The parent pre-seeds append/compact indexes; this child only runs the
mutation. Appends use batch_id=7."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import projet_5spar_sparkstreaming_spark.fsio as fsio  # noqa: E402


def _hang(tag: str = "READY") -> None:
    print(tag, flush=True)
    time.sleep(300)  # the parent kills us long before this returns


def install_barrier(barrier: str) -> None:
    if barrier == "before_meta_write":
        real = fsio.write_json

        def hooked(spark, path, obj):
            if path.endswith(".json"):
                _hang()
            real(spark, path, obj)

        fsio.write_json = hooked
    elif barrier == "mid_meta_rename":
        real_fs_path = fsio._fs_path

        class WrapFS:
            def __init__(self, fs):
                self._fs = fs

            def __getattr__(self, name):
                return getattr(self._fs, name)

            def rename(self, src, dst):
                # write_json's SECOND rename (tmp -> live): at this
                # instant the live file is already renamed aside, so a
                # kill here leaves live ABSENT and .old as the only
                # durable copy
                if str(src).endswith(".json.tmp"):
                    _hang()
                return self._fs.rename(src, dst)

        def hooked(spark, path):
            fs, hp = real_fs_path(spark, path)
            return WrapFS(fs), hp

        fsio._fs_path = hooked
    elif barrier == "mid_data_write":
        from pyspark.sql.readwriter import DataFrameWriter

        real_pq = DataFrameWriter.parquet

        def hooked_pq(self, path, **kw):
            # announce the data write; the parent kills us at a
            # jittered moment while (or just before) the job runs
            print("WRITE_START", flush=True)
            return real_pq(self, path, **kw)

        DataFrameWriter.parquet = hooked_pq
    elif barrier == "post_lock_create":
        real_fs_path = fsio._fs_path

        class WrapFS:
            def __init__(self, fs):
                self._fs = fs

            def __getattr__(self, name):
                return getattr(self._fs, name)

            def create(self, path, *args):
                out = self._fs.create(path, *args)
                if str(path).endswith(".writer.lock"):
                    # the lock EXISTS (create succeeded) but its holder
                    # JSON has not been written — the torn state only a
                    # real kill here can produce
                    _hang()
                return out

        def hooked(spark, path):
            fs, hp = real_fs_path(spark, path)
            return WrapFS(fs), hp

        fsio._fs_path = hooked
    else:
        raise SystemExit(f"unknown barrier {barrier!r}")


def main() -> None:
    family, op, barrier, idx = sys.argv[1:5]
    install_barrier(barrier)

    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("crash_child", master="local[4]")

    def docs(ids, seed_of):
        return spark.createDataFrame(
            [
                (i, " ".join(f"tok{seed_of(i)}_{j}" for j in range(30)))
                for i in ids
            ],
            "doc_id long, text string",
        )

    def vecs(ids):
        import numpy as np

        rng = np.random.default_rng(101)
        return spark.createDataFrame(
            [(i, [float(x) for x in rng.standard_normal(16)]) for i in ids],
            "vec_id long, embedding array<double>",
        )

    if family == "minhash":
        from projet_5spar_sparkstreaming_spark.operators.dedup import (
            append_to_minhash_index,
            build_minhash_index,
            compact_minhash_index,
        )

        if op == "build":
            build_minhash_index(
                docs(range(20), lambda i: i), idx, "doc_id", "text"
            )
        elif op == "append":
            append_to_minhash_index(
                docs(range(700, 710), lambda i: i), idx, "doc_id", "text",
                batch_id=7,
            )
        else:
            compact_minhash_index(spark, idx, keep_last=1)
    elif family == "embed":
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            append_to_embed_lsh_index,
            build_embed_lsh_index,
            compact_embed_lsh_index,
        )

        if op == "build":
            build_embed_lsh_index(
                vecs(range(20)), idx, "vec_id", "embedding",
                n_planes=4, n_tables=2, dim=16,
            )
        elif op == "append":
            append_to_embed_lsh_index(
                vecs(range(700, 710)), idx, "vec_id", "embedding", batch_id=7
            )
        else:
            compact_embed_lsh_index(spark, idx, keep_last=1)
    elif family == "ivf":
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            append_to_ivf_index,
            build_ivf_index,
            compact_ivf_index,
        )

        if op == "build":
            build_ivf_index(
                vecs(range(40)), idx, "vec_id", "embedding", n_centroids=2
            )
        elif op == "append":
            append_to_ivf_index(
                vecs(range(700, 710)), idx, "vec_id", "embedding", batch_id=7
            )
        else:
            compact_ivf_index(spark, idx, keep_last=1)
    else:
        raise SystemExit(f"unknown family {family!r}")

    # reaching here means the barrier never fired — the parent treats a
    # clean exit as a scenario error
    print("COMPLETED_WITHOUT_BARRIER", flush=True)


if __name__ == "__main__":
    main()
