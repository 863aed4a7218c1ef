"""Interior fixed point of the trigger controller on a corpus big
enough that batch duration actually reaches the target (r12).

BENCH_FULL r12 showed all three sf0.1 auto entries converging AT the
max_files cap — not a controller defect but the workload being small:
per-batch duration at 32 files is 1.5-2.9 s against the 8 s target,
so the proportional step always wants more files than the bounded
source offers (SCALE.md, "cap-bound"). This harness is the
complementary measurement: generate a corpus large enough that
duration(files_per_trigger) CROSSES the target inside the feasible
range, run the identical controller (same curation pipeline, same
target, same cap), and record the interior fixed point it converges
to plus the steady batch durations at that setting.

Claim being tested: the controller converges strictly below the cap
with steady batches inside the +-25% convergence band of the target,
whenever the workload physically admits such a point.

Usage: python tools/trigger_fixed_point.py [n_docs] [n_files]
       (defaults 5_000_000 docs over 64 files, target 8 s, cap 32)
Writes TRIGGER_FIXED_POINT_r12.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_SEC = 8.0
MAX_FILES = 32


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from projet_5spar_sparkstreaming_spark.plans.corpus import (
        curate_corpus_stream,
    )
    from projet_5spar_sparkstreaming_spark.session import get_spark
    from projet_5spar_sparkstreaming_spark.streaming.tuning import (
        start_with_auto_trigger,
    )
    import tools.scale_stress as ss

    spark = get_spark("trigger_fixed_point")
    base = tempfile.mkdtemp(prefix="trig_fp_")
    t0 = time.time()
    raw = os.path.join(base, "raw")
    ss.gen_documents(spark, n_docs, raw)
    src = os.path.join(base, "src")
    spark.read.parquet(raw).repartition(n_files).write.parquet(src)
    gen_s = round(time.time() - t0, 1)

    def make(fpt: int):
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", str(fpt))
            .parquet(src)
        )
        curated = curate_corpus_stream(
            stream, min_quality=0.59, min_tokens=10, max_tokens=100_000
        ).select("doc_id", "quality", "n_tokens")
        return (
            curated.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(base, "chk"))
            .trigger(availableNow=True)
            .start()
        )

    t0 = time.time()
    q, fpt, _ = start_with_auto_trigger(
        make, canary_batches=1, target_batch_sec=TARGET_SEC,
        max_files=MAX_FILES,
    )
    if not q.awaitTermination(1800):
        q.stop()
        raise TimeoutError("fixed-point stream not terminated in 1800s")
    sec_total = round(time.time() - t0, 1)
    progress = list(q.recentProgress)
    per_batch = [
        round(float(p["durationMs"]["triggerExecution"]) / 1000.0, 2)
        for p in progress
    ]
    rows = [int(p["numInputRows"]) for p in progress]
    # steady batches: full-size ones at the converged setting (drop the
    # trailing remainder batch if the source didn't divide evenly)
    steady = [
        s for s, r in zip(per_batch, rows) if r >= 0.9 * max(rows or [1])
    ]
    out = {
        "kind": "trigger_fixed_point",
        "n_docs": n_docs,
        "n_files": n_files,
        "target_batch_sec": TARGET_SEC,
        "max_files": MAX_FILES,
        "gen_s": gen_s,
        "files_per_trigger": fpt,
        "interior": bool(fpt < MAX_FILES),
        "per_batch_sec": per_batch,
        "rows_in": rows,
        "steady_batch_sec": steady,
        "steady_mean_sec": round(sum(steady) / len(steady), 2) if steady else None,
        "in_band": bool(
            steady
            and 0.5 * TARGET_SEC
            <= sum(steady) / len(steady)
            <= 1.5 * TARGET_SEC
        ),
        "sec_total": sec_total,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out), flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "TRIGGER_FIXED_POINT_r12.json"), "w") as f:
        json.dump(out, f, indent=1)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
