"""Fifth scale decade: 50M docs / 50M vectors (r9 verdict task 4).

One decade above scale_stress's largest tier, PHASE-SPLIT so the two
~20GB generated tables never coexist on disk (the container has ~48GB
free; docs are deleted before embeddings generate), and with
disk-spill behavior CAPTURED, not guessed: per-phase deltas of
memory/disk spill and shuffle-write bytes from the Spark UI REST API
— this is the first tier expected to push the 32-thread/48g-heap
local JVM past comfortable memory, which is the point.

Usage:

    python tools/scale_decade.py [50000000]

Prints one JSON line per phase; deterministic generators shared with
tools/scale_stress.py. Timings are COLD single passes (a warm pass at
this tier would double a ~30-minute run for no additional claim).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/scale_decade"


def _ui_stage_totals(spark) -> dict:
    """Cumulative completed-stage spill/shuffle byte totals from the
    app's own UI REST endpoint (phase deltas = per-phase behavior)."""
    try:
        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=15) as r:
            stages = json.load(r)
        return {
            "memory_spilled_bytes": sum(
                int(s.get("memoryBytesSpilled", 0)) for s in stages
            ),
            "disk_spilled_bytes": sum(
                int(s.get("diskBytesSpilled", 0)) for s in stages
            ),
            "shuffle_write_bytes": sum(
                int(s.get("shuffleWriteBytes", 0)) for s in stages
            ),
            "stages": len(stages),
        }
    except Exception as e:  # UI off / endpoint moved: degrade, don't die
        return {"error": str(e)}


def _delta(after: dict, before: dict) -> dict:
    if "error" in after or "error" in before:
        return after
    return {k: after[k] - before[k] for k in after}


def main() -> None:
    ann_only = "--ann-only" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 50_000_000
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    os.environ.setdefault("SPARK_GRAFT_UI", "true")

    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.session import get_spark
    from tools import scale_stress as ss

    # aggressive periodic context GC: shuffle files of finished stages
    # are only unlinked when their RDDs are collected — at this tier a
    # lingering 25GB shuffle generation is the difference between
    # fitting the scratch disk and ENOSPC mid-spill
    spark = get_spark(
        "scale_decade",
        extra_conf={"spark.cleaner.periodicGC.interval": "1min"},
    )
    os.makedirs(WORK, exist_ok=True)
    ss.WORK = WORK  # run_decontamination resolves the docs dir through it
    results = []

    # ---- phase 1: documents (minhash linearity + decontamination) ----
    if ann_only:
        _run_ann_phase(spark, n, results)
        with open(f"{WORK}/results.json", "w") as f:
            json.dump(results, f, indent=2)
        spark.stop()
        return
    doc_path = f"{WORK}/docs_{n}"
    res: dict = {"kind": "decade_docs", "n": n}
    _, res["gen_docs_s"] = ss.timed(lambda: ss.gen_documents(spark, n, doc_path))
    docs = spark.read.parquet(doc_path)

    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )

    s0 = _ui_stage_totals(spark)
    cand = minhash_near_dup_pairs(docs, "doc_id", "text", verify=False).cache()
    res["minhash_candidates"], res["minhash_cand_s"] = ss.timed(cand.count)
    res["spill_minhash_cand"] = _delta(_ui_stage_totals(spark), s0)
    # at this tier the full re-banding pass (verify=True recomputes the
    # banding pipeline with signature arrays riding the joins) roughly
    # DOUBLES peak scratch-disk footprint (~25GB docs + two >25GB
    # shuffle generations — the first attempt died on 'no space left
    # on device' mid-spill). The documented 100 TB recipe is
    # generate-then-verify anyway: exact trigram verification of the
    # CACHED candidate set, whose join shuffles O(candidates), not
    # O(corpus).
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        verify_pairs_exact,
    )

    s1 = _ui_stage_totals(spark)
    verified = verify_pairs_exact(docs, cand, "doc_id", "text")
    res["verified_pairs"], res["verify_exact_s"] = ss.timed(verified.count)
    res["spill_verify"] = _delta(_ui_stage_totals(spark), s1)
    cand.unpersist()
    results.append(res)
    print(json.dumps(res), flush=True)

    de = ss.run_decontamination(spark, n)
    results.append(de)
    print(json.dumps(de), flush=True)

    shutil.rmtree(doc_path, ignore_errors=True)
    spark.catalog.clearCache()
    _run_ann_phase(spark, n, results)
    with open(f"{WORK}/results.json", "w") as f:
        json.dump(results, f, indent=2)
    spark.stop()


def _run_ann_phase(spark, n: int, results: list) -> None:
    from pyspark.sql import functions as F

    from tools import scale_stress as ss

    # ---- phase 2: embeddings (IVF recall + probe cost at 50M) ----
    emb_path = f"{WORK}/emb_{n}"
    res2: dict = {"kind": "decade_ann", "n": n}
    _, res2["gen_embs_s"] = ss.timed(lambda: ss.gen_embeddings(spark, n, emb_path))
    embs = spark.read.parquet(emb_path)
    queries = embs.filter(F.col("vec_id") < ss.N_QUERIES)

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_ivf_centroids,
        brute_force_top_k_arrow,
        ivf_top_k,
    )

    s2 = _ui_stage_totals(spark)
    exact = brute_force_top_k_arrow(
        queries, embs, "vec_id", "vec_id", k=ss.K
    ).cache()
    res2["knn_arrow_rows"], res2["knn_arrow_s"] = ss.timed(exact.count)
    res2["spill_knn_arrow"] = _delta(_ui_stage_totals(spark), s2)
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_ivf_probe,
    )

    res2["ivf_centroids"] = auto_ivf_centroids(n)
    res2["ivf_n_probe"] = auto_ivf_probe(res2["ivf_centroids"])
    s3 = _ui_stage_totals(spark)
    ivf = ivf_top_k(
        queries, embs, "vec_id", "vec_id", k=ss.K,
        n_centroids="auto", n_probe="auto", kmeans_iters=10,
    ).cache()
    res2["knn_ivf_rows"], res2["knn_ivf_s"] = ss.timed(ivf.count)
    res2["spill_knn_ivf"] = _delta(_ui_stage_totals(spark), s3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    res2["ivf_recall_at_k"] = round(len(e & a) / max(1, len(e)), 4)
    exact.unpersist()
    ivf.unpersist()
    results.append(res2)
    print(json.dumps(res2), flush=True)
    shutil.rmtree(emb_path, ignore_errors=True)


if __name__ == "__main__":
    main()
