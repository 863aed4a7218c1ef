"""Stored-IVF vs brute-force crossover measurement (r10 verdict task 1).

No prior artifact showed the STORED IVF index's query-only path (build
amortized away) beating the exact brute-force Arrow kernel at any
measured (store size, query batch) point — an ANN index that never
beats exact scan is dead weight. This harness measures exactly that
matrix and produces the routing constants for
``query_ivf_index(route="auto")``:

- store tiers: 500k / 5M (and 50M via an explicit argument) clustered
  unit vectors (``tools/scale_stress.gen_embeddings`` — the same
  deterministic generator as the decade runs),
- query batches: 10 / 100 / 1000,
- both paths read the SAME stored parquet (the IVF data tree), so the
  comparison isolates probe-vs-scan, not storage format,
- IVF recall@k vs the brute result (ground truth) is recorded per
  cell, because routing to the probe is only legitimate where its
  recall holds.

Timing protocol: one warm-up query (batch=10, IVF path) absorbs JVM/
Arrow warm-up at each tier, then each (path, batch) cell is a single
cold-ish pass at the big tiers and min-of-2 at 500k — crossover
decisions need 1 significant figure, not benchmark-grade medians.

Usage:

    python tools/ivf_crossover.py [500000 5000000]
    python tools/ivf_crossover.py 50000000          # the big one

Prints one JSON line per tier; the full matrix lands in
``IVF_CROSSOVER_r12.json`` at the repo root (seeded from the newest
prior round's file, so re-measured tiers replace their row and new
tiers append).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/ivf_crossover"
BATCHES = (10, 100, 1000)
K = 10


def _recall(approx_rows, exact_rows, k: int) -> float:
    """Mean fraction of the exact top-k the approximate result found,
    per query (standard recall@k)."""
    from collections import defaultdict

    ex = defaultdict(set)
    for r in exact_rows:
        ex[r["query_id"]].add(r["neighbor_id"])
    ap = defaultdict(set)
    for r in approx_rows:
        ap[r["query_id"]].add(r["neighbor_id"])
    if not ex:
        return 1.0
    return sum(
        len(ap[q] & ex[q]) / max(len(ex[q]), 1) for q in ex
    ) / len(ex)


def run_tier(spark, n: int, rebuild: bool = True) -> dict:
    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        query_ivf_index,
    )
    from tools import scale_stress as ss

    vec_path = f"{WORK}/vecs_{n}"
    idx_path = f"{WORK}/ivf_{n}"
    res: dict = {"kind": "ivf_crossover", "n": n, "k": K}

    if rebuild or not os.path.exists(vec_path):
        _, res["gen_s"] = ss.timed(lambda: ss.gen_embeddings(spark, n, vec_path))
    vecs = spark.read.parquet(vec_path)

    if rebuild or not os.path.exists(idx_path):
        from projet_5spar_sparkstreaming_spark.operators.similarity import (
            build_ivf_index,
        )

        t0 = time.monotonic()
        res["n_cells"] = build_ivf_index(
            vecs, idx_path, "vec_id", "embedding", n_centroids="auto"
        )
        res["build_s"] = round(time.monotonic() - t0, 2)

    # query batches: leading ids (deterministic; the generator's
    # content depends only on the id)
    def batch_df(q):
        return vecs.filter(F.col("vec_id") < q)

    # warm-up: one small probe query absorbs JVM + Arrow init
    query_ivf_index(
        spark, batch_df(10), idx_path, "vec_id", "embedding",
        k=K, n_probe="auto", route="ivf",
    ).count()

    reps = 2 if n <= 500_000 else 1
    cells = []
    for q in BATCHES:
        qdf = batch_df(q)
        cell: dict = {"batch": q}
        ivf_rows = brute_rows = None
        for path, route in (("ivf_s", "ivf"), ("brute_s", "brute")):
            best = None
            for _ in range(reps):
                t0 = time.monotonic()
                rows = query_ivf_index(
                    spark, qdf, idx_path, "vec_id", "embedding",
                    k=K, n_probe="auto", route=route,
                ).collect()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            cell[path] = round(best, 3)
            if route == "ivf":
                ivf_rows = rows
            else:
                brute_rows = rows
        cell["recall_at_k"] = round(_recall(ivf_rows, brute_rows, K), 4)
        cell["winner"] = "ivf" if cell["ivf_s"] < cell["brute_s"] else "brute"
        cells.append(cell)
        print(json.dumps({"n": n, **cell}), flush=True)
    res["cells"] = cells
    return res


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from projet_5spar_sparkstreaming_spark.session import get_spark

    tiers = [int(a) for a in sys.argv[1:] if a.isdigit()] or [
        500_000,
        5_000_000,
    ]
    keep = "--keep" in sys.argv
    spark = get_spark(
        "ivf_crossover",
        extra_conf={"spark.cleaner.periodicGC.interval": "1min"},
    )
    os.makedirs(WORK, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(repo, "IVF_CROSSOVER_r12.json")
    results = []
    # seed from the newest prior round's matrix so re-measured tiers
    # replace their row and new tiers (e.g. the 2M bracket-narrowing
    # point) append next to the old ones
    for prior in ("IVF_CROSSOVER_r12.json", "IVF_CROSSOVER_r11.json"):
        p = os.path.join(repo, prior)
        if os.path.exists(p):
            with open(p) as f:
                results = json.load(f)
            break
    for n in tiers:
        res = run_tier(spark, n)
        results = [r for r in results if r.get("n") != n] + [res]
        results.sort(key=lambda r: r["n"])
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(res), flush=True)
        if not keep:
            shutil.rmtree(f"{WORK}/vecs_{n}", ignore_errors=True)
            shutil.rmtree(f"{WORK}/ivf_{n}", ignore_errors=True)
            for aside in ("", ".writer.lock"):
                p = f"{WORK}/ivf_{n}{aside}"
                if os.path.exists(p):
                    os.remove(p) if os.path.isfile(p) else shutil.rmtree(p)
    spark.stop()


if __name__ == "__main__":
    main()
