"""Same-session A/B of the sized candidate-pair dedup (r15, verdict
task 1) on the sf1 decade blow-up — the scale where the r14 regression
was measured (embedding_neardup_pairs 60 -> 120 s when
openCostInBytes 4MB -> 512KB moved the embeddings scan 2 -> 10 splits).

Variants, interleaved in ONE session per openCost value:
  new: _sized_pair_dedup (exchange sized from the analytic pair
       estimate, dedup after it)
  old: plain dropDuplicates on the join output (partial agg in the
       scan-parallelism join stage) — restored by monkeypatch.
spark.catalog.clearCache() runs before every measurement so the banded
cache's partitioning (where the scan-split count lives) is rebuilt
under the measured conf, not inherited from the previous variant.

Usage: python tools/ab_pair_dedup.py [--skip-gen] [query ...]
Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_AB_REPS (default 2).
Output: plans/r15/ab_pair_dedup_sf1.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = ["embedding_neardup_pairs", "incremental_embedding_pairs",
           "embedding_neardup_pairs_dedup"]
OPEN_COSTS = {"512k": "524288", "4m": "4194304"}


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--skip-gen"]
    names = args or QUERIES
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))

    from bench_sf1 import DST, blow_up

    from projet_5spar_sparkstreaming_spark.operators import similarity
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("ab_pair_dedup")
    if "--skip-gen" not in sys.argv[1:] and not os.path.exists(DST):
        blow_up(spark)
    cat = {q.name: q for q in catalog()}

    sized = similarity._sized_pair_dedup

    def unsized(cand, est):  # the pre-r15 shape
        return cand.dropDuplicates(["id_a", "id_b"])

    def measure(name: str, variant: str) -> float:
        similarity._sized_pair_dedup = sized if variant == "new" else unsized
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"ab:{name}:{variant}")
        t0 = time.time()
        cat[name].build(spark, DST).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    results: dict = {}
    try:
        for oc_tag, oc in OPEN_COSTS.items():
            spark.conf.set("spark.sql.files.openCostInBytes", oc)
            for name in names:
                key = f"{name}@{oc_tag}"
                runs = {"new": [], "old": []}
                for _ in range(reps):
                    for variant in ("new", "old"):
                        sec = measure(name, variant)
                        runs[variant].append(round(sec, 2))
                        print(f"{key} {variant}: {sec:.2f}s", file=sys.stderr)
                results[key] = runs
    finally:
        similarity._sized_pair_dedup = sized
        spark.sparkContext.setJobDescription(None)

    out = {"sf1_dir": DST, "reps": reps, "results": results}
    print(json.dumps(out, indent=1))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ab_pair_dedup_sf1.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
