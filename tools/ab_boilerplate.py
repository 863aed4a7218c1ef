"""500k-doc A/B of doc_boilerplate_ratio's dispatched Arrow shingler
(r14 verdict task 7): the exploded-rows Arrow kernel with in-kernel
per-doc dedup (shingle_hash_rows(per_doc_distinct=True)) vs the direct
JVM explode, same session, interleaved noop actions + full value
identity. The corpus is scale_stress's deterministic 500k-doc tier —
the tier where the array-form kernel's 3.5x shingle win was measured
in r14; the r14 attempt lost at sf0.1 to sort_array + the projection
boundary, which this rows-form kernel does not pay.

Usage: python tools/ab_boilerplate.py [n_docs]
Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_AB_PASSES (default 3).
Output: plans/r15/ab_boilerplate_500k.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    passes = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "3"))

    from scale_stress import gen_documents

    from projet_5spar_sparkstreaming_spark.operators import dedup as od
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("ab_boilerplate")
    path = f"/tmp/ab_boiler_{n}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        gen_documents(spark, n, path)
    sf_dir = os.path.dirname(path)

    # point the builder at the generated corpus via a shim sf_dir: the
    # catalog reads <sf_dir>/documents.parquet
    link_dir = f"/tmp/ab_boiler_sf_{n}"
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)

    q = {c.name: c for c in catalog()}["doc_boilerplate_ratio"]
    big_thresh, huge = od._ARROW_SHINGLE_MIN_BYTES, 1 << 60

    def _action(arrow: bool) -> float:
        od._ARROW_SHINGLE_MIN_BYTES = 0 if arrow else huge
        t0 = time.time()
        q.build(spark, link_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    try:
        # value identity (also warms both paths)
        od._ARROW_SHINGLE_MIN_BYTES = 0
        h_arrow = (
            q.build(spark, link_dir)
            .selectExpr(
                "sum(hash(doc_id, n_shingles, n_boilerplate, "
                "cast(boilerplate_ratio as string))) as h",
                "count(*) as c",
            )
            .collect()[0]
        )
        od._ARROW_SHINGLE_MIN_BYTES = huge
        h_jvm = (
            q.build(spark, link_dir)
            .selectExpr(
                "sum(hash(doc_id, n_shingles, n_boilerplate, "
                "cast(boilerplate_ratio as string))) as h",
                "count(*) as c",
            )
            .collect()[0]
        )
        identical = tuple(h_arrow) == tuple(h_jvm)
        arrow_s, jvm_s = [], []
        for _ in range(passes):
            arrow_s.append(_action(True))
            jvm_s.append(_action(False))
    finally:
        od._ARROW_SHINGLE_MIN_BYTES = big_thresh

    out = {
        "n_docs": n,
        "identical_values": identical,
        "hash_arrow": [int(h_arrow["h"]), int(h_arrow["c"])],
        "hash_jvm": [int(h_jvm["h"]), int(h_jvm["c"])],
        "arrow_sec": [round(s, 2) for s in arrow_s],
        "jvm_sec": [round(s, 2) for s in jvm_s],
        "arrow_median": round(statistics.median(arrow_s), 2),
        "jvm_median": round(statistics.median(jvm_s), 2),
    }
    print(json.dumps(out, indent=1))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ab_boilerplate_500k.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
