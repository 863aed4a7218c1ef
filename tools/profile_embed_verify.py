"""Stage profile of the stored embed-LSH query at the scaled-bench
tier (250k x dim-768 store, 5k probe) — r10 verdict task 2.

Finding (r11, recorded in SCALE.md "Stored embed-LSH verify"): the
end-to-end stored/recompute ratio (~0.74x vs the 0.501x candidate
stage) is NOT a removable constant. The verify's apparent
"2 x dim x 8 B per candidate pair materialization" never materializes:
candidate pairs stream from the broadcast hash join straight through
whole-stage codegen into the Arrow cosine kernel, so the legacy verify
runs at memory bandwidth. A staged int8-screen variant (FAISS-style
SQ8 + lossless rescoring bound, prototyped this round) measured 1.5x
SLOWER at the bench tier and 6x slower at a 50k-row probe — the extra
job barriers, driver round-trips, and Python-side probe-matrix
broadcast swamp the byte savings. The verify cost is therefore
structural and identical on both paths, and the candidate-stage ratio
is the family's contract.

Measures: cand (verify=False), scan_vecs (the verify's input IO),
full (end-to-end), recompute (the twin), candidate/pair counts.

Run: python tools/profile_embed_verify.py [scale]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.session import get_spark
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_lsh_params,
        build_embed_lsh_index,
        cosine_incremental_pairs,
        embed_lsh_query_index,
    )
    from projet_5spar_sparkstreaming_spark.fsio import versioned_subdir
    from tools.scale_stress import gen_embeddings

    spark = get_spark()
    vec_store_n = int(250_000 * scale)
    probe_n = 5_000
    dim = 768
    base = tempfile.mkdtemp(prefix="profile_embed_")
    out: dict = {
        "vec_store_rows": vec_store_n,
        "dim": dim,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }

    t0 = time.time()
    gen_embeddings(spark, vec_store_n + probe_n, os.path.join(base, "embs"), dim=dim)
    out["gen_s"] = round(time.time() - t0, 3)
    embs = spark.read.parquet(os.path.join(base, "embs"))
    store_vecs = embs.filter(F.col("vec_id") < vec_store_n)
    probe_vecs = embs.filter(F.col("vec_id") >= vec_store_n)
    n_planes, n_tables = auto_lsh_params(vec_store_n, dim=dim)
    el_store = os.path.join(base, "el")
    t0 = time.time()
    build_embed_lsh_index(
        store_vecs, el_store, "vec_id", "embedding",
        n_planes=n_planes, n_tables=n_tables, dim=dim,
    )
    out["build_s"] = round(time.time() - t0, 3)
    vecs_dir = versioned_subdir(el_store, "vecs", 0)
    files = [
        os.path.getsize(os.path.join(vecs_dir, "batch_id=0", f))
        for f in os.listdir(os.path.join(vecs_dir, "batch_id=0"))
        if f.endswith(".parquet")
    ]
    out["vecs_files"] = len(files)
    out["vecs_mb"] = round(sum(files) / 1e6, 1)

    def timed(name, plan_fn, n=3):
        ts = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.time()
            plan_fn().write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        ts.sort()
        out[name] = round(ts[len(ts) // 2], 3)
        print(name, out[name], [round(t, 2) for t in ts], flush=True)

    timed("cand", lambda: embed_lsh_query_index(
        probe_vecs, el_store, "vec_id", "embedding", verify=False))
    timed("scan_vecs", lambda: spark.read.parquet(vecs_dir).drop("batch_id"))
    timed("full", lambda: embed_lsh_query_index(
        probe_vecs, el_store, "vec_id", "embedding"))
    timed("recompute", lambda: cosine_incremental_pairs(
        probe_vecs, store_vecs, "vec_id", "embedding",
        n_planes=n_planes, n_tables=n_tables, dim=dim))

    cand = embed_lsh_query_index(
        probe_vecs, el_store, "vec_id", "embedding", verify=False)
    out["n_candidates"] = cand.count()
    out["full_over_recompute"] = round(out["full"] / out["recompute"], 3)
    out["cand_verify_split"] = {
        "stored_cand": out["cand"],
        "stored_verify": round(out["full"] - out["cand"], 3),
    }
    print(json.dumps(out, indent=1))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
