"""Stage-time breakdown of benchmark decontamination at big tiers —
r10 verdict task 6: the tier curve (26 s at 5M docs -> 169 s at 50M,
6.5x for 10x data) needed decomposing into (a) raw corpus IO, (b) the
Arrow shingle kernel, (c) the broadcast semi-join + overlap distinct,
(d) the full operator, to show which stage carries the growth and
whether any of it is superlinear.

Stages measured per tier (cold, cache cleared, one pass each — a tier
is minutes of wall):

  raw_scan_s     train.agg(sum(length(text))) — parquet IO + decode
  shingle_s      shingle_hash_rows(train).count() — IO + the Arrow
                 13-gram kernel over every doc (the decon plan's
                 corpus-side cost floor)
  semi_s         the decon plan's corpus side: shingles -> broadcast
                 semi-join vs the bench set -> distinct survivors
  decon_s        run_decontamination (the full operator, incl. the
                 1k-doc bench generation + per-doc stats joins)

Usage: python tools/profile_decon.py [tiers...]   (default: 5000000 50000000)
Writes one JSON line per tier; docs tables are generated under
/tmp/profile_decon and DELETED per tier before the next generates.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/profile_decon"


def main() -> None:
    tiers = [int(t) for t in sys.argv[1:]] or [5_000_000, 50_000_000]
    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.session import get_spark
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        shingle_hash_rows,
    )
    import tools.scale_stress as ss

    spark = get_spark()
    os.makedirs(WORK, exist_ok=True)
    ss.WORK = WORK  # run_decontamination resolves docs via ss.WORK
    results = []
    for n in tiers:
        res: dict = {"kind": "decon_profile", "n": n,
                     "loadavg_1m": round(os.getloadavg()[0], 2)}
        path = f"{WORK}/docs_{n}"
        t0 = time.time()
        ss.gen_documents(spark, n, path)
        res["gen_s"] = round(time.time() - t0, 2)
        train = spark.read.parquet(path)

        spark.catalog.clearCache()
        t0 = time.time()
        row = train.agg(
            F.sum(F.length("text")).alias("b"),
            F.count(F.lit(1)).alias("r"),
        ).collect()[0]
        res["raw_scan_s"] = round(time.time() - t0, 2)
        res["text_gb"] = round(int(row["b"]) / 1e9, 2)

        spark.catalog.clearCache()
        t0 = time.time()
        res["n_shingles"] = shingle_hash_rows(
            train, "doc_id", "text", 13
        ).count()
        res["shingle_s"] = round(time.time() - t0, 2)

        # the decon plan's corpus side, with a realistic broadcast
        # probe set: the same 1k-doc benchmark run_decontamination uses
        # is private to it, so probe with a deterministic 1k-doc sample
        # of the corpus itself (same shingle volume ~ same semi cost)
        bench_ids = train.filter(F.col("doc_id") % (n // 1_000) == 0)
        ev_set = (
            shingle_hash_rows(bench_ids, "doc_id", "text", 13)
            .select("__s").distinct()
        )
        spark.catalog.clearCache()
        t0 = time.time()
        res["n_overlap"] = (
            shingle_hash_rows(train, "doc_id", "text", 13)
            .join(F.broadcast(ev_set), "__s", "left_semi")
            .groupBy("__s").agg(F.lit(1)).select("__s")
            .count()
        )
        res["semi_s"] = round(time.time() - t0, 2)

        de = ss.run_decontamination(spark, n)
        res["decon_s"] = de["decontaminate_s"]
        res["flagged"] = de["flagged"]
        print(json.dumps(res), flush=True)
        results.append(res)
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
