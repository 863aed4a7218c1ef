"""sf10 decade point for the DATA-BOUND headline subset (r13 verdict
task 4).

The sf1 sweep (tools/bench_sf1.py, BENCH_SF1_r13.json) proved 36/49
headline queries were still fixed-overhead-bound at a 10x payload on
local[32] — their ratios measured lane-filling, not data scaling. This
tool takes the queries that DID show real data scaling there
(sf1/sf0.1 ratio >= 2.2) two decades up: a 100x blow-up of the tables
that subset actually reads (documents, embeddings — none of the
subset touches the TPC-H/event tables), timed against sf0.1 in the
same process so ratios are host-drift-free.

Blow-up construction = bench_sf1.py's replica trick at 100 replicas:
documents get per-replica token suffixes (within-replica shingle
structure identical, cross-replica Jaccard 0), embeddings get
per-replica deterministic +-1 sign patterns (within-replica cosine
structure exact, cross-replica dots decorrelated), ids shift by a
stride. r=0 is the sf0.1 table verbatim.

Exclusions and designed failures are first-class results:
- embedding_pair_sims / embedding_neardup_pairs are the suite's two
  DOCUMENTED quadratics (exact sampled pair join kept as the oracle
  twin; threshold-0.3 LSH below the corpus's background cosine). At
  sf10 they are ~10,000x the sf0.1 pair count by design — excluded,
  with the sf1 measurement (46.6x / 36.4x) as their decade record. The
  dedup-grade linear twin embedding_neardup_pairs_dedup runs instead.
- ngram_jaccard_pairs' exact-join candidate budget is EXPECTED to trip
  (ADVERSARIAL_r13 measured the fence firing at n=100k docs; sf10 is
  500k) — a raise here is the guard working, recorded as such.

Every query runs under try/except: an error is recorded with its
message, never aborts the sweep. Queries whose ratio exceeds
LINEAR_X_BUDGET x the data blow-up are flagged for plan investigation
in the payload.

Usage: python tools/bench_sf10.py [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/bench_sf10_data"
OUT = os.path.join(REPO, "BENCH_SF10_r14.json")
REPLICAS = 100
PASSES = 2
STRIDE_BIG = 10_000_000

# sf1/sf0.1 ratio >= 2.2 in BENCH_SF1_r13.json, minus the two
# documented quadratics (see module docstring), plus the r14
# dedup-grade linear embed entry
QUERIES = [
    "quality_percentile_filter",
    "doc_boilerplate_ratio",
    "incremental_embedding_pairs",
    "ngram_jaccard_pairs",
    "doc_pii_scan",
    "doc_gopher_rules",
    "containment_pairs",
    "incremental_neardup_pairs",
    "pack_documents",
    "embedding_neardup_pairs_dedup",
]
EXCLUDED = {
    "embedding_pair_sims": (
        "documented quadratic: exact sampled pair join (the oracle-"
        "expressible twin of the LSH path); ~10,000x the sf0.1 pair "
        "count at sf10 by design — sf1 decade record 46.6x "
        "(BENCH_SF1_r13.json), 100x case guarded by "
        "bounded_broadcast_side"
    ),
    "embedding_neardup_pairs": (
        "documented quadratic: threshold 0.3 sits below the corpus's "
        "background cosine, candidates O(n^2) by information-theoretic "
        "necessity — sf1 decade record 36.4x; the dedup-grade linear "
        "twin embedding_neardup_pairs_dedup runs in this sweep instead"
    ),
}
# flag threshold: ratio > budget x the 100x data blow-up is
# super-linear beyond explanation and needs a plan investigation
LINEAR_X_BUDGET = 3.0


def blow_up(spark) -> None:
    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.sources.files import (
        read_parquet_table,
    )

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("__r"))

    def shift(col):
        return (F.col(col) + F.col("__r") * STRIDE_BIG).alias(col)

    docs = read_parquet_table(spark, SRC, "documents").crossJoin(reps)
    tagged = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda tok: F.concat(tok, F.lit("_x"), F.col("__r").cast("string")),
        ),
        " ",
    )
    text = F.when(F.col("__r") == 0, F.col("text")).otherwise(tagged)
    (
        docs.select(shift("doc_id"), text.alias("text"), "lang", "source")
        .withColumn("n_chars", F.length("text"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DST}/documents.parquet")
    )

    emb = read_parquet_table(spark, SRC, "embeddings").crossJoin(reps)
    signed = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            * F.when(
                F.pmod(F.xxhash64(i + F.col("__r") * F.lit(7919)), 2) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
        ).cast("float"),
    )
    vec = F.when(F.col("__r") == 0, F.col("embedding")).otherwise(signed)
    (
        emb.select(shift("vec_id"), vec.alias("embedding"), "label")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{DST}/embeddings.parquet")
    )


def time_queries(spark, sf_dir: str, names, cat) -> tuple[dict, dict]:
    timings, errors = {}, {}

    def run(name) -> None:
        cat[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    for name in names:
        try:
            run(name)  # warm pass (JIT/codegen/footers)
            runs = []
            for _ in range(PASSES):
                t0 = time.time()
                run(name)
                runs.append(time.time() - t0)
            timings[name] = round(statistics.median(runs), 3)
        except Exception as e:  # designed fences raise; record, go on
            errors[name] = f"{type(e).__name__}: {str(e)[:500]}"
    return timings, errors


def main() -> None:
    from bench import CALIB_REF, _calib_scale, _calibrate

    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("bench_sf10")
    cat = {q.name: q for q in catalog()}
    _calibrate(spark)
    calib_start = _calibrate(spark)

    t0 = time.time()
    blow_up(spark)
    sec_blowup = round(time.time() - t0, 1)

    base, base_err = time_queries(spark, SRC, QUERIES, cat)
    big, big_err = time_queries(spark, DST, QUERIES, cat)
    calib_end = _calibrate(spark)

    ratio = {
        n: round(big[n] / base[n], 2)
        for n in QUERIES
        if n in big and n in base and base[n] > 0
    }
    flagged = {
        n: r for n, r in ratio.items() if r > LINEAR_X_BUDGET * REPLICAS
    }
    payload = {
        "metric": "sf10_decade_sweep_data_bound_subset",
        "replicas": REPLICAS,
        "passes_per_query": PASSES,
        "sec_blowup": sec_blowup,
        "subset_rule": "BENCH_SF1_r13 ratio >= 2.2, quadratics excluded",
        "sf0.1_sec": base,
        "sf10_sec": big,
        "ratio_sf10_over_sf01": ratio,
        "linear_would_be": REPLICAS,
        "flagged_super_linear": flagged,
        "designed_fence_trips": big_err,
        "sf0.1_errors": base_err,
        "excluded_documented_quadratics": EXCLUDED,
        "calibration": {
            "ref": CALIB_REF,
            "start": calib_start,
            "end": calib_end,
            "host_scale": round(
                ((_calib_scale(calib_start) or 1.0)
                 * (_calib_scale(calib_end) or 1.0)) ** 0.5, 4,
            ),
        },
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({
        "ratios": ratio,
        "fence_trips": sorted(big_err),
        "flagged": flagged,
        "out": OUT,
    }))
    if "--keep" not in sys.argv:
        shutil.rmtree(DST, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
