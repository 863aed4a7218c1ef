"""Same-session A/B of the r15 decontamination_overlap exchange dedup
(r14 verdict task 3): the OLD ngram_overlap_join shape ((doc_id,__s)-
partitioned cache + distinct'd broadcast probe set, verbatim from git
6e0da8c) vs the CURRENT operator (doc_id-partitioned cache, raw probe
set). Interleaved noop actions + value identity in one session.

Usage: python tools/ab_decon.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS, SPARK_GRAFT_AB_PASSES (default 5).
Output: plans/r15/ab_decon.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def old_ngram_overlap_join(evals, train, id_col, text_col, n=13):
    """Pre-r15 shape, verbatim from git 6e0da8c."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        shingle_hash_rows,
    )

    ev_ids = evals.select(F.col(id_col).alias("doc_id"))
    ev_sh = (
        shingle_hash_rows(evals, id_col, text_col, n)
        .withColumnRenamed("__id", "doc_id")
        .dropDuplicates(["doc_id", "__s"])
        .cache()
    )
    ev_set = ev_sh.select("__s").distinct()
    tr_s = (
        shingle_hash_rows(train, id_col, text_col, n)
        .join(F.broadcast(ev_set), "__s", "left_semi")
        .groupBy("__s")
        .agg(F.lit(1))
        .select("__s")
    )
    hits = (
        ev_sh.join(F.broadcast(tr_s), "__s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    sizes = ev_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    return (
        ev_ids.join(sizes, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_contaminated"), F.lit(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.round(
                F.coalesce(F.col("n_contaminated"), F.lit(0))
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("contamination_rate"),
            (F.coalesce(F.col("n_contaminated"), F.lit(0)) > 0).alias("flagged"),
        )
    )


def old_decon(spark, sf_dir):
    from projet_5spar_sparkstreaming_spark.plans.catalog import _t

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    evals = docs.filter(F.col("doc_id") % 5 == 0)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    return old_ngram_overlap_join(evals, train, "doc_id", "text", n=13)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "5"))

    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("ab_decon")
    new_b = {q.name: q for q in catalog()}["decontamination_overlap"].build

    def _action(builder) -> float:
        spark.catalog.clearCache()  # both variants cache ev_sh: rebuild per pass
        t0 = time.time()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    rows_new = sorted(map(tuple, new_b(spark, sf_dir).collect()))
    rows_old = sorted(map(tuple, old_decon(spark, sf_dir).collect()))
    identical = rows_new == rows_old

    new_s, old_s = [], []
    _action(new_b)  # warm
    for i in range(passes):
        spark.sparkContext.setJobDescription(f"ab-decon-new:{i}")
        new_s.append(_action(new_b))
        spark.sparkContext.setJobDescription(f"ab-decon-old:{i}")
        old_s.append(_action(old_decon))
    out = {
        "sf_dir": sf_dir,
        "identical_values": identical,
        "new_sec": [round(s, 3) for s in new_s],
        "old_sec": [round(s, 3) for s in old_s],
        "new_median": round(statistics.median(new_s), 3),
        "old_median": round(statistics.median(old_s), 3),
    }
    print(json.dumps(out, indent=1))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ab_decon.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
