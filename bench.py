"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the scale-sensitive plans: full-scan aggregation,
fact-fact-dim joins, window analytics, time rollups, set/dedup ops,
and vector search. Each timed query runs the full plan to completion
via a count-style action (results are not collected to the driver —
we measure engine throughput, not py4j transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # scale-sensitive core
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume",
    "segment_order_stats",
    "top3_orders_per_customer",
    "order_gaps",
    "semi_join_urgent",
    "q7_nation_volume",
    "q9_nation_profit",
    "q21_waiting_suppliers",
    # event analytics (reference-parity surface)
    "user_activity",
    "minute_window_counts",
    "latest_event_per_user",
    "top_type_per_day",
    "json_k_stats",
    "asof_last_signup",
    "user_sessions",
    "pivot_type_day",
    # north-star ops (documents/embeddings are fixed-size: these gauge
    # expression/codegen cost, not data scaling)
    "tfidf_top_terms",
    "pack_documents",
    "ngram_jaccard_pairs",
    "minhash_pairs",
    "simhash_pairs",
    "containment_pairs",
    "knn_bruteforce",
    "knn_arrow",
    "knn_lsh",
    "knn_ivf",
    # round-4 additions: incremental dedup + curation projections
    "incremental_neardup_pairs",
    "doc_repetition_stats",
    "doc_gopher_rules",
    "doc_mean_token_freq",
    "decontamination_overlap",
    "vocab_coverage",
    "doc_boilerplate_ratio",
    "mix_sampling_weights",
    "doc_pii_scan",
    "embedding_pair_sims",
    "embedding_neardup_pairs",
    "duplicate_span_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from projet_5spar_sparkstreaming_spark.session import get_spark
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog

    spark = get_spark("bench")
    cat = {q.name: q for q in catalog()}

    # Warm run (unrecorded): JIT/codegen/parquet-footer caches, then a
    # steady-state timed run. Engine throughput, not JVM warmup noise.
    timings: dict[str, float] = {}
    for record in (False, True):
        for name in BENCH_QUERIES:
            q = cat[name]
            t0 = time.time()
            df = q.build(spark, sf_dir)
            # full execution without driver-side row transfer
            df.write.format("noop").mode("overwrite").save()
            if record:
                timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
