"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the scale-sensitive plans: full-scan aggregation,
fact-fact-dim joins, window analytics, time rollups, set/dedup ops,
and vector search. Each timed query runs the full plan to completion
via a count-style action (results are not collected to the driver —
we measure engine throughput, not py4j transfer).

Noise control: one unrecorded warm pass (JIT/codegen/parquet-footer
caches), then THREE recorded passes; per query we report the MEDIAN
(the headline total is the sum of medians) plus the min-max spread —
a single-run bench cannot distinguish a 1.2x regression from
environment noise, and round-over-round comparisons kept flagging
phantom drift on sub-second queries.
"""

from __future__ import annotations

import json
import os
import statistics
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
    # round-6 additions: the two remaining TPC-H shapes (widest join
    # diamond + window-decorrelated correlated min)
    "q2_min_cost_supplier",
    "q8_market_share",
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
    # round-5 additions: chunker, stratified/quality sampling, cross-set
    # embedding dedup. (The *_containment contract queries are NOT
    # benched: their relaxed-threshold exact join is a correctness
    # gate, deliberately heavier than any production path.)
    "chunk_documents",
    "stratified_sample_docs",
    "quality_percentile_filter",
    "incremental_embedding_pairs",
]

RECORDED_PASSES = 3


def _split_copy(spark, sf_dir: str, table: str, n_files: int, base: str) -> str:
    """Rewrite a source table into ``n_files`` parquet files so the
    file stream (maxFilesPerTrigger=1) replays it as ``n_files``
    micro-batches — single-file tables would otherwise collapse into
    one batch and the 'throughput' number would be pure fixed cost."""
    from projet_5spar_sparkstreaming_spark.sources.files import read_parquet_table

    path = os.path.join(base, table)
    read_parquet_table(spark, sf_dir, table).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _steady_state(progress: list) -> dict:
    """Per-batch trigger durations + steady-state rows/s EXCLUDING the
    first micro-batch (stream startup + code paths warming are fixed
    cost, not throughput)."""
    rows = [int(p["numInputRows"]) for p in progress]
    secs = [float(p["durationMs"]["triggerExecution"]) / 1000.0 for p in progress]
    steady_rows = sum(rows[1:])
    steady_sec = sum(secs[1:])
    return {
        "rows_in": sum(rows),
        "micro_batches": len(progress),
        "per_batch_sec": [round(s, 3) for s in secs],
        "rows_per_s_steady": (
            round(steady_rows / steady_sec) if steady_sec > 0 else None
        ),
    }


def bench_stored_index(spark, sf_dir: str) -> dict[str, dict]:
    """Time the PRODUCTION daily shape — querying a pre-built persisted
    index — against recompute-from-scratch at identical splits and
    parameters, for all three index families. Stores are built once
    (build time reported separately, amortized over every later query
    in production); each query path then gets one unrecorded warm pass
    and RECORDED_PASSES timed passes, reported as median + spread,
    executed via a noop write like the headline section. The point on
    record: query-through-store must beat its recompute twin, because
    at 100 TB the index side is scanned, never re-signed. (Caveat for
    reading the numbers: the test tables are fixed-size — 5k docs / 2k
    vectors at every sf — so the minhash twin shows the real gap (the
    recompute re-signs the index side) while the embed-LSH/IVF twins
    are near fixed-overhead parity here; THEIR asymptotic advantage is
    plan-shaped and plan-asserted in tests — stored buckets/cells are
    scanned with pruning instead of re-derived from the corpus.)"""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        build_minhash_index,
        minhash_incremental_pairs,
        minhash_query_index,
    )
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        build_embed_lsh_index,
        build_ivf_index,
        cosine_incremental_pairs,
        embed_lsh_query_index,
        ivf_top_k,
        query_ivf_index,
    )
    from projet_5spar_sparkstreaming_spark.sources.files import read_parquet_table

    base = tempfile.mkdtemp(prefix="bench_store_")
    docs = read_parquet_table(spark, sf_dir, "documents")
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    new_docs = docs.filter(F.col("doc_id") % 2 == 1)
    idx_docs = docs.filter(F.col("doc_id") % 2 == 0)
    new_vecs = emb.filter(F.col("vec_id") % 2 == 1)
    idx_vecs = emb.filter(F.col("vec_id") % 2 == 0)
    q_vecs = emb.filter(F.col("vec_id") < 20)

    builds: dict[str, float] = {}
    mh_store = os.path.join(base, "mh")
    el_store = os.path.join(base, "el")
    ivf_store = os.path.join(base, "ivf")
    for name, build in (
        ("minhash", lambda: build_minhash_index(
            idx_docs, mh_store, "doc_id", "text")),
        ("embed_lsh", lambda: build_embed_lsh_index(
            idx_vecs, el_store, "vec_id", "embedding",
            recall_at=0.5, target_recall=0.9, expected_rows=2048)),
        ("ivf", lambda: build_ivf_index(
            emb, ivf_store, "vec_id", "embedding", n_centroids=16)),
    ):
        t0 = time.time()
        build()
        builds[name] = round(time.time() - t0, 3)

    # stored-vs-recompute twins: same splits, same params, same result
    # contract (identity is test-enforced in test_index_lifecycle.py)
    plans = {
        "stored_minhash_query": lambda: minhash_query_index(
            new_docs, mh_store, "doc_id", "text", threshold=0.5),
        "recompute_minhash": lambda: minhash_incremental_pairs(
            new_docs, idx_docs, "doc_id", "text", threshold=0.5),
        "stored_embed_lsh_query": lambda: embed_lsh_query_index(
            new_vecs, el_store, "vec_id", "embedding", threshold=0.3),
        "recompute_embed_lsh": lambda: cosine_incremental_pairs(
            new_vecs, idx_vecs, "vec_id", "embedding", threshold=0.3,
            recall_at=0.5, target_recall=0.9),
        "stored_ivf_query": lambda: query_ivf_index(
            spark, q_vecs, ivf_store, "vec_id", "embedding",
            k=5, n_probe=6),
        "recompute_ivf": lambda: ivf_top_k(
            q_vecs, emb, "vec_id", "vec_id", k=5,
            n_centroids=16, n_probe=6),
    }
    runs: dict[str, list[float]] = {n: [] for n in plans}
    for record in [False] + [True] * RECORDED_PASSES:
        for name, plan in plans.items():
            t0 = time.time()
            plan().write.format("noop").mode("overwrite").save()
            if record:
                runs[name].append(time.time() - t0)
    out: dict[str, dict] = {
        n: {
            "sec": round(statistics.median(ts), 3),
            "spread": [round(min(ts), 3), round(max(ts), 3)],
        }
        for n, ts in runs.items()
    }
    for name in builds:
        out[f"stored_{name}_query"]["build_sec"] = builds[name]
    shutil.rmtree(base, ignore_errors=True)
    return out


def bench_streaming(spark, sf_dir: str) -> dict[str, dict]:
    """Throughput of the stateful streaming paths (the batch section
    never exercises them), measured over >= 5 REAL micro-batches each:
    windowed aggregation, the curation pipeline, and both index-backed
    near-dup ingest guards (whose per-batch times must stay flat as
    the index grows — the O(index)-per-batch recompute regression
    would show here immediately)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.plans.corpus import curate_corpus_stream
    from projet_5spar_sparkstreaming_spark.streaming.dedup import (
        stream_embed_neardup_ingest,
        stream_neardup_ingest,
    )

    base = tempfile.mkdtemp(prefix="bench_stream_")
    events_path = _split_copy(spark, sf_dir, "events", 8, base)
    docs_path = _split_copy(spark, sf_dir, "documents", 6, base)
    emb_path = _split_copy(spark, sf_dir, "embeddings", 6, base)

    def _file_stream(path: str, files_per_trigger: int = 1):
        return (
            spark.readStream.schema(spark.read.parquet(path).schema)
            .option("maxFilesPerTrigger", str(files_per_trigger))
            .parquet(path)
        )

    def _minute_counts():
        agg = (
            _file_stream(events_path)
            .groupBy(F.window("ts", "1 minute"))
            .agg(F.count("*").alias("cnt"))
        )
        return (
            agg.writeStream.format("memory")
            .queryName("bench_stream_minutes")
            .outputMode("complete")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="chk_b_", dir=base))
            .trigger(availableNow=True)
            .start()
        )

    def _curate(files_per_trigger: int = 1, suffix: str = ""):
        curated = curate_corpus_stream(
            _file_stream(docs_path, files_per_trigger),
            min_quality=0.59,
            min_tokens=10,
            max_tokens=100_000,
        ).select("doc_id", "quality", "n_tokens")
        return (
            curated.writeStream.format("memory")
            .queryName("bench_stream_curate" + suffix)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="chk_b_", dir=base))
            .trigger(availableNow=True)
            .start()
        )

    def _neardup_ingest(files_per_trigger: int = 1, suffix: str = ""):
        return stream_neardup_ingest(
            _file_stream(docs_path, files_per_trigger).select("doc_id", "text"),
            os.path.join(base, "nd_out" + suffix),
            os.path.join(base, "nd_idx" + suffix),
            tempfile.mkdtemp(prefix="chk_b_", dir=base),
            trigger={"availableNow": True},
        )

    def _embed_ingest(files_per_trigger: int = 1, suffix: str = ""):
        return stream_embed_neardup_ingest(
            _file_stream(emb_path, files_per_trigger).select("vec_id", "embedding"),
            os.path.join(base, "emb_out" + suffix),
            os.path.join(base, "emb_idx" + suffix),
            tempfile.mkdtemp(prefix="chk_b_", dir=base),
            trigger={"availableNow": True},
            expected_index_rows=2_000_000,
        )

    out: dict[str, dict] = {}
    for name, starter in (
        ("stream_minute_counts", _minute_counts),
        ("stream_curate_corpus", _curate),
        ("stream_neardup_ingest", _neardup_ingest),
        ("stream_embed_neardup_ingest", _embed_ingest),
        # "_tuned": same stream, same engine code, production trigger
        # sizing — measured per-batch cost is ~2s of FIXED micro-batch
        # overhead (3 output writes + multi-stage joins) regardless of
        # batch size, so the standard Structured Streaming throughput
        # knob is the trigger: 3 source files per micro-batch amortizes
        # the fixed cost over 3x the rows. The 1-file variants above
        # stay as the flatness/regression canaries (more batches =
        # per-batch ramp visible); this pair is the throughput number.
        ("stream_neardup_ingest_tuned", lambda: _neardup_ingest(3, "_t")),
        ("stream_embed_neardup_ingest_tuned", lambda: _embed_ingest(3, "_t")),
        ("stream_curate_corpus_tuned", lambda: _curate(3, "_t")),
    ):
        t0 = time.time()
        q = starter()
        q.awaitTermination(600)
        dt = time.time() - t0
        stats = _steady_state(list(q.recentProgress))
        stats["sec"] = round(dt, 3)
        out[name] = stats
    shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("bench")
    cat = {q.name: q for q in catalog()}

    # Pass 0 (unrecorded): JIT/codegen/parquet-footer warmup. Passes
    # 1..RECORDED_PASSES: timed; per query keep the median + spread.
    runs: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for record in [False] + [True] * RECORDED_PASSES:
        for name in BENCH_QUERIES:
            q = cat[name]
            t0 = time.time()
            df = q.build(spark, sf_dir)
            # full execution without driver-side row transfer
            df.write.format("noop").mode("overwrite").save()
            if record:
                runs[name].append(time.time() - t0)

    timings = {n: round(statistics.median(ts), 3) for n, ts in runs.items()}
    spread = {
        n: [round(min(ts), 3), round(max(ts), 3)] for n, ts in runs.items()
    }

    stored_index = bench_stored_index(spark, sf_dir)
    streaming = bench_streaming(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                # median of RECORDED_PASSES runs per query
                "queries": timings,
                "runs_per_query": RECORDED_PASSES,
                "spread": spread,
                # separate keys: keep the headline total like-for-like
                # across rounds while making stateful-path and
                # stored-index-path regressions visible
                "stored_index": stored_index,
                "streaming": streaming,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
