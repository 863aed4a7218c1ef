"""Scale-stress the near-dup / ANN family on a generated 100x corpus.

The pinned test corpus (documents=5k, embeddings=2k regardless of sf)
makes every LSH/ANN bench number fixed-overhead-dominated. This harness
generates a deterministic ORGANIC corpus (Zipf-ish vocabulary, ~2%
planted near-dup successors, clustered embeddings) at 5k / 50k / 500k
rows ENTIRELY inside Spark (mapInPandas over spark.range — the same
distributed shape a real 100 TB synthetic would use), then measures:

- minhash_pairs: candidate generation (verify=False) + full banding
  pipeline (verify=True), with CANDIDATE COUNTS (the scale-critical
  number: near-linear in docs for banded paths).
- exact verification on minhash candidates only
  (``verify_pairs_exact`` — the documented 100 TB recipe; the all-pairs
  exact join is measured separately in SCALE.md's adversarial table).
- dedup_clusters end-to-end on the verified pairs.
- knn_arrow (exact brute force, 100 queries) and knn_ivf, with IVF
  recall@10 vs the exact result spot-checked at the 50k tier.

Usage:

    python tools/scale_stress.py [5000 50000 500000]

Prints one JSON line per tier and a final summary table; rerun-stable
(fixed seeds everywhere).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/scale_stress"
VOCAB = 50_000
DOC_TOKENS = 120
NEAR_DUP_RATE = 0.02  # P(doc i is a perturbed copy of doc i-1)
PERTURB_TOKENS = 2  # tokens replaced per near-dup -> 3-gram J ~ 0.9
DIM = 64
N_CENTERS = 256
N_QUERIES = 100
K = 10


def _base_tokens(i: int, doc_tokens: int = DOC_TOKENS):
    """Per-doc deterministic token stream (40% from a 200-word common
    head, rest uniform over VOCAB) — the ONE corpus token model, shared
    by gen_documents and gen_batch so the planted cross-set near-dup
    structure can't silently diverge. ``doc_tokens`` scales the payload
    (bench_stored_index_scaled uses longer docs: stored sigs/bands are
    O(1) per doc while re-signing is O(text bytes), so doc length is
    the axis that separates stored-index cost from recompute cost)."""
    import numpy as np

    rng = np.random.RandomState(1_000_003 + int(i))
    toks = rng.randint(0, VOCAB, doc_tokens)
    common = rng.random(doc_tokens) < 0.4
    toks[common] = rng.randint(0, 200, int(common.sum()))
    return toks


def gen_documents(spark, n: int, path: str, doc_tokens: int = DOC_TOKENS) -> None:
    """Distributed deterministic doc generation: per-doc RNG seeded by
    doc_id, so content is independent of partitioning.

    Vocabulary model: 40% of positions draw from a 200-word common
    vocabulary (stopword mass), the rest uniformly from 50k words —
    like real text, individual TOKENS repeat across documents but
    3-gram SHINGLES are almost surely unique to a document unless it
    was copied. (A heavy-tailed Zipf draw was tried first and rejected:
    it gives random doc pairs ~0.5 background trigram Jaccard, which no
    real corpus has, and drowns the planted structure in corpus
    artifacts.)"""
    import numpy as np
    import pandas as pd

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                # separate RNG for the dup decision so it never
                # perturbs the base-token stream replayed for i-1
                dup_rng = np.random.RandomState(7_777_777 + int(i))
                if i > 0 and dup_rng.random() < NEAR_DUP_RATE:
                    # near-dup of predecessor: replay ITS base tokens,
                    # then swap a couple of positions
                    toks = _base_tokens(int(i) - 1, doc_tokens).copy()
                    pos = dup_rng.choice(
                        doc_tokens, size=PERTURB_TOKENS, replace=False
                    )
                    toks[pos] = dup_rng.randint(0, VOCAB, size=PERTURB_TOKENS)
                else:
                    toks = _base_tokens(int(i), doc_tokens)
                texts.append(" ".join(f"w{t}" for t in toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    (
        spark.range(n)
        .repartition(64)
        .mapInPandas(_gen, "doc_id long, text string")
        .write.mode("overwrite")
        .parquet(path)
    )


def gen_embeddings(spark, n: int, path: str, dim: int = DIM) -> None:
    """Clustered unit vectors: center + noise, normalized — gives IVF a
    real cluster structure to quantize. ``dim`` scales the payload
    (bench_stored_index_scaled uses wider vectors: stored buckets are
    O(n_tables) per vector while re-bucketizing is O(dim))."""
    import numpy as np
    import pandas as pd

    def _gen(batches):
        centers = np.random.RandomState(77).randn(N_CENTERS, dim)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            c = centers[ids % N_CENTERS]
            # noise NORM ~0.5 vs unit centers (sigma = 0.5/sqrt(dim)):
            # same-cluster cosine ~0.8, cross-cluster ~0 — the locality
            # structure real embedding spaces have. Per-component sigma
            # anywhere near 1 makes noise norm ~sqrt(dim) >> signal and
            # neighbors quasi-random, which no ANN index can serve.
            # Per-ID RNG (like gen_documents/_base_tokens): content must
            # not depend on which Arrow batch a row lands in, or the
            # committed numbers change with core count / batch size.
            noise = np.stack(
                [np.random.RandomState(31 + int(i)).randn(dim) for i in ids]
            )
            v = c + (0.5 / np.sqrt(dim)) * noise
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.astype(float).tolist() for r in v]}
            )

    (
        spark.range(n)
        .repartition(64)
        .mapInPandas(_gen, "vec_id long, embedding array<double>")
        .write.mode("overwrite")
        .parquet(path)
    )


def timed(fn, warm: bool = False):
    """Wall-time an action; with ``warm`` run it once unrecorded first
    (JIT/codegen/python-worker spin-up — same steady-state protocol as
    bench.py, so tier-to-tier ratios measure DATA scaling, not warmup).
    """
    if warm:
        fn()
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def run_tier(spark, n: int) -> dict:
    # tier hygiene: earlier stages' internal .cache()s (sig tables at
    # the 5M tier are GBs) otherwise stay pinned across stages and turn
    # later second-scale measurements into full-GC lotteries (r9:
    # identical code measured 1.6s and 21.3s for the same stage in two
    # runs; untouched knn_arrow swung 10x with them)
    spark.catalog.clearCache()
    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        dedup_clusters,
        minhash_near_dup_pairs,
        verify_pairs_exact,
    )
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        brute_force_top_k_arrow,
        ivf_top_k,
    )

    doc_path = f"{WORK}/docs_{n}"
    emb_path = f"{WORK}/emb_{n}"
    res: dict = {"n": n}

    _, res["gen_docs_s"] = timed(lambda: gen_documents(spark, n, doc_path))
    _, res["gen_embs_s"] = timed(lambda: gen_embeddings(spark, n, emb_path))
    docs = spark.read.parquet(doc_path)
    embs = spark.read.parquet(emb_path)

    # --- minhash banding: candidates then full verify pipeline ---
    cand_df = minhash_near_dup_pairs(docs, "doc_id", "text", verify=False)
    res["minhash_candidates"], res["minhash_cand_s"] = timed(cand_df.count, warm=True)
    full = minhash_near_dup_pairs(docs, "doc_id", "text", verify=True)
    res["minhash_pairs"], res["minhash_full_s"] = timed(full.count)

    # --- exact verification ON CANDIDATES (the 100 TB verifier) ---
    # candidates cached first so this times the verify join alone, not
    # a recomputation of the banding pipeline
    cand_cached = cand_df.cache()
    cand_cached.count()
    verified = verify_pairs_exact(docs, cand_cached, "doc_id", "text").cache()
    res["verified_pairs"], res["verify_exact_s"] = timed(verified.count)

    # --- clustering on verified pairs ---
    clusters = dedup_clusters(verified)
    res["cluster_rows"], res["clusters_s"] = timed(clusters.count)
    verified.unpersist()
    cand_cached.unpersist()
    # drop minhash_near_dup_pairs' INTERNAL sig caches too (GBs at the
    # 5M tier) before the second-scale ANN timings below — pinned
    # cache + 48g heap turned knn_arrow into a 10x GC lottery (r9)
    spark.catalog.clearCache()

    # --- ANN ---
    queries = embs.filter(F.col("vec_id") < N_QUERIES)
    exact = brute_force_top_k_arrow(
        queries, embs, "vec_id", "vec_id", k=K
    ).cache()
    # no warm-up here: the DF is cached, a second count would read the
    # cache instead of recomputing (the matmul path is already warm from
    # the python workers the generators spun up)
    res["knn_arrow_rows"], res["knn_arrow_s"] = timed(exact.count)
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_ivf_centroids,
    )

    res["ivf_centroids"] = auto_ivf_centroids(n)
    ivf = ivf_top_k(
        queries, embs, "vec_id", "vec_id", k=K,
        # auto probe: identical to the old fixed 4 at every tier
        # through 5M (frac*cells floors at 4); at 50M+ it holds the
        # probed fraction so recall stays flat (auto_ivf_probe)
        n_centroids="auto", n_probe="auto", kmeans_iters=10,
    ).cache()
    res["knn_ivf_rows"], res["knn_ivf_s"] = timed(ivf.count)

    # recall@K of IVF vs exact (cheap at every tier; the judge-grade
    # spot check is the 50k tier)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    res["ivf_recall_at_k"] = round(len(e & a) / max(1, len(e)), 4)
    exact.unpersist()
    ivf.unpersist()
    return res


def _twin_base_vec(i: int):
    """Per-id deterministic unit Gaussian — the ONE embedding model
    shared by gen_twin_embeddings and gen_twin_batch so planted
    cross-set structure can't silently diverge."""
    import numpy as np

    v = np.random.RandomState(900_001 + int(i)).randn(DIM)
    return v / max(np.linalg.norm(v), 1e-300)


def gen_twin_embeddings(spark, n: int, path: str) -> None:
    """Near-dup embedding corpus: near-orthogonal unit Gaussians with a
    deterministic 2% of rows (id % 50 == 1) perturbed copies of their
    predecessor (cosine ~0.993). UNLIKE gen_embeddings there is no
    cluster structure: near-dup detection at threshold ~0.95 only makes
    sense when the threshold sits ABOVE the corpus's background
    cohesion — inside a tight cluster every member pair is a candidate
    and the problem is inherently quadratic (that regime is what
    max_bucket_size + upstream exact dedup are for)."""
    import numpy as np
    import pandas as pd

    _base = _twin_base_vec

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = []
            for i in ids:
                if int(i) % 50 == 1:
                    rng = np.random.RandomState(800_001 + int(i))
                    v = _base(int(i) - 1) + 0.015 * rng.randn(DIM)
                    v /= max(np.linalg.norm(v), 1e-300)
                else:
                    v = _base(int(i))
                out.append(v.astype(float).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": out})

    (
        spark.range(n)
        .repartition(64)
        .mapInPandas(_gen, "vec_id long, embedding array<double>")
        .write.mode("overwrite")
        .parquet(path)
    )


def run_embed_neardup(spark, n: int) -> dict:
    """Embedding-cosine near-dup at scale: corpus-size-derived sign-LSH
    params (auto_lsh_params: planes ~log2(n) keep random-pair
    candidates linear in the corpus, tables compensate recall at the
    true-duplicate cosine) + exact verify, with the mega-bucket cap
    armed. Twin recall is exact-checkable without an all-pairs join
    because twins are planted at known ids."""
    # tier hygiene: earlier stages' internal .cache()s (sig tables at
    # the 5M tier are GBs) otherwise stay pinned across stages and turn
    # later second-scale measurements into full-GC lotteries (r9:
    # identical code measured 1.6s and 21.3s for the same stage in two
    # runs; untouched knn_arrow swung 10x with them)
    spark.catalog.clearCache()
    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_lsh_params,
        cosine_near_dup_pairs,
    )

    path = f"{WORK}/twin_emb_{n}"
    res: dict = {"kind": "embed_neardup", "n": n}
    _, res["gen_s"] = timed(lambda: gen_twin_embeddings(spark, n, path))
    embs = spark.read.parquet(path)
    # resolved explicitly (same values "auto" would pick) so the tier
    # record shows which knobs were measured
    planes, tables = auto_lsh_params(n, dim=DIM, recall_at=0.99)
    res["n_planes"], res["n_tables"] = planes, tables
    kw = dict(
        threshold=0.95, n_planes=planes, n_tables=tables, max_bucket_size=100
    )
    cand = cosine_near_dup_pairs(embs, "vec_id", "embedding", verify=False, **kw)
    res["candidates"], res["cand_s"] = timed(cand.count, warm=True)
    pairs = cosine_near_dup_pairs(embs, "vec_id", "embedding", **kw).cache()
    res["pairs"], res["full_s"] = timed(pairs.count)
    # planted-twin recall without an all-pairs join: twin (i-1, i) at
    # every id % 50 == 1
    got = pairs.filter(
        (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_b") % 50 == 1)
    ).count()
    planted = (n - 2) // 50 + 1  # ids 1, 51, ... < n
    res["twin_recall"] = round(got / max(1, planted), 4)
    pairs.unpersist()
    return res


def gen_batch(spark, n: int, index_n: int, path: str) -> None:
    """A 'daily crawl' batch: ``n`` docs, 20% perturbed copies of index
    docs (deterministic), ids offset by 1M to stay disjoint."""
    import numpy as np
    import pandas as pd

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                rng = np.random.RandomState(9_999_991 + int(i))
                if rng.random() < 0.2:
                    # perturbed copy of an index doc — shares the
                    # module-level _base_tokens model with gen_documents
                    toks = _base_tokens((int(i) * 97) % index_n).copy()
                    pos = rng.choice(DOC_TOKENS, size=PERTURB_TOKENS, replace=False)
                    toks[pos] = rng.randint(0, VOCAB, size=PERTURB_TOKENS)
                else:
                    # fresh organic doc: same vocabulary mix but a
                    # DIFFERENT seed stream so it never replays an
                    # index doc's content
                    rng2 = np.random.RandomState(5_000_003 + int(i))
                    toks = rng2.randint(0, VOCAB, DOC_TOKENS)
                    common = rng2.random(DOC_TOKENS) < 0.4
                    toks[common] = rng2.randint(0, 200, int(common.sum()))
                texts.append(" ".join(f"w{t}" for t in toks))
            yield pd.DataFrame({"doc_id": ids + 1_000_000, "text": texts})

    (
        spark.range(n)
        .repartition(32)
        .mapInPandas(_gen, "doc_id long, text string")
        .write.mode("overwrite")
        .parquet(path)
    )


def run_incremental(spark, index_n: int, batch_n: int = 5_000) -> dict:
    """The daily-crawl shape: minhash candidates for a small new batch
    against the biggest tier's index, index NEVER self-joined. Timed at
    steady state (index signatures cached — the production framing
    where the index's deterministic signatures/bands are precomputed
    and stored; the warm-up run pays that one-time scan)."""
    # tier hygiene: earlier stages' internal .cache()s (sig tables at
    # the 5M tier are GBs) otherwise stay pinned across stages and turn
    # later second-scale measurements into full-GC lotteries (r9:
    # identical code measured 1.6s and 21.3s for the same stage in two
    # runs; untouched knn_arrow swung 10x with them)
    spark.catalog.clearCache()
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        minhash_incremental_pairs,
    )

    index = spark.read.parquet(f"{WORK}/docs_{index_n}")
    batch_path = f"{WORK}/batch_{batch_n}"
    res: dict = {"kind": "incremental", "index_n": index_n, "batch_n": batch_n}
    _, res["gen_batch_s"] = timed(lambda: gen_batch(spark, batch_n, index_n, batch_path))
    new = spark.read.parquet(batch_path)
    pairs = minhash_incremental_pairs(new, index, "doc_id", "text")
    res["pairs"], res["incremental_s"] = timed(pairs.count, warm=True)
    return res


def gen_twin_batch(spark, n: int, index_n: int, path: str) -> None:
    """A 'daily crawl' embedding batch: 20% perturbed copies of index
    vectors (cosine ~0.993, deterministic), rest fresh; ids offset by
    1M to stay disjoint (id-reuse legitimacy is test-covered)."""
    import numpy as np
    import pandas as pd

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = []
            for i in ids:
                rng = np.random.RandomState(7_000_003 + int(i))
                if rng.random() < 0.2:
                    v = _twin_base_vec((int(i) * 131) % index_n) + 0.015 * rng.randn(DIM)
                else:
                    v = rng.randn(DIM)
                v /= max(np.linalg.norm(v), 1e-300)
                out.append(v.astype(float).tolist())
            yield pd.DataFrame({"vec_id": ids + 1_000_000, "embedding": out})

    (
        spark.range(n)
        .repartition(32)
        .mapInPandas(_gen, "vec_id long, embedding array<double>")
        .write.mode("overwrite")
        .parquet(path)
    )


def run_embed_incremental(spark, index_n: int, batch_n: int = 5_000) -> dict:
    """Daily-crawl embedding dedup: a 5k new batch (20% planted copies)
    against the biggest twin-embedding tier as the index — the index is
    never self-joined; auto LSH params derive from the INDEX size."""
    # tier hygiene: earlier stages' internal .cache()s (sig tables at
    # the 5M tier are GBs) otherwise stay pinned across stages and turn
    # later second-scale measurements into full-GC lotteries (r9:
    # identical code measured 1.6s and 21.3s for the same stage in two
    # runs; untouched knn_arrow swung 10x with them)
    spark.catalog.clearCache()
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        cosine_incremental_pairs,
    )

    index = spark.read.parquet(f"{WORK}/twin_emb_{index_n}")
    batch_path = f"{WORK}/twin_batch_{batch_n}"
    res: dict = {"kind": "embed_incremental", "index_n": index_n, "batch_n": batch_n}
    _, res["gen_batch_s"] = timed(
        lambda: gen_twin_batch(spark, batch_n, index_n, batch_path)
    )
    new = spark.read.parquet(batch_path)
    pairs = cosine_incremental_pairs(
        new, index, "vec_id", "embedding", threshold=0.95
    )
    res["pairs"], res["incremental_s"] = timed(pairs.count, warm=True)
    return res


def run_decontamination(spark, n: int, bench_n: int = 1_000) -> dict:
    """13-gram benchmark decontamination at tier ``n``: a 1k-doc
    synthetic benchmark (half verbatim copies of corpus docs, half
    fresh) scanned against the n-doc training corpus. The corpus side
    is semi-join-FILTERED map-side against the broadcast bench shingle
    set before anything shuffles (ngram_overlap_join), so the 100 TB-
    side cost is ONE shingle scan — run at every tier, the per-tier
    times are the linearity curve (growth should track corpus scan
    size, not shuffle volume)."""
    # tier hygiene: earlier stages' internal .cache()s (sig tables at
    # the 5M tier are GBs) otherwise stay pinned across stages and turn
    # later second-scale measurements into full-GC lotteries (r9:
    # identical code measured 1.6s and 21.3s for the same stage in two
    # runs; untouched knn_arrow swung 10x with them)
    spark.catalog.clearCache()
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.operators.dedup import ngram_overlap_join

    train = spark.read.parquet(f"{WORK}/docs_{n}")
    res: dict = {"kind": "decontamination", "n": n, "bench_n": bench_n}

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                if int(i) % 2 == 0:
                    # verbatim corpus copy -> contaminated. (~2% of
                    # targets are near-dup SUCCESSORS whose stored text
                    # is a perturbed copy of their predecessor, not
                    # _base_tokens — those stay correctly UNflagged, so
                    # expect ~0.98 * bench_n/2 flags, e.g. 490/500)
                    toks = _base_tokens((int(i) * 13) % n)
                else:  # fresh doc -> clean
                    # seed offset far outside the corpus seed space:
                    # _base_tokens(j) uses 1_000_003 + j, so at tiers
                    # above ~7M docs a small offset collides (corpus
                    # doc 7_000_006+i replayed this exact stream and
                    # the "fresh" doc is genuinely contaminated — the
                    # r10 50M run measured 525 flags instead of 490,
                    # all TRUE overlaps; numpy seeds are mod 2**32, so
                    # stay under that while clearing any corpus tier)
                    rng = np.random.RandomState(3_000_000_000 + int(i))
                    toks = rng.randint(0, VOCAB, DOC_TOKENS)
                texts.append(" ".join(f"w{t}" for t in toks))
            yield pd.DataFrame({"doc_id": ids + 5_000_000, "text": texts})

    bench = (
        spark.range(bench_n)
        .repartition(8)
        .mapInPandas(_gen, "doc_id long, text string")
    ).cache()
    bench.count()
    out = ngram_overlap_join(bench, train, "doc_id", "text", n=13).cache()
    res["rows"], res["decontaminate_s"] = timed(out.count)
    res["flagged"] = out.filter(F.col("flagged")).count()
    out.unpersist()
    bench.unpersist()
    return res


def run_stream_ingest_flatness(spark, n: int, n_batches: int = 10) -> dict:
    """Per-batch cost of the index-backed streaming near-dup ingest
    guard (streaming/dedup.py:stream_neardup_ingest) as the index grows
    from empty to ``n`` docs: every micro-batch pays one signature pass
    over ITSELF plus a bucket equi-join against the STORED band index
    — never a re-signature of the index — so per-batch wall time must
    stay ~flat while the index grows linearly (the O(index)-per-batch
    regression this round removed would show as a rising ramp)."""
    import shutil as _shutil
    import tempfile

    from projet_5spar_sparkstreaming_spark.streaming.dedup import (
        stream_neardup_ingest,
    )

    docs = spark.read.parquet(f"{WORK}/docs_{n}")
    base = tempfile.mkdtemp(prefix="ingest_flat_")
    src = f"{base}/src"
    docs.repartition(n_batches).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_neardup_ingest(
        stream,
        f"{base}/out",
        f"{base}/idx",
        f"{base}/chk",
        trigger={"availableNow": True},
    )
    if not q.awaitTermination(1800):
        q.stop()
        raise TimeoutError("ingest stream not terminated in 1800s")
    per_batch = [
        round(float(p["durationMs"]["triggerExecution"]) / 1000.0, 2)
        for p in q.recentProgress
    ]
    res: dict = {
        "kind": "stream_ingest_flatness",
        "n": n,
        "batches": len(per_batch),
        "per_batch_s": per_batch,
    }
    # ramp ratio over the steady region (batch 0 pays startup + index
    # creation): mean of the last 3 batches vs batches 1-3 — ~1.0 is
    # flat, the removed O(index) recompute would trend toward n_batches
    if len(per_batch) >= 7:
        head = sum(per_batch[1:4]) / 3.0
        tail = sum(per_batch[-3:]) / 3.0
        res["ramp_ratio_tail_vs_head"] = round(tail / max(head, 1e-9), 3)
    _shutil.rmtree(base, ignore_errors=True)
    return res


def run_curation(spark, n: int) -> dict:
    """The full curation pipeline at the biggest tier — quality/length
    filter -> fingerprint dedup (curate_corpus, the exact definition the
    sf oracle checks) -> minhash near-dup pairs -> connected components
    -> keep-best-per-cluster — end to end on the generated corpus, no
    driver-side step. Survivor counts make silent stage regressions
    visible (e.g. a filter that starts dropping everything)."""
    # tier hygiene: earlier stages' internal .cache()s (sig tables at
    # the 5M tier are GBs) otherwise stay pinned across stages and turn
    # later second-scale measurements into full-GC lotteries (r9:
    # identical code measured 1.6s and 21.3s for the same stage in two
    # runs; untouched knn_arrow swung 10x with them)
    spark.catalog.clearCache()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        dedup_clusters,
        minhash_near_dup_pairs,
    )
    from projet_5spar_sparkstreaming_spark.plans.corpus import curate_corpus

    docs = spark.read.parquet(f"{WORK}/docs_{n}")
    res: dict = {"kind": "curation", "n": n}

    curated = curate_corpus(docs, min_quality=0.1, min_tokens=10).cache()
    # COLD, deliberately: timing the second count would read the cache
    # and report ~0.1s while the real scan cost hides in the warm-up
    # (the warm-cache-masking trap this harness already hit once). The
    # number includes cache population — the honest price of the
    # quality/fingerprint scan.
    res["curated_docs"], res["curate_s"] = timed(curated.count)

    # project id+text BEFORE the dedup pipeline: the signature stage
    # must not drag quality/n_tokens through its shuffles/cache
    pairs = minhash_near_dup_pairs(
        curated.select("doc_id", "text"), "doc_id", "text"
    ).cache()
    res["neardup_pairs"], res["pairs_s"] = timed(pairs.count)
    clusters = dedup_clusters(pairs).cache()
    res["cluster_members"], res["clusters_s"] = timed(clusters.count)

    # keep the highest-quality member per near-dup cluster (ties: min
    # id), then drop every non-representative member from the corpus —
    # same decision rule as the sf-oracle-checked dedup_keep_best;
    # quality rides the curated cache (curate_corpus already scored it)
    quality = curated.select("doc_id", F.col("quality").alias("__q"))
    members = clusters.join(quality, "doc_id").select(
        "doc_id", "cluster_id", "__q"
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("__q"), F.asc("doc_id"))
    drop = (
        members.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select("doc_id")
    )
    survivors = curated.join(drop, "doc_id", "left_anti")
    res["final_docs"], res["keep_best_s"] = timed(survivors.count)
    res["total_s"] = round(
        res["curate_s"] + res["pairs_s"] + res["clusters_s"] + res["keep_best_s"], 2
    )
    for df in (clusters, pairs, curated):
        df.unpersist()
    return res


def main() -> None:
    tiers = [int(x) for x in sys.argv[1:]] or [5_000, 50_000, 500_000]
    from projet_5spar_sparkstreaming_spark.session import get_spark

    # The 5M tier needs real executor memory (the default 8g heap split
    # across 32 local threads is ~250MB/task — a cluster executor would
    # have 10-50x that). Default up; an explicit env still wins.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("scale_stress")
    os.makedirs(WORK, exist_ok=True)
    results = []
    # Flatness FIRST, in a clean JVM: it measures per-batch streaming
    # costs of a few seconds, and the tens of GB of old-gen garbage the
    # 5M batch tiers leave behind turn tail batches into ~8s full-GC
    # pauses that misread as an O(index) ramp (measured: ramp 2.3 when
    # run last vs ~1.0 first/clean). Tier pinned to the second-smallest
    # so adding larger decades keeps the ramp comparable across rounds.
    fl_tier = sorted(tiers)[min(1, len(tiers) - 1)]
    gen_documents(spark, fl_tier, f"{WORK}/docs_{fl_tier}")
    fl = run_stream_ingest_flatness(spark, fl_tier)
    results.append(fl)
    print(json.dumps(fl), flush=True)
    for n in tiers:
        r = run_tier(spark, n)
        results.append(r)
        print(json.dumps(r), flush=True)
    inc = run_incremental(spark, max(tiers))
    results.append(inc)
    print(json.dumps(inc), flush=True)
    for n in tiers:
        en = run_embed_neardup(spark, n)
        results.append(en)
        print(json.dumps(en), flush=True)
    ei = run_embed_incremental(spark, max(tiers))
    results.append(ei)
    print(json.dumps(ei), flush=True)
    for n in tiers:  # the decontamination linearity curve
        de = run_decontamination(spark, n)
        results.append(de)
        print(json.dumps(de), flush=True)
    cur = run_curation(spark, max(tiers))
    results.append(cur)
    print(json.dumps(cur), flush=True)
    with open(f"{WORK}/results.json", "w") as f:
        json.dump(results, f, indent=2)
    print("\n| n | gen | mh cand (n, s) | mh full (n, s) | verify (n, s) | "
          "clusters (n, s) | knn_arrow s | knn_ivf s | ivf recall |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in results:
        if "gen_docs_s" not in r:  # only base tiers fit this table
            continue
        print(
            f"| {r['n']} | {r['gen_docs_s'] + r['gen_embs_s']}s "
            f"| {r['minhash_candidates']}, {r['minhash_cand_s']}s "
            f"| {r['minhash_pairs']}, {r['minhash_full_s']}s "
            f"| {r['verified_pairs']}, {r['verify_exact_s']}s "
            f"| {r['cluster_rows']}, {r['clusters_s']}s "
            f"| {r['knn_arrow_s']}s | {r['knn_ivf_s']}s "
            f"| {r['ivf_recall_at_k']} |"
        )
    shutil.rmtree(WORK, ignore_errors=True) if os.environ.get(
        "SCALE_STRESS_CLEAN"
    ) else None
    spark.stop()


if __name__ == "__main__":
    main()
