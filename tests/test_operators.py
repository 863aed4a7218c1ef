"""Unit tests: operators layer (dedup, topk, rollup, similarity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.operators.dedup import (
    exact_dedup,
    fingerprint_dedup,
    latest_per_key,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    word_shingles,
)
from projet_5spar_sparkstreaming_spark.operators.rollup import (
    time_bucket_counts,
    tumbling_window_counts,
)
from projet_5spar_sparkstreaming_spark.operators.similarity import (
    brute_force_top_k,
    lsh_bucketed_top_k,
)
from projet_5spar_sparkstreaming_spark.operators.topk import top_k_per_group


NEAR_DUP_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog in the morning light"),
    (2, "the quick brown fox jumps over the lazy dog in the evening light"),  # ~dup of 1
    (3, "completely different content about spark structured streaming engines"),
    (4, "the quick brown fox jumps over the lazy dog in the morning light"),  # exact dup of 1
    (5, "unrelated short text"),
]


class TestLatestPerKey:
    def test_picks_newest_nulls_lose(self, spark):
        df = spark.createDataFrame(
            [
                ("a", "2024-01-01 10:00:00", "old"),
                ("a", "2024-01-02 10:00:00", "new"),
                ("a", None, "nullts"),
                ("b", None, "only-null"),
            ],
            ["id", "ts", "tag"],
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {r["id"]: r["tag"] for r in latest_per_key(df, ["id"], "ts").collect()}
        assert out == {"a": "new", "b": "only-null"}

    def test_tie_break_deterministic(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "x"), ("a", 1, "y")], ["id", "v", "tag"]
        )
        out = latest_per_key(df, ["id"], "v", tie_break=("tag",)).collect()
        assert len(out) == 1 and out[0]["tag"] == "x"


class TestExactAndFingerprintDedup:
    def test_exact_dedup_subset(self, spark):
        df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["k", "v"])
        assert exact_dedup(df, ["k"]).count() == 2

    def test_fingerprint_dedup_collapses_formatting(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello, World!"), (2, "hello   world"), (3, "other")], ["id", "t"]
        )
        out = fingerprint_dedup(df, "t", keep_by="id")
        assert out.count() == 2


class TestNearDup:
    def test_ngram_jaccard_finds_planted_pair(self, spark):
        df = spark.createDataFrame(NEAR_DUP_DOCS, ["id", "text"])
        pairs = ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.5).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in got and (1, 4) in got and (2, 4) in got
        exact = [r for r in pairs if (r["id_a"], r["id_b"]) == (1, 4)]
        assert exact[0]["jaccard"] == 1.0

    def test_minhash_recall_vs_exact(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        exact = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8).collect()
        }
        approx = {
            (r["id_a"], r["id_b"])
            for r in minhash_near_dup_pairs(
                docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.5
            ).collect()
        }
        assert exact, "corpus should contain planted near-dups"
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, f"minhash recall {recall:.2f} too low"

    def test_simhash_flags_exact_dup(self, spark):
        df = spark.createDataFrame(NEAR_DUP_DOCS, ["id", "text"])
        pairs = simhash_near_dup_pairs(df, "id", "text", max_hamming=10, n=3)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 4) in got  # identical text -> hamming 0

    def test_containment_catches_inclusion_jaccard_misses(self, spark):
        from projet_5spar_sparkstreaming_spark.operators.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        base = "the quick brown fox jumps over the lazy dog near the old river bank"
        long_doc = (
            base
            + " meanwhile entirely unrelated content continues for a while "
            + "with many additional sentences about weather patterns and "
            + "shipping forecasts and harvest schedules across the region"
        )
        df = spark.createDataFrame(
            [(1, base), (2, long_doc), (3, "completely different text here")],
            ["id", "text"],
        )
        cont = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(df, "id", "text", n=3, threshold=0.9).collect()
        }
        # doc 1's shingles are a subset of doc 2's -> directional hit
        assert cont[(1, 2)] == 1.0
        assert (2, 1) not in cont  # reverse direction is below threshold
        # symmetric Jaccard misses the same pair (size imbalance)
        jac = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.9).collect()
        }
        assert (1, 2) not in jac

    def test_word_shingles_short_docs(self, spark):
        df = spark.createDataFrame([("one two",), ("one",), ("",)], ["t"])
        out = [r["s"] for r in df.select(word_shingles("t", 3).alias("s")).collect()]
        assert out == [["one two"], ["one"], [""]]


class TestTopK:
    def test_top_k_tie_break(self, spark):
        df = spark.createDataFrame(
            [("d1", "b", 5), ("d1", "a", 5), ("d1", "c", 3), ("d2", "z", 1)],
            ["day", "tag", "cnt"],
        )
        out = top_k_per_group(
            df, ["day"], [F.col("cnt").desc(), F.col("tag").asc()], k=1
        ).collect()
        got = {r["day"]: r["tag"] for r in out}
        assert got == {"d1": "a", "d2": "z"}  # tie on cnt=5 -> lexicographic


class TestRollup:
    def test_buckets_and_windows(self, spark):
        df = spark.createDataFrame(
            [
                ("2024-01-01 10:00:30",),
                ("2024-01-01 10:00:45",),
                ("2024-01-01 10:02:10",),
                ("2024-01-02 00:00:00",),
            ],
            ["ts"],
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        days = {str(r["day"]): r["cnt"] for r in time_bucket_counts(df, "ts", "day", bucket_name="day").collect()}
        assert days == {"2024-01-01": 3, "2024-01-02": 1}
        wins = tumbling_window_counts(df, "ts", "1 minute").collect()
        by_start = {str(r["window_start"]): r["cnt"] for r in wins}
        assert by_start["2024-01-01 10:00:00"] == 2
        assert by_start["2024-01-01 10:02:00"] == 1


class TestSimilarity:
    def test_brute_force_matches_numpy(self, spark, sf_dir):
        import numpy as np

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 3)
        got = brute_force_top_k(queries, emb, "vec_id", "vec_id", k=3).collect()

        rows = emb.collect()
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        ids = np.array([r["vec_id"] for r in rows])
        mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        for qid in range(3):
            qi = np.where(ids == qid)[0][0]
            sims = mat_n @ mat_n[qi]
            sims[qi] = -2  # exclude self
            order = np.lexsort((ids, -np.round(sims, 6)))
            expect = [int(ids[i]) for i in order[:3]]
            mine = [
                r["neighbor_id"]
                for r in sorted(
                    (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
                )
            ]
            assert mine == expect, f"query {qid}: {mine} != {expect}"

    def test_lsh_recall(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 20)
        exact = brute_force_top_k(queries, emb, "vec_id", "vec_id", k=5).collect()
        approx = lsh_bucketed_top_k(
            queries, emb, "vec_id", "vec_id", k=5, n_planes=4, n_tables=12
        ).collect()
        exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
        approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
        recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
        assert recall >= 0.5, f"LSH recall {recall:.2f} below floor"


class TestSkew:
    def test_salted_agg_equals_plain(self, spark, sf_dir):
        from projet_5spar_sparkstreaming_spark.operators.skew import salted_agg
        from projet_5spar_sparkstreaming_spark.sources.files import read_parquet_table

        ev = read_parquet_table(spark, sf_dir, "events")
        plain = {
            (r["user_id"],): (r["cnt"], round(r["sum_value"], 6))
            for r in ev.groupBy("user_id")
            .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 6).alias("sum_value"))
            .collect()
        }
        salted = {
            (r["user_id"],): (r["cnt"], round(r["sum_value"], 6))
            for r in salted_agg(ev, ["user_id"], n_salts=8, sums=["value"]).collect()
        }
        assert plain == salted


class TestDedupClusters:
    def test_connected_components(self, spark):
        from projet_5spar_sparkstreaming_spark.operators.dedup import dedup_clusters

        # components: {1,2,3} (chain), {7,9}
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 9)], ["id_a", "id_b"]
        )
        got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    def test_path_graph_worst_case_converges_with_bounded_plan(self, spark):
        """50-node chain: worst-case diameter for label propagation.
        Pointer jumping must converge well inside the default iteration
        budget (O(log D) rounds, not D), and the periodic eager
        localCheckpoint must keep the final plan depth bounded instead
        of growing with iteration count."""
        from projet_5spar_sparkstreaming_spark.operators.dedup import dedup_clusters

        n = 50
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
        )
        labels = dedup_clusters(pairs, max_iterations=20)
        got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
        assert got == {i: 0 for i in range(n)}
        # lineage stays truncated: a 20-iteration plan without
        # checkpointing explodes to tens of thousands of characters
        plan = labels._jdf.queryExecution().optimizedPlan().toString()
        assert len(plan) < 5000, f"plan depth not bounded ({len(plan)} chars)"


def test_minhash_bucket_cap_drops_mega_group_only(spark):
    """max_bucket_size: a 30-doc identical mega-group (every pair is a
    candidate -> 435 pairs) is dropped by the cap, while an ordinary
    2-doc near-dup pair in the same corpus survives. The documented
    recipe: exact/fingerprint dedup collapses the mega-group BEFORE
    minhash; the cap is the safety valve when it wasn't run."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )

    mega = "the same boilerplate text repeated across many documents here"
    pair_a = "completely different organic document about spark shuffles and joins"
    pair_b = pair_a + " extra"
    rows = [(i, mega) for i in range(30)]
    rows += [(100, pair_a), (101, pair_b), (102, "unrelated third thing entirely")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = minhash_near_dup_pairs(
        df, "doc_id", "text", n=2, threshold=0.5
    )
    capped = minhash_near_dup_pairs(
        df, "doc_id", "text", n=2, threshold=0.5, max_bucket_size=10
    )
    un = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cp = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in un and (100, 101) in cp  # organic pair survives
    assert sum(1 for a, b in un if a < 30 and b < 30) == 435  # 30*29/2
    assert not any(a < 30 and b < 30 for a, b in cp)  # mega-group dropped


def test_minhash_bucket_cap_prefilters_100k_bucket(spark):
    """A 120k-id mega-bucket (uncapped it would expand ~7.2e9 pairs)
    is dropped BEFORE collect_list materializes it: the cap pre-counts
    on the narrow (band, bucket) id stream, so the oversized bucket
    never reaches any task's aggregation buffer. Runs in normal task
    memory; an ordinary identical-sig 2-doc pair in the same corpus
    survives, and the whole plan stays sort-free (!SortMergeJoin)."""
    from tools.explain_audit import formatted_plan

    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )

    mega = spark.range(120_000).select(
        F.col("id").alias("__id"),
        F.expr("transform(sequence(1, 64), x -> cast(x as bigint))").alias("__sig"),
    )
    organic = spark.range(200_000, 200_002).select(
        F.col("id").alias("__id"),
        F.expr("transform(sequence(1, 64), x -> cast(x * 7 + 1 as bigint))").alias(
            "__sig"
        ),
    )
    sig = mega.unionAll(organic)
    capped = minhash_near_dup_pairs(
        spark.range(0),  # ignored: precomputed_sig path
        "id",
        "text",
        threshold=0.5,
        max_bucket_size=10,
        precomputed_sig=sig,
    )
    assert "SortMergeJoin" not in formatted_plan(capped)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(200_000, 200_001)}


def test_minhash_duplicate_input_id_no_self_pair(spark):
    """A duplicated input id (the same id appearing twice) must not
    produce an (id, id) self-pair: the sorted member list contains the
    id twice and the strictly-after slice would otherwise emit it (and
    it verifies at jaccard 1.0)."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )

    text = "some document text that is entirely about itself and nothing else"
    df = spark.createDataFrame(
        [(1, text), (1, text), (2, "unrelated other content here")],
        ["doc_id", "text"],
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(
            df, "doc_id", "text", n=2, threshold=0.5
        ).collect()
    }
    assert (1, 1) not in got


def test_jaccard_threshold_monotone(spark, sf_dir):
    """Invariant: raising the threshold can only REMOVE pairs — the
    prefix length shrinks with t, so a bug in the prefix-bound
    arithmetic (the classic off-by-one this operator once guarded with
    an epsilon) shows up as a violation here."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import ngram_jaccard_pairs
    from projet_5spar_sparkstreaming_spark.sources.files import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents")
    def pairs(t):
        return {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=t).collect()
        }

    p6, p8, p9 = pairs(0.6), pairs(0.8), pairs(0.9)
    assert p9 <= p8 <= p6
    assert p6, "corpus must contain pairs at the loosest threshold"


def test_ngram_jaccard_join_cross_set_only(spark):
    """Incremental dedup: cross-set pairs emitted, within-set duplicate
    pairs NOT (that's the whole point — the index side is never
    self-joined)."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import ngram_jaccard_join

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " extra"
    new_batch = spark.createDataFrame(
        [(1, base), (2, base + " word"), (3, "totally different text here now")],
        ["doc_id", "text"],
    )  # docs 1 and 2 are near-dups of EACH OTHER (within-set: ignored)
    index = spark.createDataFrame(
        [(10, near), (11, "unrelated content entirely separate words")],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_join(
            new_batch, index, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert (1, 10) in pairs and (2, 10) in pairs
    assert all(a in (1, 2, 3) and b in (10, 11) for a, b in pairs), pairs


def test_cross_set_join_keeps_equal_ids(spark):
    """The two sides are DIFFERENT corpora, so an equal id is a
    legitimate match (a re-crawled doc keeping its id must still be
    flagged against the index) — an id_a != id_b filter here would
    silently drop real near-dups."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        minhash_incremental_pairs,
        ngram_jaccard_join,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    new_batch = spark.createDataFrame([(17, text)], ["doc_id", "text"])
    index = spark.createDataFrame(
        [(17, text + " tail"), (18, "entirely different other words here")],
        ["doc_id", "text"],
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_join(
            new_batch, index, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert (17, 17) in exact
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_incremental_pairs(
            new_batch, index, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert (17, 17) in mh


def test_ngram_jaccard_join_matches_self_join_cross_pairs(spark, sf_dir):
    """Cross-set join == the oracled self-join restricted to cross-set
    pairs (up to pair orientation): the incremental operator must find
    exactly the same near-dups, just without paying within-set work."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        ngram_jaccard_join,
        ngram_jaccard_pairs,
    )
    from projet_5spar_sparkstreaming_spark.sources.files import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents")
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    even = docs.filter(F.col("doc_id") % 2 == 0)
    cross = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]), r["jaccard"])
        for r in ngram_jaccard_join(odd, even, "doc_id", "text").collect()
    }
    all_pairs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text").collect()
        if (r["id_a"] % 2) != (r["id_b"] % 2)
    }
    assert cross == all_pairs


def test_ngram_overlap_join_decontamination(spark):
    """Decontamination stats: a verbatim 5-gram lifted from a training
    doc is detected; clean eval docs report zero with flagged=False and
    still appear in the output (left-join semantics)."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import ngram_overlap_join

    train = spark.createDataFrame(
        [
            (100, "one two three four five six seven eight nine ten"),
            (101, "totally separate training material goes right here"),
        ],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame(
        [
            # contains the 5-gram "three four five six seven" from 100
            (1, "zz yy three four five six seven xx ww vv"),
            (2, "no overlap with training corpus at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in ngram_overlap_join(evals, train, "doc_id", "text", n=5).collect()
    }
    assert set(rows) == {1, 2}
    # doc 1: 10 tokens -> 6 distinct 5-grams; exactly 1 collides
    assert rows[1]["n_shingles"] == 6
    assert rows[1]["n_contaminated"] == 1
    assert rows[1]["flagged"] is True
    assert abs(rows[1]["contamination_rate"] - 1 / 6) < 1e-6
    assert rows[2]["n_contaminated"] == 0
    assert rows[2]["flagged"] is False
    assert rows[2]["contamination_rate"] == 0.0


def test_binary_padded_words_matches_astype_layout():
    """The buffer-gather word matrix must be BYTE-IDENTICAL to the
    numpy astype('S{W}') conversion it replaced (truncate at W,
    zero-pad, little-endian word view) — the minhash signature family
    is persisted in stored indexes, so any drift here silently breaks
    every index built before the change. Covers empty tokens, exact
    word boundaries, >W tokens, non-ASCII bytes, and sliced arrays."""
    import numpy as np
    import pyarrow as pa

    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        _binary_padded_words,
    )

    toks = [
        b"", b"a", b"abcdefgh", b"abcdefghi", b"x" * 23, b"y" * 24,
        b"z" * 100, "é".encode() * 5, b"\x00mid\x00nul\x00",
    ]
    flat = pa.array(toks, type=pa.binary())
    for width in (8, 24, 104):
        w_new, lens = _binary_padded_words(flat, width)
        w_old = np.frombuffer(
            flat.to_numpy(zero_copy_only=False).astype(f"S{width}").tobytes(),
            dtype=np.uint64,
        ).reshape(-1, width // 8)
        assert np.array_equal(w_new, w_old), width
        assert np.array_equal(lens, np.array([len(t) for t in toks]))
    # sliced arrays resolve their offset into the shared buffers
    sl = flat.slice(2, 4)
    w_sl, _ = _binary_padded_words(sl, 24)
    w_full, _ = _binary_padded_words(flat, 24)
    assert np.array_equal(w_sl, w_full[2:6])
    # empty array
    w0, l0 = _binary_padded_words(flat.slice(0, 0), 24)
    assert w0.shape == (0, 3) and len(l0) == 0


def test_kernel_results_invariant_under_batch_slicing(spark, monkeypatch):
    """The payload-bounded batch slicing must not change any kernel's
    output: signatures, simhashes and shingle rows computed with a
    pathologically small slice budget (forcing many slices per batch)
    must equal the unsliced results. Guards the slice/offset handling
    in the Arrow kernels (a sliced ListArray's flatten/offsets are the
    classic way to silently hash the wrong tokens)."""
    import projet_5spar_sparkstreaming_spark.operators.dedup as dedup

    rows = [
        (i, " ".join(f"tok{i}_{j}" for j in range(5 + (i % 37))))
        for i in range(300)
    ]
    rows.append((999, "a" * 500))  # one token bigger than the budget
    df = _docs_df_ops(spark, rows)

    def run_all():
        sig = {
            r["__id"]: tuple(r["__sig"])
            for r in dedup.minhash_signature_arrow(
                df, "doc_id", "text"
            ).collect()
        }
        sh = {
            r["__id"]: r["__sh"]
            for r in dedup.simhash64_arrow(df, "doc_id", "text").collect()
        }
        shingles = {
            (r["__id"], r["__s"])
            for r in dedup.shingle_hash_rows(df, "doc_id", "text", 3).collect()
        }
        return sig, sh, shingles

    base = run_all()
    real = dedup._bounded_batch_slices

    def tiny(batch, col_name, max_value_bytes=200):
        yield from real(batch, col_name, max_value_bytes=200)

    monkeypatch.setattr(dedup, "_bounded_batch_slices", tiny)
    assert run_all() == base


def _docs_df_ops(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_similarity_kernels_invariant_under_chunking(spark, monkeypatch):
    """The embedding kernels' payload-bounded chunking (row chunks in
    the pandas kernels, batch slices in the Arrow verify kernel) must
    not change any result: bucketize/assign/verify with a tiny budget
    must equal the unchunked outputs."""
    import numpy as np

    import projet_5spar_sparkstreaming_spark.operators.dedup as dedup
    import projet_5spar_sparkstreaming_spark.operators.similarity as sim

    rng = np.random.default_rng(3)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )

    def run_all():
        pairs = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in sim.cosine_near_dup_pairs(
                vecs, "vec_id", "embedding", threshold=0.3,
                n_planes=4, n_tables=4, dim=16,
            ).collect()
        }
        knn = {
            (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
            for r in sim.ivf_top_k(
                vecs.filter("vec_id < 10"), vecs, "vec_id", "vec_id",
                k=3, n_centroids=4, n_probe=4,
            ).collect()
        }
        return pairs, knn

    base = run_all()
    real_chunks = sim._pandas_row_chunks
    real_slices = dedup._bounded_batch_slices
    monkeypatch.setattr(
        sim, "_pandas_row_chunks",
        lambda pdf, c, extra_cols=0, max_bytes=0: real_chunks(
            pdf, c, extra_cols, max_bytes=512
        ),
    )
    monkeypatch.setattr(
        dedup, "_bounded_batch_slices",
        lambda b, c, max_value_bytes=0: real_slices(b, c, max_value_bytes=512),
    )
    assert run_all() == base


def test_token_gram_hashes_batch_independent():
    """The per-token hash must not depend on the batch's max token
    length: zero-pad word rounds past a token's own length are masked
    out, so the same token sequence produces identical gram hashes
    whether it shares a batch with a 3-byte token or a 60-byte one
    (regression: the unmasked Horner loop multiplied by C3 once per
    pad word, silently losing decontamination matches whenever the
    eval and train sides' batches had different max token lengths)."""
    import numpy as np
    import pyarrow as pa

    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        _token_gram_hashes,
    )

    doc = ["one", "two", "three", "four", "five", "six"]
    alone = pa.array([doc], type=pa.list_(pa.string()))
    with_long = pa.array(
        [doc, ["a" * 60, "short"]], type=pa.list_(pa.string())
    )
    g_alone, l_alone, _ = _token_gram_hashes(alone, 5)
    g_mixed, l_mixed, _ = _token_gram_hashes(with_long, 5)
    assert l_alone[0] == l_mixed[0] == 2
    assert np.array_equal(g_alone[:2], g_mixed[:2])
    # and the long token itself hashes consistently across batches
    solo_long = pa.array([["a" * 60, "short"]], type=pa.list_(pa.string()))
    g_long, _, _ = _token_gram_hashes(solo_long, 5)
    assert np.array_equal(g_long, g_mixed[2:])


def test_ngram_overlap_join_long_token_batch_skew(spark):
    """A verbatim 5-gram is still detected when the TRAIN side's batch
    contains an unrelated very long token (URL-ish) that the eval side
    doesn't: before the length-masked hash, the two sides' word counts
    (nw) differed and the equality join silently missed the match."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import ngram_overlap_join

    train = spark.createDataFrame(
        [
            (100, "one two three four five six seven eight nine ten"),
            (101, "see https://example.com/averyveryverylongpathsegmentindeed0123456789 ok"),
        ],
        ["doc_id", "text"],
    ).coalesce(1)
    evals = spark.createDataFrame(
        [(1, "zz yy three four five six seven xx ww vv")],
        ["doc_id", "text"],
    ).coalesce(1)
    rows = {
        r["doc_id"]: r
        for r in ngram_overlap_join(evals, train, "doc_id", "text", n=5).collect()
    }
    assert rows[1]["n_contaminated"] == 1
    assert rows[1]["flagged"] is True


def test_cosine_near_dup_pairs_recall_vs_exact(spark):
    """LSH-bucketed cosine pairs: recall floor against the exact
    all-pairs join on a clustered corpus (the structure embedding
    spaces actually have), and NO false positives (exact verification
    means every emitted pair truly clears the threshold)."""
    import numpy as np

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    rng = np.random.RandomState(5)
    centers = rng.randn(20, 64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        v = centers[i % 20] + (0.25 / 8.0) * rng.randn(64)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(
            df, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    # exact reference: brute-force all pairs in numpy
    mat = np.array([r[1] for r in rows])
    sims = np.round(mat @ mat.T, 6)
    exact = {
        (i, j)
        for i in range(400)
        for j in range(i + 1, 400)
        if sims[i, j] >= 0.9
    }
    assert exact, "fixture must contain true near-dup pairs"
    assert got <= exact  # exact verify: no false positives
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f} on {len(exact)} true pairs"


def test_cosine_near_dup_bucket_cap(spark):
    """max_bucket_size for sign-LSH (same guard as minhash banding): a
    40-member identical-vector mega-group (every pair collides in every
    table -> 780 candidate pairs) is dropped by the cap, while an
    ordinary near-identical 2-vector pair in the same corpus survives."""
    import numpy as np

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    rng = np.random.RandomState(11)
    mega = rng.randn(64)
    mega /= np.linalg.norm(mega)
    a = rng.randn(64)
    a /= np.linalg.norm(a)
    b = a + 0.01 * rng.randn(64)
    b /= np.linalg.norm(b)
    rows = [(i, [float(x) for x in mega]) for i in range(40)]
    rows += [(100, [float(x) for x in a]), (101, [float(x) for x in b])]
    for i in range(10):  # background noise vectors
        v = rng.randn(64)
        v /= np.linalg.norm(v)
        rows.append((200 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    un = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(
            df, "vec_id", "embedding", threshold=0.99
        ).collect()
    }
    cp = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(
            df, "vec_id", "embedding", threshold=0.99, max_bucket_size=20
        ).collect()
    }
    assert (100, 101) in un and (100, 101) in cp  # organic pair survives
    assert sum(1 for x, y in un if x < 40 and y < 40) == 780  # 40*39/2
    assert not any(x < 40 and y < 40 for x, y in cp)  # mega-group dropped


def test_fingerprint_dedup_keeps_min_id(spark):
    from projet_5spar_sparkstreaming_spark.operators.dedup import fingerprint_dedup

    df = spark.createDataFrame(
        [(5, "Same Text!"), (2, "same   text"), (9, "other")], ["id", "t"]
    )
    kept = sorted(r["id"] for r in fingerprint_dedup(df, "t", keep_by="id").collect())
    assert kept == [2, 9]  # min id is the canonical representative


def test_snapshot_diff_classification_and_nulls(spark):
    from projet_5spar_sparkstreaming_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.0), (4, 7.0)], ["id", "v"]
    )
    new = spark.createDataFrame(
        [(2, None), (3, 6.0), (4, 7.0), (5, 1.0)], ["id", "v"]
    )
    got = {
        r["id"]: r["change_type"]
        for r in snapshot_diff(old, new, "id", ["v"]).collect()
    }
    # id=1 removed, id=2 unchanged (null==null, filtered), id=3 changed,
    # id=4 unchanged (filtered), id=5 added
    assert got == {1: "removed", 3: "changed", 5: "added"}
    kept = snapshot_diff(old, new, "id", ["v"], keep_unchanged=True)
    assert kept.count() == 5


def test_auto_lsh_params_scale_properties():
    """The 100 TB contract of auto_lsh_params: planes grow ~log2(n) so
    EXPECTED random-pair candidates stay linear in the corpus, tables
    stay bounded while meeting the recall target at recall_at."""
    import math

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_lsh_params,
    )

    prev_p = 0
    for n in (2_000, 5_000, 50_000, 500_000, 5_000_000, 50_000_000):
        p, t = auto_lsh_params(n, dim=64, recall_at=0.99)
        assert 4 <= p <= 48 and 4 <= t <= 16
        assert p >= prev_p, "planes must be nondecreasing in corpus size"
        prev_p = p
        # closed-form expected random candidates (the formula the planes
        # are derived from): C(n,2) * T * 2^-p * Jensen boost
        boost = math.exp(2 * p * p / (math.pi**2 * 64))
        cand_per_row = (n - 1) / 2 * t * 2.0**-p * boost
        assert cand_per_row <= 0.25, (n, p, t, cand_per_row)
        # recall model at recall_at: 1 - (1 - p_keep^p)^t >= target
        p_keep = 1 - math.acos(0.99) / math.pi
        recall = 1 - (1 - p_keep**p) ** t
        assert recall >= 0.95, (n, p, t, recall)


def test_auto_lsh_params_low_similarity_pins_planes():
    """At a low similarity target sign bits barely separate matches
    from background: the recall constraint must win and pin planes near
    the floor with more tables, at ANY corpus size."""
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_lsh_params,
    )

    small = auto_lsh_params(2_000, recall_at=0.5, target_recall=0.9)
    large = auto_lsh_params(500_000, recall_at=0.5, target_recall=0.9)
    assert small == large  # recall-capped: corpus size cannot move it
    assert small[0] <= 6 and small[1] >= 8


def test_auto_ivf_centroids_sqrt_scaling():
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_ivf_centroids,
    )

    assert auto_ivf_centroids(2_000) == 16  # floor: pinned test corpus
    assert auto_ivf_centroids(500_000) == 177
    assert auto_ivf_centroids(10**12) == 4096  # cap


def test_cosine_near_dup_auto_matches_explicit(spark):
    """n_planes="auto" must produce exactly the result of passing the
    resolved (planes, tables) explicitly — auto is parameter
    derivation, not a different algorithm."""
    import numpy as np

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        auto_lsh_params,
        cosine_near_dup_pairs,
    )

    rng = np.random.RandomState(7)
    rows = []
    for i in range(300):
        if i % 10 == 1:
            v = np.array(rows[-1][1]) + 0.01 * rng.randn(64)
        else:
            v = rng.randn(64)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    auto = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in cosine_near_dup_pairs(
            df, "vec_id", "embedding", threshold=0.95,
            n_planes="auto", n_tables="auto",
        ).collect()
    }
    p, t = auto_lsh_params(300, dim=64, recall_at=0.99)
    explicit = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in cosine_near_dup_pairs(
            df, "vec_id", "embedding", threshold=0.95,
            n_planes=p, n_tables=t,
        ).collect()
    }
    assert auto == explicit
    planted = {(i - 1, i) for i in range(1, 300) if i % 10 == 1}
    got_pairs = {(a, b) for a, b, _ in auto}
    assert len(got_pairs & planted) / len(planted) >= 0.95


def test_bounded_broadcast_side_guard(spark):
    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        bounded_broadcast_side,
    )

    df = spark.range(50)
    assert bounded_broadcast_side(df, 100, "x").count() == 50
    import pytest as _pytest

    with _pytest.raises(ValueError, match="more than 10 rows"):
        bounded_broadcast_side(df, 10, "x").count()


def test_cosine_incremental_pairs_cross_set(spark):
    """Incremental embedding dedup: planted twins of index vectors in
    the new batch are found (recall floor), emitted pairs are exact-
    verified (no false positives), equal ids across sides are
    legitimate matches, and the index is never self-paired."""
    import numpy as np

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        cosine_incremental_pairs,
    )

    rng = np.random.RandomState(3)
    idx_vecs = rng.randn(300, 64)
    idx_vecs /= np.linalg.norm(idx_vecs, axis=1, keepdims=True)
    index = spark.createDataFrame(
        [(i, [float(x) for x in idx_vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    # new batch: 30 perturbed copies of index vectors (planted, incl.
    # one that REUSES an index id) + 20 fresh vectors
    new_rows = []
    for j in range(30):
        src = j * 7 % 300
        v = idx_vecs[src] + 0.01 * rng.randn(64)
        v /= np.linalg.norm(v)
        nid = src if j == 0 else 1000 + j  # j==0 reuses the index id
        new_rows.append((nid, src, [float(x) for x in v]))
    fresh = rng.randn(20, 64)
    fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
    for j in range(20):
        new_rows.append((2000 + j, None, [float(x) for x in fresh[j]]))
    new = spark.createDataFrame(
        [(i, v) for i, _, v in new_rows], "vec_id long, embedding array<double>"
    )

    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_incremental_pairs(
            new, index, "vec_id", "embedding", threshold=0.95
        ).collect()
    }
    planted = {(i, s) for i, s, _ in new_rows if s is not None}
    found = planted & set(got)
    assert len(found) / len(planted) >= 0.93, (len(found), len(planted))
    assert (0, 0) in got, "equal id across sides is a legitimate match"
    # exact verification: every emitted cosine truly clears threshold
    mat_idx = {i: idx_vecs[i] for i in range(300)}
    mat_new = {i: np.array(v) for i, _, v in new_rows}
    for (a, b), c in got.items():
        true_cos = float(mat_new[a] @ mat_idx[b])
        assert true_cos >= 0.95 and abs(true_cos - c) < 1e-5


def test_ivf_index_build_query_matches_inline(spark, sf_dir, tmp_path):
    """Stored IVF index: build writes cell-partitioned parquet + the
    quantizer; query probes via a partition filter (files of unprobed
    cells never read — plan-asserted) and, with the same deterministic
    build parameters, returns EXACTLY ivf_top_k's result."""
    import glob
    import os

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        build_ivf_index,
        ivf_top_k,
        query_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)

    idx = str(tmp_path / "ivf_index")
    n_cells = build_ivf_index(emb, idx, "vec_id", "embedding", n_centroids=16)
    assert n_cells == 16
    # cell partitions under the version-0 data subtree (compactions
    # publish data_v{N} siblings and flip the meta's version pointer)
    assert glob.glob(os.path.join(idx, "data", "cell=*")), "cell partitions on disk"

    via_index = query_ivf_index(
        spark, queries, idx, "vec_id", "embedding", k=5, n_probe=4,
        route="ivf",  # this test pins the PROBE path's plan + parity
    )
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    # static pruning: the probed-cell INSET reaches the partition
    # filter, so unprobed cells' files are skipped at listing time
    i = plan.find("PartitionFilters: [")
    assert i != -1 and "INSET" in plan[i : plan.find("]", i)]

    inline = ivf_top_k(
        queries, emb, "vec_id", "vec_id", k=5, n_centroids=16, n_probe=4
    )
    a = {(r["query_id"], r["neighbor_id"], r["cosine"], r["rank"]) for r in via_index.collect()}
    b = {(r["query_id"], r["neighbor_id"], r["cosine"], r["rank"]) for r in inline.collect()}
    assert a == b and a


def test_minhash_index_build_query_matches_incremental(spark, tmp_path):
    """Stored minhash index: query-against-index returns EXACTLY what
    minhash_incremental_pairs computes from raw text (same signatures,
    same banding), and a parameter mismatch fails loudly."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        build_minhash_index,
        minhash_incremental_pairs,
        minhash_query_index,
    )

    def _doc(i, seed, mutate=0):
        toks = [f"tok{seed}_{j}" for j in range(30)]
        for m in range(mutate):
            toks[m] = f"mut{i}_{m}"
        return (i, " ".join(toks))

    index_docs = spark.createDataFrame(
        [_doc(i, f"s{i}") for i in range(50)], "doc_id long, text string"
    )
    new_docs = spark.createDataFrame(
        [_doc(100 + i, f"s{i}", mutate=1) for i in range(10)]
        + [_doc(200 + i, f"fresh{i}") for i in range(5)],
        "doc_id long, text string",
    )

    idx = str(tmp_path / "mh_index")
    build_minhash_index(index_docs, idx, "doc_id", "text")

    via_index = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in minhash_query_index(
            new_docs, idx, "doc_id", "text", threshold=0.5
        ).collect()
    }
    inline = {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 6))
        for r in minhash_incremental_pairs(
            new_docs, index_docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert via_index == inline and len(via_index) >= 10


def test_ngram_jaccard_candidate_budget(spark):
    """r9 verdict task 1: the exact prefix join must trip a candidate
    budget on twin-structured corpora instead of burning an unbounded
    quadratic scan — and the budget must not change results when the
    corpus is within it."""
    import pytest

    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    # 40 docs that all share one rare 30-token core (every prefix
    # shingle's posting list is ~40 long -> bound ~ C(40,2) per shingle)
    core = " ".join(f"tok{j}" for j in range(30))
    rows = [(i, core + f" filler{i} pad{i} extra{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "id long, text string")
    with pytest.raises(RuntimeError, match="candidate budget exceeded"):
        ngram_jaccard_pairs(docs, "id", "text", max_candidate_pairs=100)
    # within budget (default) and disabled (None) agree exactly
    dflt = {
        tuple(r)
        for r in ngram_jaccard_pairs(docs, "id", "text", threshold=0.8).collect()
    }
    off = {
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, "id", "text", threshold=0.8, max_candidate_pairs=None
        ).collect()
    }
    assert dflt == off and len(dflt) > 0


def _fence_corpus(spark, n):
    """n synthetic rows whose vector column is never computed — the
    analytic fence raises (or passes) before any bucketize executes,
    so only the COUNT ever runs."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (i * F.col("id") % 97).cast("double"),
        ).alias("embedding"),
    )


def test_embed_candidate_fence_trips_below_background_threshold(spark):
    """r14 (forced by the sf10 decade sweep): at a threshold below the
    corpus's background cosine the recall constraint pins planes to
    the floor and the sign-LSH bucket join goes quadratic — at sf10 it
    exhausted the spill disk mid-sort (BENCH_SF10_r14.json). The
    analytic fence must raise the designed error instead, from pure
    arithmetic (no join executes)."""
    import pytest

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        cosine_incremental_pairs,
        cosine_near_dup_pairs,
    )

    # self-join shape: planes floor (recall_at 0.5) at 40k rows ->
    # ~0.69 * 40k^2/2 = 5.5e8 estimated candidates > 3e8 auto budget
    corpus = _fence_corpus(spark, 40_000)
    with pytest.raises(RuntimeError, match="candidate budget exceeded"):
        cosine_near_dup_pairs(
            corpus, "vec_id", "embedding", threshold=0.3,
            n_planes="auto", n_tables="auto",
            recall_at=0.5, target_recall=0.9,
        )
    # cross-corpus shape: the exact case that died at sf10 (new batch
    # x big index at threshold 0.3) in miniature proportions
    new = _fence_corpus(spark, 5_000)
    index = _fence_corpus(spark, 300_000)
    with pytest.raises(RuntimeError, match="candidate budget exceeded"):
        cosine_incremental_pairs(
            new, index, "vec_id", "embedding", threshold=0.3,
            recall_at=0.5, target_recall=0.9,
        )


def test_embed_candidate_fence_passes_dedup_grade_and_opt_outs(spark):
    """The fence must NOT fire where the engine's linearity is
    measured: dedup-grade thresholds (planes scale ~log2 n, estimate
    ~cand_per_row * n), explicit plane counts with the default "auto"
    budget (no free count to estimate from), and an explicit None."""
    import pytest

    from projet_5spar_sparkstreaming_spark.operators.similarity import (
        cosine_incremental_pairs,
        cosine_near_dup_pairs,
    )

    corpus = _fence_corpus(spark, 40_000)
    # dedup threshold, auto params: estimate collapses to ~0
    assert cosine_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.95,
        n_planes="auto", n_tables="auto",
    ) is not None
    # explicit params + "auto" budget: fence skips (count-free path)
    assert cosine_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.3,
        n_planes=4, n_tables=11,
    ) is not None
    # None disables even in the tripping configuration
    assert cosine_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.3,
        n_planes="auto", n_tables="auto",
        recall_at=0.5, target_recall=0.9, max_candidate_pairs=None,
    ) is not None
    # a NUMERIC budget with explicit params buys the count and fences
    with pytest.raises(RuntimeError, match="candidate budget exceeded"):
        cosine_near_dup_pairs(
            corpus, "vec_id", "embedding", threshold=0.3,
            n_planes=4, n_tables=11, max_candidate_pairs=1_000_000,
        )
    # incremental pass case: dedup threshold over the same big index
    new = _fence_corpus(spark, 5_000)
    index = _fence_corpus(spark, 300_000)
    assert cosine_incremental_pairs(
        new, index, "vec_id", "embedding", threshold=0.95,
    ) is not None
