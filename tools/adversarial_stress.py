"""Adversarial near-dup structure stress (SCALE.md's worst-case table).

Every base document has ``TWINS-1`` SUB-threshold twins: the twin
contains ALL of the base's shingles plus ~64% unique filler, putting
pairwise Jaccard at ~0.61 — below the 0.8 admission threshold but
sharing every rare prefix shingle. This is the pathological regime for
exact prefix joins (posting lists grow with the twin count; candidate
join output grows with its SQUARE) and the regime the LSH paths must
survive sub-linearly.

At threshold 0.8 every method's TRUE answer is ZERO pairs (twin-twin
J≈0.43, base-twin J≈0.61): the measurement isolates pure candidate /
verification overhead that the filters cannot avoid — the worst case,
with no useful work to amortize it.

Usage:

    python tools/adversarial_stress.py [5000 100000]

Prints one JSON line per (corpus size, method) and a summary table;
deterministic (per-id seeds). Methods run COLD (clearCache between) —
this harness exists to measure the unhappy path, not steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/adversarial_stress"
BASE_TOKENS = 118
FILLER_TOKENS = 77  # J = 118/(118+77) ~ 0.605 between any two twins
TWINS = 20
VOCAB = 50_000


def gen_adversarial(spark, n: int, path: str) -> None:
    """n docs = n/TWINS bases x TWINS variants. Variant 0 is the base
    itself; variants 1..TWINS-1 append per-variant unique filler, so
    every variant CONTAINS the base's shingles (maximal prefix-join
    stress) while staying below the 0.8 Jaccard threshold."""
    import numpy as np
    import pandas as pd

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                base_id, variant = divmod(int(i), TWINS)
                rng = np.random.RandomState(2_000_003 + base_id)
                toks = list(rng.randint(0, VOCAB, BASE_TOKENS))
                if variant:
                    rng_v = np.random.RandomState(
                        3_000_017 + base_id * TWINS + variant
                    )
                    # filler from a TINY disjoint vocabulary (24 words):
                    # filler trigrams are corpus-COMMON (high document
                    # frequency), so the rarest-first PPJoin prefixes
                    # are exactly the shared base shingles — every
                    # twin-twin pair becomes a candidate the verifier
                    # must reject; random filler overlap between twins
                    # stays ~0.4 trigrams, keeping them sub-threshold
                    toks += list(VOCAB + rng_v.randint(0, 24, FILLER_TOKENS))
                texts.append(" ".join(f"w{t}" for t in toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    (
        spark.range(n)
        .repartition(32)
        .mapInPandas(_gen, "doc_id long, text string")
        .write.mode("overwrite")
        .parquet(path)
    )


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [5_000, 100_000]

    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("adversarial_stress")
    os.makedirs(WORK, exist_ok=True)
    results = []
    for n in sizes:
        path = f"{WORK}/docs_{n}"
        gen_adversarial(spark, n, path)
        docs = spark.read.parquet(path)
        methods = {
            "ngram_exact_t0.8": lambda d=docs: ngram_jaccard_pairs(
                d, "doc_id", "text", n=3, threshold=0.8
            ),
            "minhash_t0.8": lambda d=docs: minhash_near_dup_pairs(
                d, "doc_id", "text", n=3, threshold=0.8
            ),
            "simhash_h8": lambda d=docs: simhash_near_dup_pairs(
                d, "doc_id", "text", max_hamming=8, n=3
            ),
        }
        for name, build in methods.items():
            spark.catalog.clearCache()  # COLD: the unhappy path
            t0 = time.time()
            try:
                rows = build().count()
                rec = {
                    "n": n,
                    "method": name,
                    "pairs": rows,
                    "sec": round(time.time() - t0, 2),
                }
            except RuntimeError as e:
                # the r10 candidate budget: on this corpus the exact
                # join is SUPPOSED to trip instead of burning the scan
                rec = {
                    "n": n,
                    "method": name,
                    "pairs": None,
                    "sec": round(time.time() - t0, 2),
                    "budget_tripped": str(e).split(".")[0],
                }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    with open(f"{WORK}/results.json", "w") as f:
        json.dump(results, f, indent=2)
    print("\n| method | " + " | ".join(str(n) for n in sizes) + " |")
    for name in ("ngram_exact_t0.8", "minhash_t0.8", "simhash_h8"):
        cells = [
            f"{r['pairs']}, {r['sec']}s"
            if r["pairs"] is not None
            else f"BUDGET TRIP, {r['sec']}s"
            for r in results
            if r["method"] == name
        ]
        print(f"| {name} | " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
