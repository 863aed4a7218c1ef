"""Deduplication operators: exact, latest-per-key, fingerprint,
n-gram Jaccard, MinHash-LSH, SimHash.

Reference parity: latest-per-key dedup (reference:
src/batch_clean_historical.py:34-37, row_number over id ordered by
created_at desc_nulls_last). The near-dup family is the north-star
extension set (BASELINE.json) for training-data pipelines.

Scale design (100 TB):
- exact/fingerprint: hash-shuffle on the dedup key only; map-side
  partial aggregation keeps the shuffle at one row per key per task.
- n-gram Jaccard is exact but O(sum of postings^2) in the worst case —
  it is the *verifier*; MinHash-LSH is the *candidate generator* whose
  shuffle is one row per (band, signature) — this is the 100 TB path.
- All hashing is deterministic (xxhash64 + fixed universal-hash
  parameters), so reruns and stream/batch agree.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from projet_5spar_sparkstreaming_spark.functions.textstats import tokens
from projet_5spar_sparkstreaming_spark.functions.textstats import doc_fingerprint

# Deterministic salt per hash function: h_i(x) = xxhash64(x XOR salt_i).
# XOR-salted re-hashing gives an independent-enough family without the
# modular multiplication that overflows int64 under ANSI mode.
_rng = random.Random(42)
_HASH_SALTS: list[int] = [_rng.getrandbits(63) for _ in range(256)]


def exact_dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal — hash-shuffle on ``subset``.

    For wide payloads prefer ``fingerprint_dedup`` (shuffles a 32-byte
    digest instead of the full row content).
    """
    return df.dropDuplicates(list(subset) if subset else None)


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Keep the newest row per key, nulls losing (reference W1 semantics:
    row_number over partitionBy(id) orderBy(created_at desc_nulls_last),
    src/batch_clean_historical.py:34-37). ``tie_break`` columns make the
    pick deterministic when order values collide.
    """
    order = [F.col(order_col).desc_nulls_last()] + [F.col(c).asc() for c in tie_break]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def fingerprint_dedup(
    df: DataFrame, text_col: str, keep_by: str | None = None
) -> DataFrame:
    """Near-exact dedup on the normalization fingerprint
    (case/punctuation/whitespace-insensitive). Keeps the row with the
    minimum ``keep_by`` value per fingerprint group (deterministic),
    or an arbitrary row when ``keep_by`` is None.
    """
    with_fp = df.withColumn("__fp", doc_fingerprint(text_col))
    if keep_by is None:
        return with_fp.dropDuplicates(["__fp"]).drop("__fp")
    return latest_per_key(with_fp, ["__fp"], keep_by, tie_break=()).drop("__fp")


# ---------------------------------------------------------------------------
# Shingling helpers (shared by Jaccard / MinHash / SimHash)
# ---------------------------------------------------------------------------


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string>."""
    toks = tokens(col)
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    # Short docs (< n tokens) produce one truncated shingle; keep it.
    return F.array_distinct(grams)


def _shingle_hashes(col: Column | str, n: int) -> Column:
    """Distinct shingle -> signed 64-bit xxhash."""
    return F.transform(word_shingles(col, n), lambda s: F.xxhash64(s))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: (id_a, id_b, jaccard).

    Inverted-index self-join: explode distinct shingles, equi-join on
    shingle, count common, |A|+|B|-common in the denominator. Exact but
    quadratic in posting-list length — the verifier for LSH candidates
    and the small/medium-scale direct path.
    """
    sh = df.select(
        F.col(id_col).alias("__id"), word_shingles(text_col, n).alias("__sh")
    )
    sizes = sh.select("__id", F.size("__sh").alias("__sz"))
    exploded = sh.select("__id", F.explode("__sh").alias("__s"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(b, (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count("*").alias("__common"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("__sza"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("__szb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("__common")
            / (F.col("__sza") + F.col("__szb") - F.col("__common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signature(col: Column | str, n: int = 3, num_hashes: int = 64) -> Column:
    """MinHash signature (array<bigint>, length num_hashes) of a text's
    n-gram shingle set: min over shingles of xxhash64(h XOR salt_i) per
    hash function i. XOR + re-hash never overflows (ANSI-safe)."""
    hashes = _shingle_hashes(col, n)

    def _min_hash(salt: int):
        # Factory closure (not default-arg lambda: that changes arity and
        # breaks PySpark's higher-order-function binding).
        return F.array_min(
            F.transform(hashes, lambda h: F.xxhash64(h.bitwiseXOR(F.lit(salt))))
        )

    return F.array(*[_min_hash(s) for s in _HASH_SALTS[:num_hashes]])


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    verify: bool = True,
) -> DataFrame:
    """MinHash + LSH banding near-dup detection — the 100 TB dedup path.

    shingle -> minhash signature -> split into ``bands`` bands of
    ``num_hashes//bands`` rows -> bucket-join on (band_id, band_hash) ->
    distinct candidate pairs -> (optionally) verify with exact estimated
    Jaccard from full signatures and filter by ``threshold``.

    Returns (id_a, id_b, est_jaccard). The only shuffles are the bucket
    equi-join (one row per doc per band) and the pair distinct — no
    quadratic blowup. Skewed buckets (boilerplate shingle sets) are AQE
    skew-join handled.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("__id"),
        minhash_signature(text_col, n, num_hashes).alias("__sig"),
    )
    banded = sig.select(
        "__id",
        "__sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("__sig", i * rows_per_band + j + 1).cast(
                                        "string"
                                    )
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("__b"),
    ).select("__id", "__sig", "__b.band", "__b.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sig").alias("__siga"),
            F.col("b.__sig").alias("__sigb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        return cand.select("id_a", "id_b")
    est = cand.withColumn(
        "est_jaccard",
        F.size(
            F.filter(
                F.zip_with("__siga", "__sigb", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / F.lit(float(num_hashes)),
    )
    return est.filter(F.col("est_jaccard") >= threshold).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def simhash64(col: Column | str, n: int = 1) -> Column:
    """64-bit SimHash of a text's token (or shingle) multiset.

    For each bit position: sum +1/-1 over token hashes' bit -> sign.
    Built from native bitwise expressions; no UDF.
    """
    hashes = F.transform(word_shingles(col, n), lambda s: F.xxhash64(s))

    def _bit_sum(i: int):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_sums = [_bit_sum(i) for i in range(64)]
    out = F.lit(0).cast("long")
    for i, s in enumerate(bit_sums):
        # bit 63 is the sign bit of int64: its place value is -2^63
        bit_value = (1 << i) if i < 63 else -(1 << 63)
        out = out + F.when(s > 0, F.lit(bit_value).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n: int = 1,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs with block-LSH candidate generation.

    Split the 64-bit simhash into ``blocks`` contiguous blocks; by
    pigeonhole, any pair within hamming distance < blocks shares at
    least one exact block. Equi-join per block, then verify true
    hamming distance with bit_count(xor) <= max_hamming.
    """
    bits_per_block = 64 // blocks
    mask = (1 << bits_per_block) - 1
    sh = df.select(F.col(id_col).alias("__id"), simhash64(text_col, n).alias("__sh"))
    banded = sh.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        F.shiftright("__sh", i * bits_per_block)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("__b"),
    ).select("__id", "__sh", "__b.block", "__b.key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
