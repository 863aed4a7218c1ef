from projet_5spar_sparkstreaming_spark.operators.dedup import (
    exact_dedup,
    fingerprint_dedup,
    latest_per_key,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from projet_5spar_sparkstreaming_spark.operators.topk import top_k_per_group
from projet_5spar_sparkstreaming_spark.operators.rollup import time_bucket_counts
from projet_5spar_sparkstreaming_spark.operators.similarity import (
    brute_force_top_k,
    brute_force_top_k_arrow,
    brute_force_top_k_expr,
    ivf_top_k,
    lsh_bucketed_top_k,
)
from projet_5spar_sparkstreaming_spark.operators.asof import as_of_join
from projet_5spar_sparkstreaming_spark.operators.skew import salted_agg
from projet_5spar_sparkstreaming_spark.operators.cdc import snapshot_diff

__all__ = [
    "as_of_join",
    "salted_agg",
    "snapshot_diff",
    "brute_force_top_k_arrow",
    "brute_force_top_k_expr",
    "ivf_top_k",
    "exact_dedup",
    "fingerprint_dedup",
    "latest_per_key",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dup_pairs",
    "top_k_per_group",
    "time_bucket_counts",
    "brute_force_top_k",
    "lsh_bucketed_top_k",
]
