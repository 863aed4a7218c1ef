"""sf1.0 decade sweep for the 49 headline queries (r12 verdict task 6).

The 2x-vs-baseline bar is graded at sf0.1; the 100x-scale argument
rested on plan audits plus operator-specific stress tiers. This tool
converts "the plans look right at 10x" into one measured decade point
for the WHOLE relational surface: a 10x blow-up of every sf0.1 table
into /tmp (~170 MB -> ~1.7 GB), then every headline query timed at
sf0.1 AND at the blow-up IN THE SAME PROCESS, so the per-query ratio
is host-drift-free by construction (plus the bench calibration anchor
on record).

Blow-up construction (replicas r=0..9; r=0 is the sf0.1 table
verbatim) — keys shift so join fan-outs scale exactly 10x, and the
text/vector tables are DECORRELATED across replicas so near-dup /
ANN workloads scale linearly instead of inheriting a quadratic
everything-matches-its-9-clones artifact:

- dims (region, nation) stay fixed — like a real SF scale-up;
- customer/supplier/part/orders/lineitem/events: surrogate keys shift
  by a per-replica stride on BOTH sides of every FK, so each replica
  is a disjoint, internally consistent TPC-H world;
- documents: every token gets a per-replica suffix for r>0 —
  within-replica shingle structure is IDENTICAL to sf0.1 (token
  equality is preserved), cross-replica Jaccard is 0 by construction;
- embeddings: elementwise multiply by a per-replica deterministic
  +-1 sign pattern — (s⊙a)·(s⊙b) = a·b and ||s⊙a|| = ||a||, so ALL
  within-replica cosine structure is preserved exactly, while
  cross-replica dots are sign-decorrelated noise.

Expected shape: linear ops ~10x, broadcast joins ~10x (probe side
scales, build side fixed), window/sort ops ~10x log-ish, fixed-
overhead queries < 10x. Output name: $SPARK_GRAFT_SF1_OUT (default BENCH_SF1_r14.json).

Usage: python tools/bench_sf1.py [--keep]
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
DST = "/tmp/bench_sf1_data"
OUT = os.path.join(
    REPO, os.environ.get("SPARK_GRAFT_SF1_OUT", "BENCH_SF1_r14.json")
)
REPLICAS = 10
PASSES = 2

# per-replica key strides (far above every sf0.1 max key)
STRIDE_SMALL = 1_000_000      # custkey / suppkey / partkey / user_id
STRIDE_BIG = 10_000_000       # orderkey / event_id / doc_id / vec_id


def blow_up(spark) -> None:
    from pyspark.sql import functions as F

    from projet_5spar_sparkstreaming_spark.sources.files import (
        read_parquet_table,
    )

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)

    def shift(col, stride):
        return (F.col(col) + F.col("__r") * stride).alias(col)

    def write(df, name, n_files):
        df.repartition(n_files).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )

    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("__r"))

    for t in ("region", "nation"):
        write(read_parquet_table(spark, SRC, t), t, 1)

    cust = read_parquet_table(spark, SRC, "customer").crossJoin(reps)
    write(
        cust.select(
            shift("c_custkey", STRIDE_SMALL),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        ),
        "customer", 4,
    )

    supp = read_parquet_table(spark, SRC, "supplier").crossJoin(reps)
    write(
        supp.select(
            shift("s_suppkey", STRIDE_SMALL), "s_name", "s_nationkey",
            "s_acctbal",
        ),
        "supplier", 1,
    )

    part = read_parquet_table(spark, SRC, "part").crossJoin(reps)
    write(
        part.select(
            shift("p_partkey", STRIDE_SMALL), "p_name", "p_brand",
            "p_type", "p_size", "p_retailprice",
        ),
        "part", 2,
    )

    orders = read_parquet_table(spark, SRC, "orders").crossJoin(reps)
    write(
        orders.select(
            shift("o_orderkey", STRIDE_BIG),
            shift("o_custkey", STRIDE_SMALL),
            "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        ),
        "orders", 8,
    )

    li = read_parquet_table(spark, SRC, "lineitem").crossJoin(reps)
    write(
        li.select(
            shift("l_orderkey", STRIDE_BIG),
            shift("l_partkey", STRIDE_SMALL),
            shift("l_suppkey", STRIDE_SMALL),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        "lineitem", 16,
    )

    ev = read_parquet_table(spark, SRC, "events").crossJoin(reps)
    write(
        ev.select(
            shift("event_id", STRIDE_BIG),
            "ts",
            shift("user_id", STRIDE_SMALL),
            "event_type", "value", "props",
        ),
        "events", 8,
    )

    docs = read_parquet_table(spark, SRC, "documents").crossJoin(reps)
    # r=0 text verbatim; r>0 per-token suffix (token equality — hence
    # shingle/minhash/simhash structure — preserved WITHIN a replica,
    # zero shared shingles ACROSS replicas)
    tagged = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda tok: F.concat(tok, F.lit("_x"), F.col("__r").cast("string")),
        ),
        " ",
    )
    text = F.when(F.col("__r") == 0, F.col("text")).otherwise(tagged)
    write(
        docs.select(
            shift("doc_id", STRIDE_BIG),
            text.alias("text"),
            "lang", "source",
        ).withColumn("n_chars", F.length("text")),
        "documents", 4,
    )

    emb = read_parquet_table(spark, SRC, "embeddings").crossJoin(reps)
    # per-replica deterministic +-1 sign pattern per dimension: within-
    # replica dots and norms are EXACTLY preserved, cross-replica dots
    # decorrelate; r=0 verbatim
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
    write(
        emb.select(
            shift("vec_id", STRIDE_BIG),
            vec.alias("embedding"),
            "label",
        ),
        "embeddings", 2,
    )


def time_queries(spark, sf_dir: str, names, cat) -> dict:
    out = {}
    for name in names:  # warm pass (JIT/codegen/footers)
        cat[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    for name in names:
        runs = []
        for _ in range(PASSES):
            t0 = time.time()
            cat[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.time() - t0)
        out[name] = round(statistics.median(runs), 3)
    return out


def main() -> None:
    from bench import BENCH_QUERIES, CALIB_REF, _calib_scale, _calibrate

    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("bench_sf1")
    cat = {q.name: q for q in catalog()}
    _calibrate(spark)
    calib_start = _calibrate(spark)

    t0 = time.time()
    blow_up(spark)
    sec_blowup = round(time.time() - t0, 1)

    base = time_queries(spark, SRC, BENCH_QUERIES, cat)
    big = time_queries(spark, DST, BENCH_QUERIES, cat)
    calib_end = _calibrate(spark)

    ratio = {
        n: round(big[n] / base[n], 2) if base[n] > 0 else None
        for n in BENCH_QUERIES
    }
    payload = {
        "metric": "sf1_decade_sweep",
        "replicas": REPLICAS,
        "passes_per_query": PASSES,
        "sec_blowup": sec_blowup,
        "sf0.1_sec": base,
        "sf1.0_sec": big,
        "ratio_sf1_over_sf01": ratio,
        "total_sf0.1": round(sum(base.values()), 2),
        "total_sf1.0": round(sum(big.values()), 2),
        "total_ratio": round(sum(big.values()) / sum(base.values()), 2),
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
    print(json.dumps({"total_ratio": payload["total_ratio"],
                      "total_sf1.0": payload["total_sf1.0"],
                      "out": OUT}))
    if "--keep" not in sys.argv:
        shutil.rmtree(DST, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
