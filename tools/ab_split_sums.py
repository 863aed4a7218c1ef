"""Same-session A/B of the r14 split-long sums vs their r13 decimal
forms (r14 verdict task 2).

r14 replaced >precision-18 decimal aggregation with split-long exact
sums in ten queries but only q1 got a careful same-session A/B; the
attribution ratios left five of the other nine clustered >1.1 slow.
This tool gives each of the nine the q1 treatment: the OLD decimal
builder (verbatim from git 39a07ff^ / 6655403^, only the agg differs)
and the CURRENT catalog builder run interleaved in ONE session —
warm pass each, then PASSES recorded action-time passes alternating
new/old — plus a value-identity check (collected rows must be equal).

Usage: python tools/ab_split_sums.py [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS, SPARK_GRAFT_AB_PASSES (default 5).
Output: plans/r15/ab_split_sums.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from projet_5spar_sparkstreaming_spark.plans import catalog as C  # noqa: E402

_t = C._t
_dec = C._dec
_cents = C._cents
_rev = C._rev
_avg4_cents = C._avg4_cents


# --- OLD (r13 decimal) builders, verbatim agg shapes from 39a07ff^ ---

def old_q3_top_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    revenue = F.round(F.sum(_rev()), 2).cast("double").alias("revenue")
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(revenue)
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "o_orderdate", "revenue")
    )


def old_q5_region_revenue(spark, sf_dir):
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(_rev()), 2).cast("double").alias("revenue")
    )


def old_q6_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def old_q7_nation_volume(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("volume"))
    )


def old_q8_market_share(spark, sf_dir):
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    reg = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(reg), F.col("c_rkey") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("s_nkey"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    nat_vol = F.sum(F.when(F.col("supp_nation") == "NATION_7", _rev()).otherwise(zero))
    tot_vol = F.sum(_rev())
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(nat_vol.cast("double") / tot_vol.cast("double"), 4).alias("mkt_share")
    )


def old_q9_nation_profit(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%ol%"))
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    amount = _rev() - _dec("l_quantity") * _dec("p_retailprice")
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            li.l_partkey == part.p_partkey,
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
    )


def old_q10_returned_items(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    revenue = F.round(F.sum(_rev()), 2).cast("double").alias("revenue")
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def old_segment_order_stats(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("total_price"),
            F.sum(_cents("o_totalprice")).alias("__cents"),
        )
        .select(
            "c_mktsegment",
            "n_orders",
            "n_customers",
            "total_price",
            _avg4_cents("__cents", "n_orders").alias("avg_price"),
        )
    )


def old_json_k_stats(spark, sf_dir):
    raw = F.get_json_object("props", "$.k")
    k_bound = F.transform(
        F.array(raw),
        lambda r: F.when(r.rlike(r"^-?[0-9]{1,18}$"), r.cast("long")),
    )[0]
    ev = _t(spark, sf_dir, "events").select("value", k_bound.alias("k_value"))
    agg = ev.groupBy("k_value").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(14,2)"))
        .cast("double")
        .alias("total_value"),
    )
    return agg.filter(F.col("k_value").isNotNull() | (F.col("cnt") < 0))


PAIRS = {
    "q3_top_orders": old_q3_top_orders,
    "q5_region_revenue": old_q5_region_revenue,
    "q6_forecast_revenue": old_q6_forecast_revenue,
    "q7_nation_volume": old_q7_nation_volume,
    "q8_market_share": old_q8_market_share,
    "q9_nation_profit": old_q9_nation_profit,
    "q10_returned_items": old_q10_returned_items,
    "segment_order_stats": old_segment_order_stats,
    "json_k_stats": old_json_k_stats,
}


def main() -> None:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "5"))

    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("ab_split_sums")
    cat = {q.name: q for q in catalog()}
    names = [n for n in PAIRS if not only or n in only]

    def _action(builder) -> float:
        t0 = time.time()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results: dict[str, dict] = {}
    for name in names:
        new_b = cat[name].build
        old_b = PAIRS[name]
        # value identity first (also warms both plans)
        spark.sparkContext.setJobDescription(f"ab-identity:{name}")
        rows_new = sorted(map(tuple, new_b(spark, sf_dir).collect()))
        rows_old = sorted(map(tuple, old_b(spark, sf_dir).collect()))
        identical = rows_new == rows_old
        new_s: list[float] = []
        old_s: list[float] = []
        for i in range(passes):
            spark.sparkContext.setJobDescription(f"ab-new:{name}:{i}")
            new_s.append(_action(new_b))
            spark.sparkContext.setJobDescription(f"ab-old:{name}:{i}")
            old_s.append(_action(old_b))
        med_new = statistics.median(new_s)
        med_old = statistics.median(old_s)
        results[name] = {
            "identical_values": identical,
            "split_sec": [round(s, 3) for s in new_s],
            "decimal_sec": [round(s, 3) for s in old_s],
            "split_median": round(med_new, 3),
            "decimal_median": round(med_old, 3),
            "split_over_decimal": round(med_new / med_old, 3) if med_old else None,
        }
        print(
            f"{name}: split {med_new:.3f}s vs decimal {med_old:.3f}s "
            f"(ratio {med_new / med_old:.3f}) identical={identical}",
            file=sys.stderr,
        )
    spark.sparkContext.setJobDescription(None)

    out = {"sf_dir": sf_dir, "passes": passes, "queries": results}
    print(json.dumps(out, indent=1))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ab_split_sums.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
