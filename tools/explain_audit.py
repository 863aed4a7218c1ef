"""Plan audit: verify the SCALE.md claims against actual physical plans.

For each headline query, checks the formatted plan for the properties
the engine promises: parquet filter pushdown, column pruning, broadcast
joins on dims, TakeOrderedAndProject for top-k, partial aggregation.
Prints PASS/WARN per property. Usage: python tools/explain_audit.py
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

CHECKS = {
    "q1_pricing_summary": [
        ("filter pushdown", "PushedFilters: [IsNotNull(l_shipdate)"),
        ("column pruning (7 cols)", "ReadSchema: struct<l_quantity"),
        ("partial agg", "HashAggregate"),
    ],
    "q3_top_orders": [
        ("customer broadcast", "BroadcastHashJoin"),
        ("no global sort for top-10", "TakeOrderedAndProject"),
        ("segment filter pushed", "EqualTo(c_mktsegment,BUILDING)"),
    ],
    "q5_region_revenue": [
        ("dims broadcast", "BroadcastHashJoin"),
        ("date filter pushed", "PushedFilters: [IsNotNull(o_orderdate)"),
    ],
    "latest_event_per_user": [
        ("single shuffle window", "Exchange"),
        # Spark pushes the rank limit below the shuffle: top-1 per key is
        # pre-filtered per partition before the exchange
        ("pre-shuffle rank limit", "WindowGroupLimit"),
    ],
    "user_activity": [
        ("partial agg before exchange", "HashAggregate"),
    ],
    "q6_forecast_revenue": [
        ("range predicates pushed", "GreaterThanOrEqual(l_shipdate"),
        ("4-column scan", "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp"),
    ],
    "q10_returned_items": [
        ("returnflag pushed", "EqualTo(l_returnflag,R)"),
        ("nation broadcast", "BroadcastHashJoin"),
        ("no global sort for top-20", "TakeOrderedAndProject"),
    ],
    "q22_idle_balance": [
        ("scalar avg broadcast", "BroadcastNestedLoopJoin"),
        ("anti join", "LeftAnti"),
    ],
    "parts_above_type_avg": [
        ("single scan, no self-join", "Window"),
    ],
    "q2_min_cost_supplier": [
        ("part size+type pushed", "LessThanOrEqual(p_size,15)"),
        ("region filter pushed", "EqualTo(r_name,EUROPE)"),
        ("correlated min decorrelated to window", "Window"),
        ("dims broadcast", "BroadcastHashJoin"),
    ],
    "q8_market_share": [
        ("part type pushed", "EqualTo(p_type,STANDARD)"),
        ("order-date range pushed", "GreaterThanOrEqual(o_orderdate,1996-01-01"),
        ("dims broadcast", "BroadcastHashJoin"),
        ("partial agg", "HashAggregate"),
    ],
    "q4_order_priority": [
        # size-based: broadcast at test SF, flips to shuffled SMJ at scale
        ("EXISTS lowered to left-semi", "LeftSemi"),
        ("order-date window pushed", "GreaterThanOrEqual(o_orderdate"),
    ],
    "q9_nation_profit": [
        ("part-name LIKE pushed to scan", "StringContains(p_name,ol)"),
        ("nation broadcast", "BroadcastHashJoin"),
    ],
    "q12_priority_by_flag": [
        ("shipdate range pushed", "GreaterThanOrEqual(l_shipdate"),
        ("partial agg", "HashAggregate"),
    ],
    "q16_supplier_counts": [
        ("NOT IN lowered to left-anti", "LeftAnti"),
        ("size filter pushed", "In(p_size"),
    ],
    "q17_small_qty_revenue": [
        ("correlated avg decorrelated to window", "Window"),
        ("brand filter pushed", "EqualTo(p_brand,Brand#23)"),
    ],
    "q19_disjunctive_revenue": [
        ("disjunctive predicate pushed", "Or(And("),
        ("part broadcast", "BroadcastHashJoin"),
    ],
    "q20_small_part_suppliers": [
        ("IN-subquery lowered to left-semi", "LeftSemi"),
        ("small-part prefix pushed", "StringStartsWith(p_name,small)"),
    ],
    "pack_documents": [
        # one hash shuffle on the shard key, then an in-partition window
        ("single shard shuffle + ordered pass", "Window"),
    ],
    "doc_split_assignment": [
        # pure projection: md5 bucketing must not shuffle anything
        ("no exchange (projection only)", "!Exchange"),
    ],
    "gap_fill_hourly": [
        ("grid side broadcast", "BroadcastNestedLoopJoin"),
        ("counts pre-aggregated", "HashAggregate"),
    ],
    "q21_waiting_suppliers": [
        ("EXISTS lowered to left-semi", "LeftSemi"),
        ("NOT EXISTS lowered to left-anti", "LeftAnti"),
        ("top-20 without global sort", "TakeOrderedAndProject"),
    ],
    "range_join_bands": [
        # the non-equi interval join must broadcast the band dim — a
        # shuffled theta-join would be quadratic in facts at scale
        ("band dim broadcast (non-equi)", "BroadcastNestedLoopJoin"),
        ("no fact shuffle before the join", "HashAggregate"),
    ],
    "ngram_jaccard_pairs": [
        # candidate generation is a prefix equi-join; any cartesian
        # product here melts down at scale
        ("no cartesian product", "!CartesianProduct"),
    ],
    "containment_pairs": [
        ("no cartesian product", "!CartesianProduct"),
    ],
    "minhash_pairs": [
        ("banded equi-join, no cartesian", "!CartesianProduct"),
        # r8 linearization: candidates come from ONE groupBy(band,
        # bucket) collect_list + HOF pair expansion — the banded
        # SELF-join it replaced sort-merge-shuffled the bands*docs
        # table twice and went superlinear at the 5M tier (82.9s vs
        # ~19s, SCALE_STRESS_r08)
        ("no banded self-join", "!SortMergeJoin"),
        ("bucket members via collect_list agg", "ObjectHashAggregate"),
    ],
    "embedding_neardup_pairs": [
        # bucket equi-join candidates; a cartesian here is the
        # quadratic-corpus failure mode
        ("bucketed equi-join, no cartesian", "!CartesianProduct"),
    ],
    "curate_corpus": [
        # r8: all corpus scoring regex (tokens/alpha/fingerprint) runs
        # in ONE Arrow RE2 kernel — java.util.regex in this plan means
        # the 143s-per-500k expression path regressed back in, and the
        # quality/length filter would double-evaluate it via pushdown
        ("arrow scoring kernel present", "MapInArrow"),
        ("no java-regex scoring", "!regexp"),
    ],
    "incremental_neardup_pairs": [
        ("cross-set prefix equi-join, no cartesian", "!CartesianProduct"),
    ],
    "doc_gopher_rules": [
        # curation rules are a pure projection over the scan
        ("no exchange (projection only)", "!Exchange"),
    ],
    "doc_repetition_stats": [
        ("no exchange (projection only)", "!Exchange"),
    ],
    "doc_pii_scan": [
        # compliance sweep is a pure projection over the scan
        ("no exchange (projection only)", "!Exchange"),
        ("2-column scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "doc_boilerplate_ratio": [
        # df via partial-agg groupBy + join back (AQE-skew-splittable,
        # unlike a count window over the raw exploded scan)
        ("partial-agg df", "HashAggregate"),
        ("no window over raw exploded rows", "!Window"),
        ("no cartesian product", "!CartesianProduct"),
    ],
    "mix_sampling_weights": [
        # corpus collapses to #langs rows behind a partial agg before
        # any window runs
        ("partial agg first", "HashAggregate"),
    ],
    "duplicate_span_pairs": [
        # span equi-join on 64-bit hashes; cartesian = quadratic corpus
        ("span equi-join, no cartesian", "!CartesianProduct"),
    ],
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check_plan(plan: str, label: str, needle: str) -> bool:
    """One plan assertion; a "!" prefix asserts the pattern is ABSENT."""
    del label  # part of the audit report, not the predicate
    if needle.startswith("!"):
        return needle[1:] not in plan
    return needle in plan


def audit_query(spark, sf_dir: str, name: str) -> list[tuple[str, bool]]:
    """Run all registered checks for one query; (label, ok) per check.
    Shared by the CLI report and the pytest plan-regression tests."""
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog

    cat = {q.name: q for q in catalog()}
    plan = formatted_plan(cat[name].build(spark, sf_dir))
    return [
        (label, check_plan(plan, label, needle)) for label, needle in CHECKS[name]
    ]


def main() -> None:
    from projet_5spar_sparkstreaming_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain_audit")
    failures = 0
    for name in CHECKS:
        for label, ok in audit_query(spark, sf_dir, name):
            print(f"{'PASS' if ok else 'WARN'}  {name}: {label}")
            failures += 0 if ok else 1
    print(f"\n{failures} warnings")
    spark.stop()


if __name__ == "__main__":
    main()
