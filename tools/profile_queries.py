"""Per-query optimization profile (r14, guide §1).

For every headline bench query: time the BUILD phase (driver work +
any eager fence/count jobs the builder runs) separately from the
ACTION phase (noop write of the returned plan), count plan features
(Exchange / BatchEvalPython / ArrowEvalPython / join strategies), and
dump `explain("formatted")` to plans/<tag>/<query>_<tag>.txt so plan
claims are checkable without running Spark.

Usage:
    python tools/profile_queries.py <before|after> [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402


def _plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _plan_stats(text: str) -> dict:
    return {
        "exchange": len(re.findall(r"\bExchange\b", text)),
        "reused_exchange": len(re.findall(r"\bReusedExchange\b", text)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", text)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", text)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", text)),
        "bnl": len(re.findall(r"\bBroadcastNestedLoopJoin\b", text)),
        "batch_eval_py": len(re.findall(r"\bBatchEvalPython\b", text)),
        "arrow_eval_py": len(re.findall(r"\bArrowEvalPython\b", text)),
        "map_in_arrow": len(re.findall(r"\bMapInArrow|PythonMapInArrow\b", text)),
        "sorts": len(re.findall(r"\bSort \[", text)),
        "scans": len(re.findall(r"Scan parquet", text)),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("profile_queries")
    cat = {q.name: q for q in catalog()}
    names = [n for n in BENCH_QUERIES if not only or n in only]

    results: dict[str, dict] = {}
    # warm pass (unrecorded): JIT/codegen/footer caches
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        cat[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = cat[name].build(spark, sf_dir)
        t_build = time.time() - t0
        plan = _plan_text(df)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_action = time.time() - t1
        stats = _plan_stats(plan)
        stats["build_sec"] = round(t_build, 3)
        stats["action_sec"] = round(t_action, 3)
        stats["total_sec"] = round(t_build + t_action, 3)
        results[name] = stats
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
    spark.sparkContext.setJobDescription(None)

    print(json.dumps(results, indent=1))
    with open(os.path.join(out_dir, f"profile_{tag}.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "queries": results}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
