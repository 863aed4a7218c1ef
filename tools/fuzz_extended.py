"""Extended one-off lease fuzz: heavier than the suite's default
(6 workers instead of 4, 90 s minimum window instead of 35 s,
concurrent reader on) across all three index families AND both host
modes — committed as FUZZ_EXTENDED_r{N}.json so the frontier run is on
record, not just the per-round pytest defaults.

Modes (r13 verdict task 1):
  same_host     the r13 harness: corpse locks breakable by the
                (boot_id, pid, pid_start) dead-pid fast path
  foreign_host  every worker's fsio identity spoofed to a unique fake
                host — the dead-pid path declines for EVERY corpse
                lock and only the lease heartbeat (short knobs:
                hb_sec=2, hb_dead=8) admits waiters before the 30-min
                TTL. The artifact records kill -> next-completed-op
                gaps and the first post-carnage replay time: both must
                sit at heartbeat scale.

Usage: python tools/fuzz_extended.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    import test_lease_fuzz as tlf

    from projet_5spar_sparkstreaming_spark.session import get_spark

    # heavier knobs for the one-off (the suite keeps the cheaper
    # defaults; this script exists so the heavier point is MEASURED)
    tlf.N_WORKERS = 6
    tlf.FUZZ_SEC = 90.0

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "FUZZ_EXTENDED.json"
    )
    spark = get_spark("fuzz_extended")
    results = {}
    for mode in ("same_host", "foreign_host"):
        for family in ("ivf", "minhash", "embed"):
            key = f"{family}/{mode}"
            base = Path(tempfile.mkdtemp(prefix=f"fuzzx_{family}_{mode}_"))
            try:
                tlf.test_lease_fuzz_concurrent_mutations_survive_random_kill9(
                    spark, base, family, mode
                )
                jdir = str(base / "journals")
                tally = tlf._parse_journals(jdir)
                metrics = {}
                pm = os.path.join(jdir, "parent_metrics.json")
                if os.path.exists(pm):
                    metrics = json.load(open(pm))
                results[key] = {
                    "ok": True,
                    "workers": tlf.N_WORKERS,
                    "min_window_sec": tlf.FUZZ_SEC,
                    "acked_appends": len(tally["acked_appends"]),
                    "inflight_replayed": len(tally["inflight"]),
                    "acked_compacts": tally["acked_compacts"],
                    "acked_rebuilds": tally["acked_rebuilds"],
                    "designed_aborts": tally["aborts"],
                    "max_kill_to_next_done_sec": metrics.get(
                        "max_kill_to_next_done_sec"
                    ),
                    "first_replay_sec": metrics.get("first_replay_sec"),
                }
                if mode == "foreign_host":
                    results[key]["hb_knobs"] = {
                        "hb_sec": float(tlf.FOREIGN_HB_SEC),
                        "hb_dead_sec": float(tlf.FOREIGN_HB_DEAD_SEC),
                        "ttl_would_be_sec": 1800.0,
                    }
            except AssertionError as e:
                results[key] = {"ok": False, "error": str(e)[:2000]}
            finally:
                import shutil

                shutil.rmtree(base, ignore_errors=True)
            print(json.dumps({key: results[key]}))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()
    if not all(r.get("ok") for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
