"""Contract tests for __spark_entry__ (the driver surface)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "l_returnflag" in df.columns


def test_every_oracle_key_has_query():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


def test_catalog_size_covers_survey_surface():
    # SURVEY §2 parity + north-star ops; keep this in sync as coverage grows
    assert len(entry_mod.queries()) >= 110


def test_all_queries_build_plans(spark, sf_dir):
    """Every query must at least analyze (schema resolvable) at sf0.001."""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} produced no columns"


def test_pack_documents_contiguous_and_bounded(spark, sf_dir):
    """Packing invariants: within a shard, pack ids are monotone in
    doc_id, start at 0, and a pack only exceeds the 2048-token budget
    via its final (straddling) document."""
    from collections import defaultdict

    rows = entry_mod.queries()["pack_documents"](spark, sf_dir).collect()
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        assert docs[0]["pack_id"] == 0
        # exact reconstruction: pack_id == floor(start_offset / 2048)
        cum = 0
        prev = 0
        for r in docs:
            assert r["pack_id"] == cum // 2048
            assert r["pack_id"] >= prev  # monotone: packs never interleave
            prev = r["pack_id"]
            cum += r["n_tokens"]


def test_split_assignment_stable_and_proportionate(spark, sf_dir):
    rows = entry_mod.queries()["doc_split_assignment"](spark, sf_dir).collect()
    n = len(rows)
    frac = {
        s: sum(1 for r in rows if r["split"] == s) / n
        for s in ("train", "val", "test")
    }
    assert 0.7 < frac["train"] < 0.9 and frac["val"] < 0.2 and frac["test"] < 0.2
    # deterministic: re-running yields identical assignments
    again = {
        r["doc_id"]: r["split"]
        for r in entry_mod.queries()["doc_split_assignment"](spark, sf_dir).collect()
    }
    assert {r["doc_id"]: r["split"] for r in rows} == again
