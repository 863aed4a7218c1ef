"""Plan-shape regression tests: pin the SCALE.md physical-plan claims.

Runs the same assertions as tools/explain_audit.py inside pytest so a
change that silently loses filter pushdown, column pruning, broadcast
strategy, semi/anti lowering, TakeOrdered, or WindowGroupLimit fails
the suite instead of only degrading the bench.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.explain_audit import CHECKS, audit_query  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_plan_shape(spark, name):
    results = audit_query(spark, SF_DIR, name)
    failed = [label for label, ok in results if not ok]
    assert not failed, f"{name}: plan lost properties {failed}"


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchange_blocks(plan: str) -> list[str]:
    """Each physical-plan node description block that is an Exchange."""
    blocks, cur, in_ex = [], [], False
    for line in plan.splitlines():
        if line.startswith("(") and ")" in line:  # new node header
            if in_ex:
                blocks.append("\n".join(cur))
            in_ex = "Exchange" in line and "BroadcastExchange" not in line
            cur = [line]
        elif in_ex:
            cur.append(line)
    if in_ex:
        blocks.append("\n".join(cur))
    return blocks


@pytest.mark.parametrize(
    "query",
    ["minhash_pairs", "embedding_neardup_pairs", "incremental_embedding_pairs"],
)
def test_banding_shuffles_carry_ids_not_payloads(spark, query):
    """The shuffle-bytes property behind the 500k-doc fix (SCALE.md):
    candidate-pair exchanges (hashpartitioning on id_a/id_b) must carry
    IDs only — signature arrays / embedding vectors re-join AFTER the
    dedup. A regression here multiplies shuffle volume ~8x at scale."""
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog

    cat = {q.name: q for q in catalog()}
    plan = _formatted_plan(cat[query].build(spark, SF_DIR))
    pair_exchanges = [
        b
        for b in _exchange_blocks(plan)
        if "hashpartitioning(id_a" in b
        or "hashpartitioning(id_b" in b
        # r15: the estimate-sized pair dedup plans as a SinglePartition
        # REPARTITION_BY_NUM exchange when the analytic pair estimate
        # fits one task (always true at this test SF) — recognize it by
        # its id-only input row
        or ("SinglePartition" in b and "Input [2]: [id_a" in b)
    ]
    assert pair_exchanges, f"{query}: expected a pair-dedup exchange"
    for block in pair_exchanges:
        assert "__sig" not in block and "__v" not in block and "__emb" not in block, (
            f"{query}: payload column shuffled with candidate pairs:\n{block}"
        )


def test_chunk_documents_is_shuffle_free(spark):
    """SCALE.md claim for the pretraining chunker: chunk boundaries
    derive from each row alone — the whole plan must run inside the
    scan stage (no Exchange), reading only the two needed columns."""
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog

    q = {c.name: c for c in catalog()}["chunk_documents"]
    plan = _formatted_plan(q.build(spark, SF_DIR))
    assert "Exchange" not in plan, "chunker must not shuffle"
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_stratified_sample_prefilters_rank_below_shuffle(spark):
    """The per-stratum quota sample must shuffle once on the stratum
    key and pre-filter the rank limit per partition before the
    exchange (WindowGroupLimit) — at 100 TB the exchange then carries
    ~quota rows per (stratum, task), not the corpus."""
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog

    q = {c.name: c for c in catalog()}["stratified_sample_docs"]
    plan = _formatted_plan(q.build(spark, SF_DIR))
    assert len(_exchange_blocks(plan)) == 1
    assert "hashpartitioning(lang" in plan
    # the PARTIAL group limit runs before the exchange: each map task
    # forwards at most `quota` rows per stratum
    assert "row_number(), 20, Partial" in plan
