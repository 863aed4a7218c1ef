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
