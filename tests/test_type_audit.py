"""Oracle type-parity regression: every oracle's DuckDB Arrow schema
must type-match the Spark result schema (family-level).

The driver's correctness hasher is type-sensitive where
tools/verify_local.py's Python-value compare is not — round 1's only
red row (user_sessions) was DuckDB HUGEINT vs Spark bigint with equal
values. This pins tools/type_audit.py's sweep in pytest.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from tools.type_audit import _family, _spark_family  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_every_oracle_type_matches_spark(spark, oracle_con):
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog

    flagged = []
    for q in catalog():
        if q.oracle is None:
            continue
        # streaming queries execute a real stream per build — covered by
        # the value-level sweep; skip the expensive ones here
        if q.name.startswith("stream_"):
            continue
        spark_types = dict(q.build(spark, SF_DIR).dtypes)
        tbl = oracle_con.sql(q.oracle).fetch_arrow_table()
        for f in tbl.schema:
            styp = spark_types.get(f.name)
            if styp is None:
                continue
            if _spark_family(styp) != _family(str(f.type)):
                flagged.append(f"{q.name}.{f.name}: spark={styp} oracle={f.type}")
    assert not flagged, flagged
