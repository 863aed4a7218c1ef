"""Property-based tests (hypothesis) for parsing and dedup invariants."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from projet_5spar_sparkstreaming_spark.functions.timestamps import normalize_timestamp
from projet_5spar_sparkstreaming_spark.operators.dedup import latest_per_key

_DTS = st.datetimes(
    min_value=dt.datetime(2000, 1, 1),
    max_value=dt.datetime(2030, 12, 31),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_DTS, min_size=1, max_size=20))
def test_timestamp_roundtrip_all_formats(spark, values):
    """Any datetime formatted in the reference's layouts parses back
    to the same instant (truncated to the layout's precision)."""
    rows = []
    for v in values:
        micros = v.replace(microsecond=(v.microsecond // 1000) * 1000)  # ms precision
        secs = v.replace(microsecond=0)
        rows.append((v.strftime("%Y-%m-%d %H:%M:%S.%f") + "+00:00", v))
        rows.append((secs.strftime("%Y-%m-%d %H:%M:%S") + "+00:00", secs))
        rows.append((micros.strftime("%Y-%m-%dT%H:%M:%S.") + f"{micros.microsecond // 1000:03d}Z", micros))
        rows.append((secs.strftime("%Y-%m-%dT%H:%M:%S") + "Z", secs))
        rows.append((secs.strftime("%Y-%m-%d %H:%M:%S"), secs))
    df = spark.createDataFrame([(r[0],) for r in rows], ["raw"])
    got = [r["ts"] for r in df.select(normalize_timestamp("raw").alias("ts")).collect()]
    expect = [r[1] for r in rows]
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2", "k3"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
            st.text(alphabet="abc", min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_latest_per_key_matches_reference_impl(spark, rows):
    """latest_per_key == python reference: max order value (nulls lose),
    ties broken by ascending tie-break column."""
    df = spark.createDataFrame(rows, "k string, v bigint, tag string")
    got = {
        r["k"]: (r["v"], r["tag"])
        for r in latest_per_key(df, ["k"], "v", tie_break=("tag",)).collect()
    }
    expect = {}
    for k, v, tag in rows:
        # sort key: nulls last => null means -inf; tie-break asc
        cur = expect.get(k)
        cand = (v if v is not None else -1, tag)
        if cur is None:
            expect[k] = cand
        else:
            cur_key = (cur[0] if cur[0] is not None else -1, cur[1])
            # higher v wins; equal v -> lexicographically smaller tag wins
            if cand[0] > cur_key[0] or (cand[0] == cur_key[0] and cand[1] < cur_key[1]):
                expect[k] = cand
    normalized = {k: (None if v == -1 else v, t) for k, (v, t) in expect.items()}
    assert got == normalized
