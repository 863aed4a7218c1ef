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


def test_mix_weights_invariants(spark, sf_dir):
    """Temperature-mix weights: shares are distributions (each sums to
    1 within rounding), and alpha < 1 up-samples below-average-mass
    languages / down-samples above-average ones (the whole point of
    temperature sampling)."""
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog

    cat = {q.name: q for q in catalog()}
    rows = cat["mix_sampling_weights"].build(spark, sf_dir).collect()
    assert rows, "corpus has languages"
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-4
    # upsample_i > 1  <=>  sqrt(m_i)/SUM(sqrt) > m_i/SUM(m)
    #                 <=>  m_i < (SUM(m)/SUM(sqrt(m)))^2
    # (NOT the arithmetic mean — by Cauchy-Schwarz the crossover sits
    # at or above it)
    total = sum(r["n_tokens"] for r in rows)
    sqrt_total = sum(r["n_tokens"] ** 0.5 for r in rows)
    crossover = (total / sqrt_total) ** 2
    for r in rows:
        assert r["n_docs"] > 0 and r["n_tokens"] > 0
        if r["n_tokens"] < crossover * 0.999:
            assert r["upsample"] > 1.0, r
        elif r["n_tokens"] > crossover * 1.001:
            assert r["upsample"] < 1.0, r


def test_boilerplate_ratio_bounds_and_twins(spark, sf_dir):
    """Ratio in [0,1] with consistent counts; a doc's shingles that hit
    the >= 3 df bar can never exceed its distinct-shingle total."""
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog

    cat = {q.name: q for q in catalog()}
    rows = cat["doc_boilerplate_ratio"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_boilerplate"] <= r["n_shingles"]
        assert 0.0 <= r["boilerplate_ratio"] <= 1.0


def test_duplicate_span_pairs_ordering_and_bounds(spark, sf_dir):
    """Pairs are strictly ordered (id_a < id_b, no self/dup pairs) and
    a pair can never share more spans than the shorter doc holds."""
    from projet_5spar_sparkstreaming_spark.plans.catalog import catalog

    cat = {q.name: q for q in catalog()}
    rows = cat["duplicate_span_pairs"].build(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert (r["id_a"], r["id_b"]) not in seen
        seen.add((r["id_a"], r["id_b"]))
        assert r["n_shared_spans"] >= 1


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee ff gg hh".split()),
            min_size=0,
            max_size=12,
        ),
        min_size=2,
        max_size=14,
    )
)
def test_ngram_jaccard_matches_bruteforce_reference(spark, token_lists):
    """The PPJoin-optimized exact operator equals a brute-force Python
    Jaccard on arbitrary tiny corpora — including empty docs, identical
    docs, and docs shorter than the shingle width."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    n, threshold = 3, 0.6
    texts = [" ".join(toks) for toks in token_lists]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=n, threshold=threshold
        ).collect()
    }

    def shingles(toks):
        if not toks:
            return {""}
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    expect = {}
    sets = [shingles(t) for t in token_lists]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
            if jac >= threshold:
                expect[(i, j)] = round(jac, 6)
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee ff gg hh".split()),
            min_size=0,
            max_size=12,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_containment_matches_bruteforce_reference(spark, token_lists):
    """Directional containment operator == brute-force |A∩B|/|A| on
    arbitrary tiny corpora (id_a is the contained doc; self-pairs
    excluded)."""
    from projet_5spar_sparkstreaming_spark.operators.dedup import (
        containment_pairs,
    )

    n, threshold = 3, 0.7
    texts = [" ".join(toks) for toks in token_lists]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            df, "doc_id", "text", n=n, threshold=threshold
        ).collect()
    }

    def shingles(toks):
        if not toks:
            return {""}
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = [shingles(t) for t in token_lists]
    expect = {}
    for i in range(len(sets)):
        for j in range(len(sets)):
            if i == j:
                continue
            c = len(sets[i] & sets[j]) / len(sets[i])
            if c >= threshold:
                expect[(i, j)] = round(c, 6)
    assert got == expect
