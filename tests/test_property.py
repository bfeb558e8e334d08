"""Property-based tests (hypothesis): the filtering joins must be LOSSLESS
vs brute-force reference implementations on arbitrary inputs — the claims
the fixture-based tests can't pin down."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mover_spark.operators.dedup import ngram_jaccard_pairs
from mover_spark.operators.joins import as_of_join

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


def _brute_jaccard_pairs(texts, threshold=0.8):
    def shingles(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)} if len(w) >= 2 else set()

    out = set()
    sh = [shingles(t) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if not sh[i] or not sh[j]:
                continue
            inter = len(sh[i] & sh[j])
            union = len(sh[i]) + len(sh[j]) - inter
            if union and round(inter / union, 6) >= threshold:
                out.add((i, j))
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_ngram_prefix_and_positional_filters_lossless(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(df, threshold=0.8).collect()
    }
    assert got == _brute_jaccard_pairs(texts)


asof_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 30), st.booleans()),
    min_size=1,
    max_size=14,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_strategy)
def test_asof_join_matches_naive(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    lefts = [
        (i, k, base + datetime.timedelta(hours=h))
        for i, (k, h, is_left) in enumerate(rows)
        if is_left
    ]
    rights = [
        (k, base + datetime.timedelta(hours=h), float(i))
        for i, (k, h, is_left) in enumerate(rows)
        if not is_left
    ]
    if not lefts or not rights:
        return
    left = spark.createDataFrame(lefts, "id long, user_id long, ts timestamp_ntz")
    right = spark.createDataFrame(rights, "user_id long, ts timestamp_ntz, value double")
    got = {
        r.id: (r.ts_asof, r.value_asof)
        for r in as_of_join(left, right, ["user_id"]).collect()
    }
    for lid, k, lts in lefts:
        matches = [(rts, v) for rk, rts, v in rights if rk == k and rts <= lts]
        if matches:
            best_ts = max(m[0] for m in matches)
            vals = [v for rts, v in matches if rts == best_ts]
            assert got[lid][0] == best_ts
            assert got[lid][1] in vals  # equal-ts ties: any of the tied rows
        else:
            assert got[lid] == (None, None)
