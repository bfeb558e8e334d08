"""Winnowing fingerprints: the SIGMOD'03 guarantee on planted copies,
density/selection invariants, and the stop-fingerprint (max_df) rule."""

import random

from mover_spark.operators.text import (
    winnowing_fingerprint_set,
    winnowing_overlap,
    winnowing_profile,
)

K, W = 8, 4
GUARANTEE = K + W - 1  # any shared substring this long must be detected


def _df(spark, *texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def test_shared_substring_guarantee(spark):
    """The winnowing theorem: docs sharing a substring of length
    >= k + w - 1 share at least one selected fingerprint — regardless of
    where the copy sits in either document."""
    rng = random.Random(11)
    shared = _rand_text(rng, GUARANTEE)
    docs, expect_pairs = [], []
    for i in range(5):
        a = _rand_text(rng, rng.randrange(30, 120)) + shared + _rand_text(
            rng, rng.randrange(30, 120)
        )
        b = shared + _rand_text(rng, rng.randrange(40, 90))
        docs += [a, b]
        expect_pairs.append((2 * i, 2 * i + 1))
    fps = winnowing_fingerprint_set(_df(spark, *docs))
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    for a, b in expect_pairs:
        assert by_doc[a] & by_doc[b], f"docs {a},{b} share a {GUARANTEE}-char substring"


def test_selection_invariants(spark):
    """Every fingerprint is a real gram hash of its own document, the set is
    distinct, and density is far below one-per-gram (the 2/(w+1) economy
    that makes the sketch worth storing)."""
    rng = random.Random(3)
    text = _rand_text(rng, 2000)
    fps = [r.fp for r in winnowing_fingerprint_set(_df(spark, text)).collect()]
    assert len(fps) == len(set(fps))
    from mover_spark.util import md5_i64
    from pyspark.sql import functions as F

    grams = {
        r.h
        for r in _df(spark, text)
        .select(
            F.posexplode(F.sequence(F.lit(1), F.length("text") - (K - 1))).alias("_i", "pos"),
            "text",
        )
        .select(md5_i64(F.expr(f"substring(text, pos, {K})")).alias("h"))
        .collect()
    }
    assert set(fps) <= grams
    n_grams = len(text) - K + 1
    assert len(fps) < 0.6 * n_grams  # w=4 expects ~2/(w+1) = 0.4 density


def test_short_docs_yield_nothing(spark):
    df = _df(spark, "x" * (GUARANTEE - 1), "y" * GUARANTEE)
    out = winnowing_fingerprint_set(df).groupBy("doc_id").count().collect()
    ids = {r.doc_id for r in out}
    assert 0 not in ids and 1 in ids


def test_profile_aggregates_match_set(spark):
    rng = random.Random(5)
    df = _df(spark, _rand_text(rng, 300), _rand_text(rng, 500))
    fps = winnowing_fingerprint_set(df).collect()
    prof = {r.doc_id: r for r in winnowing_profile(df).collect()}
    for doc in (0, 1):
        s = [r.fp for r in fps if r.doc_id == doc]
        assert prof[doc].n_fingerprints == len(s)
        assert prof[doc].fp_min == min(s)
        x = 0
        for v in s:
            x ^= v
        assert prof[doc].fp_xor == x


def test_overlap_finds_copy_and_caps_boilerplate(spark):
    """A copied paragraph is reported; a boilerplate string present in EVERY
    document is excluded by the max_df stop-fingerprint rule."""
    rng = random.Random(9)
    boiler = _rand_text(rng, 60)
    para = _rand_text(rng, 80)
    texts = [boiler + _rand_text(rng, 150) for _ in range(12)]
    texts[2] = boiler + para + _rand_text(rng, 80)
    texts[7] = para + boiler + _rand_text(rng, 90)
    out = winnowing_overlap(
        _df(spark, *texts), min_shared=2, max_df=6
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r.n_shared for r in out}
    assert (2, 7) in pairs  # the copied paragraph survives the df cap
    # boilerplate fps have df=12 > 6, so docs sharing ONLY boilerplate
    # never pair up
    assert (0, 1) not in pairs


def test_xxhash64_arm_keeps_the_guarantee(spark):
    """The production hash arm (hash_fn='xxhash64', VERDICT r10 perf-weak
    #1) must preserve the winnowing theorem: planted >= k+w-1 copies still
    share a selected fingerprint, selection stays distinct and sparse, and
    the overlap report still finds the planted pair."""
    rng = random.Random(17)
    shared = _rand_text(rng, GUARANTEE * 3)
    a = _rand_text(rng, 80) + shared + _rand_text(rng, 60)
    b = shared + _rand_text(rng, 100)
    c = _rand_text(rng, 300)
    df = _df(spark, a, b, c)

    fps = winnowing_fingerprint_set(df, hash_fn="xxhash64")
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1], "planted copy must share a fingerprint"
    # density economy holds on the alternate hash too
    assert len(by_doc[2]) < 0.6 * (300 - K + 1)

    pairs = {
        (r.doc_a, r.doc_b)
        for r in winnowing_overlap(df, min_shared=2, hash_fn="xxhash64").collect()
    }
    assert (0, 1) in pairs

    prof = {r.doc_id: r for r in winnowing_profile(df, hash_fn="xxhash64").collect()}
    assert prof[0].n_fingerprints == len(by_doc[0])
    assert prof[0].fp_min == min(by_doc[0])


def test_bad_hash_fn_rejected(spark):
    import pytest

    df = _df(spark, "some document long enough to fingerprint here")
    with pytest.raises(ValueError, match="hash_fn"):
        winnowing_profile(df, hash_fn="sha1").collect()


def test_md5_arm_output_unchanged_by_hash_param(spark):
    """Adding hash_fn must not move the default (oracle) surface: the
    md5-arm fingerprint set is identical with and without the parameter."""
    rng = random.Random(23)
    df = _df(spark, _rand_text(rng, 400), _rand_text(rng, 250))
    base = {(r.doc_id, r.fp) for r in winnowing_fingerprint_set(df).collect()}
    expl = {
        (r.doc_id, r.fp)
        for r in winnowing_fingerprint_set(df, hash_fn="md5").collect()
    }
    assert base == expl and base


def test_w1_window_selects_every_gram(spark):
    """ADVICE r11: the least(element_at) window-min rewrite broke w=1
    (least() needs >1 argument). A 1-wide window's min is the gram itself,
    so the fingerprint set must equal the doc's DISTINCT gram hashes —
    count-checked against a Python recomputation of distinct k-grams."""
    rng = random.Random(31)
    text = _rand_text(rng, 120)
    expected = len({text[i : i + K] for i in range(len(text) - K + 1)})
    for hash_fn in ("md5", "xxhash64"):
        fps = winnowing_fingerprint_set(
            _df(spark, text), w=1, hash_fn=hash_fn
        ).collect()
        assert len(fps) == expected, hash_fn


def test_fast_invariants_surface(spark):
    """The round-12 driver-signable surface for the xxhash64 arm: n_grams
    matches the length formula exactly, both invariant booleans hold on
    every eligible doc, and sub-threshold docs are excluded — the same
    contract the DuckDB oracle asserts."""
    from mover_spark.operators.text import winnowing_fast_invariants

    rng = random.Random(37)
    texts = [_rand_text(rng, n) for n in (GUARANTEE, 50, 400)] + ["tiny"]
    rows = winnowing_fast_invariants(_df(spark, *texts)).collect()
    got = {r.doc_id: r for r in rows}
    assert set(got) == {0, 1, 2}  # "tiny" (< k+w-1) is excluded
    for i, n in ((0, GUARANTEE), (1, 50), (2, 400)):
        assert got[i].n_grams == n - K + 1
        assert got[i].arms_match and got[i].fp_in_bounds


def test_fast_invariants_validate_production_builder(spark, monkeypatch):
    """ADVICE r12: arms_match must validate the SHARED production
    window-min builder (_win_min_expr), not a local copy — a regression
    planted in the builder (the exact w=1-style bug class) must flip the
    driver-signed boolean."""
    from mover_spark.operators import text as T

    orig = T._win_min_expr

    def broken(w):
        # off-by-one window start: drops the oldest gram from the window
        return "least(" + ", ".join(
            f"element_at(__h, j - {d})" for d in range(w - 1)
        ) + ")" if w > 2 else orig(w)

    monkeypatch.setattr(T, "_win_min_expr", broken)
    rng = random.Random(41)
    rows = T.winnowing_fast_invariants(_df(spark, _rand_text(rng, 300))).collect()
    assert not rows[0].arms_match, (
        "a planted _win_min_expr regression did not flip arms_match — "
        "the invariant is validating a copy, not the production builder"
    )
