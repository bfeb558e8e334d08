"""Property-based tests (hypothesis): the filtering joins must be LOSSLESS
vs brute-force reference implementations on arbitrary inputs — the claims
the fixture-based tests can't pin down."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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
            # equal-ts ties resolve DETERMINISTICALLY to the max payload
            # (window orderBy includes the payload as final tie-break)
            assert got[lid][1] == max(vals)
        else:
            assert got[lid] == (None, None)


ids_strategy = st.lists(
    st.integers(min_value=0, max_value=(1 << 62)), min_size=1, max_size=30, unique=True
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ids_strategy)
def test_hash_split_stable_exhaustive_and_overflow_safe(spark, ids):
    """hash_split: every row gets exactly one label, the assignment is
    invariant under repartitioning, and ids up to 2^62 don't overflow
    (regression for the raw id*KNUTH formula, which threw under ANSI mode
    for ids above ~3.46e9)."""
    from mover_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
    b = {r.doc_id: r.split for r in hash_split(df.repartition(7), "doc_id").collect()}
    assert a == b
    assert set(a) == set(ids)
    assert set(a.values()) <= {"train", "val", "test"}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_repetition_stats_matches_reference(spark, texts):
    """repetition_stats vs a per-doc Python reference on arbitrary docs."""
    from mover_spark.operators.text import repetition_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        if not words:
            assert i not in got
            continue
        counts = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        assert got[i].n_words == len(words)
        assert got[i].top_word_frac == round(max(counts.values()) / len(words), 6)
        assert got[i].dup_word_frac == round(1 - len(counts) / len(words), 6)
        grams = [
            " ".join(words[j : j + 2]) for j in range(len(words) - 1)
        ]
        if grams:
            assert got[i].dup_2gram_frac == round(1 - len(set(grams)) / len(grams), 6)
        else:
            assert got[i].dup_2gram_frac is None


def test_stratified_sample_exact_sizes_and_stability(spark, catalog):
    """Exactly n per stratum (capped by stratum size), and re-running after
    a repartition returns the identical row set."""
    from mover_spark.operators.sampling import stratified_sample_exact

    docs = catalog.df("documents")
    s1 = stratified_sample_exact(docs, "lang", "doc_id", n=20)
    sizes = {r.lang: r.n for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(20, full[lang]), lang
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    s2 = stratified_sample_exact(docs.repartition(17), "lang", "doc_id", n=20)
    assert {r.doc_id for r in s2.select("doc_id").collect()} == ids1


def test_weighted_sample_topk_exact_reproducible_and_weighted(spark, catalog):
    """weighted_sample_topk: the selected set IS the top-k by the race key
    (verified against an independent pure-Python recomputation of the
    Efraimidis–Spirakis key), exactly k per stratum, stable across
    repartitioning, and zero/NULL-weight rows never selected."""
    import math

    from mover_spark.operators.sampling import A, MERSENNE, weighted_sample_topk

    docs = catalog.df("documents")
    s1 = weighted_sample_topk(docs, "n_chars", "doc_id", k=10, strata_col="source")
    got = {(r.source, r.doc_id): r.race_key for r in s1.collect()}

    # independent mirror: same affine hash, same key formula, same rounding
    rows = docs.select("doc_id", "source", "n_chars").collect()
    by_src = {}
    for r in rows:
        if r.n_chars is None or r.n_chars <= 0:
            continue
        u = ((r.doc_id % MERSENNE) * A % MERSENNE + 1) / 2147483648.0
        key = round(r.n_chars / -math.log(u), 6)
        by_src.setdefault(r.source, []).append((key, r.doc_id))
    want = {}
    for src, ks in by_src.items():
        for key, did in sorted(ks, key=lambda t: (-t[0], t[1]))[:10]:
            want[(src, did)] = key
    assert set(got) == set(want)
    for sk, key in got.items():
        assert abs(key - want[sk]) < 1e-9, sk

    # stability across partitioning
    s2 = weighted_sample_topk(
        docs.repartition(13), "n_chars", "doc_id", k=10, strata_col="source"
    )
    assert {(r.source, r.doc_id) for r in s2.collect()} == set(got)

    # global (no strata) form: exactly k, and it is the global top-k
    g = weighted_sample_topk(docs, "n_chars", "doc_id", k=25)
    gkeys = sorted((r.race_key for r in g.collect()), reverse=True)
    allkeys = sorted((k for ks in by_src.values() for k, _ in ks), reverse=True)
    assert len(gkeys) == 25 and gkeys == allkeys[:25]

    # zero/NULL weights are excluded, never sampled
    poisoned = docs.withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None)).when(
            F.col("doc_id") % 3 == 1, F.lit(0)
        ).otherwise(F.col("n_chars")),
    )
    p = weighted_sample_topk(poisoned, "n_chars", "doc_id", k=10, strata_col="source")
    assert all(r.doc_id % 3 == 2 for r in p.collect())


def test_race_key_matches_duckdb():
    """The race-key formula (docstring SQL mirror) computes bit-identically
    in DuckDB — the contract the weighted_sample_docs oracle rides on."""
    import math

    import duckdb

    from mover_spark.operators.sampling import A, MERSENNE

    con = duckdb.connect()
    for did, w in [(0, 1), (1, 7), (2**62, 12345), (977, 10**9), (31337, 3)]:
        u = ((did % MERSENNE) * A % MERSENNE + 1) / 2147483648.0
        want = round(w / -math.log(u), 6)
        got = con.sql(
            f"SELECT ROUND(CAST({w} AS DOUBLE) / (-ln(("
            f"((CAST({did} AS BIGINT) % 2147483647) * 506952114) % 2147483647 + 1"
            f") / 2147483648.0)), 6)"
        ).fetchone()[0]
        assert got == want, (did, w, got, want)
    con.close()


def test_split_boundaries_round_not_truncate(spark):
    """0.57*10000 is 5699.999... in floating point: the boundary must
    round to 5700, not truncate a bucket off the promised fraction."""
    from mover_spark.operators.sampling import deterministic_sample, hash_bucket

    df = spark.range(0, 200_000).withColumnRenamed("id", "k")
    got = deterministic_sample(df, "k", 0.57)
    # every bucket below 5700 must be included: find max admitted bucket
    mx = got.select(F.max(hash_bucket("k")).alias("m")).first()["m"]
    assert mx == 5699  # buckets 0..5699 = exactly 5700 buckets = 57%


interval_rows = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 60), st.integers(-5, 15)),
    min_size=0,
    max_size=9,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(interval_rows, interval_rows)
def test_interval_overlap_banding_lossless_and_emit_once(spark, lrows, rrows):
    """The bucket-banded interval join must equal the brute-force O(n*m)
    per-key overlap scan EXACTLY — including multiplicity: a pair whose
    overlap spans several buckets must appear once, not once per shared
    bucket, and malformed intervals (end < start) must vanish. Small
    bucket_seconds (7 s vs intervals up to 15 s) forces multi-bucket
    intervals so the emit-once predicate actually carries weight."""
    from mover_spark.operators.joins import interval_overlap_join

    def mk(rows, side):
        data = [(i, k, s, s + d) for i, (k, s, d) in enumerate(rows)]
        return spark.createDataFrame(
            data, f"{side}id long, k int, s long, e long"
        ).select(
            f"{side}id",
            "k",
            F.timestamp_seconds("s").alias("start"),
            F.timestamp_seconds("e").alias("end"),
        )

    out = interval_overlap_join(
        mk(lrows, "l"), mk(rrows, "r"), keys=["k"], bucket_seconds=7
    )
    got = sorted((r.l_lid, r.r_rid) for r in out.collect())
    expect = sorted(
        (i, j)
        for i, (lk, ls_, ld) in enumerate(lrows)
        for j, (rk, rs_, rd) in enumerate(rrows)
        if ld >= 0
        and rd >= 0
        and lk == rk
        and ls_ <= rs_ + rd
        and rs_ <= ls_ + ld
    )
    assert got == expect


# small random corpora over a tiny alphabet: maximal shingle collisions,
# repeated spans, and every doc-length edge (0, 1, exactly min_len words)
corpus_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_substring_dup_spans_matches_python_reference(spark, texts):
    """substring_dup_spans == a sequential pure-Python re-implementation
    of the first-occurrence interval-union semantics, on corpora built to
    collide (4-letter alphabet, docs shorter/equal/longer than min_len)."""
    from mover_spark.operators.dedup import substring_dup_spans

    L = 3
    docs = list(enumerate(texts))
    first = {}
    marks = {}
    for did, text in docs:
        w = text.split(" ")
        for p in range(1, len(w) - L + 2):
            g = " ".join(w[p - 1 : p - 1 + L])
            if g in first:
                marks.setdefault(did, []).append(p)
            else:
                first[g] = (did, p)
    want = {}
    for did, text in docs:
        n = len(text.split(" "))
        covered = 0
        prev_end = 0
        for p in sorted(marks.get(did, [])):
            covered += max(p + L - max(p, prev_end), 0)
            prev_end = max(prev_end, p + L)
        want[did] = (n, covered, round(covered / n, 6))

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.pct_removed)
        for r in substring_dup_spans(sdf, min_len=L).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_containment_pairs_matches_brute_force_random(spark, texts):
    """containment_pairs (prefix-filtered) == brute force on random
    collision-heavy corpora, at a threshold low enough that the size and
    positional bounds all engage."""
    from mover_spark.operators.dedup import containment_pairs

    docs = list(enumerate(texts))
    sh = {}
    for did, text in docs:
        w = text.split(" ")
        s = {f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)}
        if s:
            sh[did] = s
    want = set()
    for a, sa in sh.items():
        for b, sb in sh.items():
            if a != b and len(sa & sb) / len(sa) >= 0.6:
                want.add((a, b, round(len(sa & sb) / len(sa), 6)))

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_inner, r.doc_outer, r.containment)
        for r in containment_pairs(sdf, threshold=0.6).collect()
    }
    assert got == want


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_unigram_xent_matches_python_reference(spark, texts):
    """unigram_xent == the quantized-integer formula recomputed in pure
    Python over arbitrary corpora (empty docs drop, empty tokens drop)."""
    import math

    from mover_spark.operators.text import unigram_xent

    toks = {i: [w for w in t.split(" ") if w] for i, t in enumerate(texts)}
    cnt = {}
    for ws in toks.values():
        for w in ws:
            cnt[w] = cnt.get(w, 0) + 1
    n = sum(cnt.values())
    want = {}
    for i, ws in toks.items():
        if not ws:
            continue
        lp = {w: round(math.log(c / n) * 1e9) for w, c in cnt.items()}
        s = sum(lp[w] for w in ws)
        want[i] = (len(ws), round(-(s / len(ws)) / 1e9, 6))

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.xent) for r in unigram_xent(df).collect()}
    assert got == want


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_doc_novelty_matches_python_reference(spark, texts):
    """doc_novelty == a per-doc Python recomputation of the df==1
    fraction over distinct bigram shingles."""
    from mover_spark.operators.text import doc_novelty

    sh = {}
    for i, t in enumerate(texts):
        w = t.split(" ")
        s = {f"{w[j]} {w[j+1]}" for j in range(len(w) - 1)}
        if s:
            sh[i] = s
    dfreq = {}
    for s in sh.values():
        for g in s:
            dfreq[g] = dfreq.get(g, 0) + 1
    want = {
        i: (len(s), round(sum(dfreq[g] == 1 for g in s) / len(s), 6))
        for i, s in sh.items()
    }
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: (r.n_shingles, r.novelty) for r in doc_novelty(df).collect()}
    assert got == want


def test_mixture_sample_multiplicities_and_stability(spark, catalog):
    """mixture_sample: floor(w) copies per row plus a deterministic
    fractional extra; epoch indices dense from 0; weight 0 drops the
    source; unlisted sources default to 1 copy; selection is invariant
    under repartitioning."""
    from mover_spark.operators.sampling import hash_bucket, mixture_sample

    docs = catalog.df("documents").select("doc_id", "source")
    weights = {"src0": 2.5, "src1": 0.25, "src2": 0.0}
    out = mixture_sample(docs, weights)
    rows = out.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault((r.doc_id, r.source), []).append(r.epoch)
    buckets = {
        r.doc_id: r.b
        for r in docs.withColumn("b", hash_bucket("doc_id")).collect()
    }
    base = {r.doc_id: r.source for r in docs.collect()}
    for doc_id, source in base.items():
        epochs = sorted(per_doc.get((doc_id, source), []))
        if source == "src0":
            want = 2 + (1 if buckets[doc_id] < 5000 else 0)  # frac .5
        elif source == "src1":
            want = 1 if buckets[doc_id] < 2500 else 0  # frac .25
        elif source == "src2":
            want = 0
        else:
            want = 1
        assert len(epochs) == want, (doc_id, source, epochs)
        assert epochs == list(range(want))
    # stability under repartitioning
    again = mixture_sample(docs.repartition(13), weights).collect()
    assert sorted((r.doc_id, r.source, r.epoch) for r in again) == sorted(
        (r.doc_id, r.source, r.epoch) for r in rows
    )


def test_training_shards_layout_order_and_scatter(spark, catalog, tmp_path):
    """write_training_shards: shard=K directories; rows inside a shard
    arrive sorted by shard_key; repeat epochs of one doc scatter across
    shards; shard sizes stay balanced."""
    import os

    from mover_spark.operators.sampling import (
        mixture_sample,
        write_training_shards,
    )

    docs = catalog.df("documents").select("doc_id", "source", "n_chars")
    mixed = mixture_sample(docs, {"src0": 4.0, "src1": 4.0})
    out_path = str(tmp_path / "shards")
    re_read = write_training_shards(mixed, out_path, 8, epoch_col="epoch")
    dirs = sorted(d for d in os.listdir(out_path) if d.startswith("shard="))
    assert len(dirs) == 8
    # in-file order inside each shard directory == shard_key ascending
    for d in dirs[:3]:
        part = spark.read.parquet(os.path.join(out_path, d))
        keys = [r.shard_key for r in part.collect()]
        assert keys == sorted(keys)
    rows = re_read.collect()
    # a doc with 4 epochs should not land all 4 in one shard (hash folds
    # the epoch in); check across all multi-epoch docs that scatter happens
    per_doc = {}
    for r in rows:
        if r.source in ("src0", "src1"):
            per_doc.setdefault(r.doc_id, set()).add(r.shard)
    assert per_doc, "mixture produced multi-epoch docs"
    scattered = sum(1 for s in per_doc.values() if len(s) > 1)
    assert scattered / len(per_doc) > 0.8
    # balance: no shard more than 2x the smallest
    from collections import Counter

    sizes = Counter(r.shard for r in rows)
    assert max(sizes.values()) <= 2 * min(sizes.values())


def test_leakage_safe_split_no_cluster_straddles(spark, catalog):
    """leakage_safe_split's contract: (1) every member of a near-dup
    cluster lands in ONE split — zero clusters straddle; (2) docs in no
    cluster get exactly hash_split's assignment on their own id; (3) the
    output is the input schema plus `split` (no helper columns leak)."""
    from mover_spark.operators.dedup import dedup_clusters
    from mover_spark.operators.sampling import hash_split, leakage_safe_split

    docs = catalog.df("documents")
    out = leakage_safe_split(docs)
    assert set(out.columns) == set(docs.columns) | {"split"}

    clusters = dedup_clusters(docs)
    straddle = (
        out.join(clusters, "doc_id")
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert straddle == 0, "a near-dup cluster straddles splits"
    # clusters must actually exist, or the guarantee is vacuous here
    assert clusters.count() > 0

    plain = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    got = {r.doc_id: r.split for r in out.collect()}
    clustered = {r.doc_id for r in clusters.collect()}
    for doc_id, split in got.items():
        if doc_id not in clustered:
            assert split == plain[doc_id], "singleton moved vs hash_split"


@given(
    t=st.floats(min_value=0.5, max_value=0.99),
    w=st.floats(min_value=1.05, max_value=2.5),
    m=st.floats(min_value=1e-4, max_value=0.2),
    n_hash=st.integers(min_value=16, max_value=512),
)
@settings(max_examples=200, deadline=None)
def test_containment_scheme_search_invariants(t, w, m, n_hash):
    """The round-10 cost-model scheme search, over its whole domain:
    either it raises the documented nothing-fits error, or the table it
    returns satisfies (1) r >= 2 always, (2) every scheme fits the
    signature (r * n_bands <= n_hash), (3) the banded classes are the
    contiguous prefix 0..K with no duplicates, (4) every class's
    REALIZED worst-case miss (1 - j_min^r)^n_bands clears the per-class
    cap, and (5) the search is deterministic. (This test found two real
    defects on first run: a 6^K grid explosion at near-1 slice_base and
    a log(1.0) zero-division when j_min^r underflows for deep classes.)"""
    from mover_spark.operators.dedup import (
        CONTAIN_MISS_CAP,
        _containment_band_schemes,
    )

    try:
        schemes = _containment_band_schemes(t, w, m, n_hash)
    except ValueError as e:
        assert "containment_pairs" in str(e)
        return
    assert schemes == _containment_band_schemes(t, w, m, n_hash)
    classes = sorted(k for _, ks in schemes.values() for k in ks)
    assert classes == list(range(len(classes))), "non-contiguous classes"
    assert len(set(classes)) == len(classes)
    for r, (n_bands, ks) in schemes.items():
        assert r >= 2 and n_bands >= 1
        assert r * n_bands <= n_hash
        for k in ks:
            j_min = t / (1 + w ** (k + 1) - t)
            realized = (1.0 - j_min**r) ** n_bands
            assert realized <= CONTAIN_MISS_CAP * (1 + 1e-9), (
                f"class {k} realized miss {realized} above the cap"
            )
