"""Text-analysis operator tests on constructed inputs."""

from mover_spark.operators.text import fingerprint, lang_id, text_stats, token_counts


def _df(spark, *texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def test_lang_id_markers(spark):
    df = _df(
        spark,
        "the cat and the dog in a house",   # en
        "le chat et la maison dans le jardin",  # fr
        "xyzzy qwerty",                      # no markers -> und
    )
    out = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert out[0] == "en"
    assert out[1] == "fr"
    assert out[2] == "und"


def test_text_stats_values(spark):
    df = _df(spark, "the cat sat")
    r = text_stats(df).collect()[0]
    assert r.n_words == 3
    assert abs(r.avg_word_len - 3.0) < 1e-9
    assert r.punct_ratio == 0.0
    assert abs(r.stopword_ratio - 1 / 3) < 1e-6
    assert abs(r.quality_score - 0.03) < 1e-9


def test_token_counts(spark):
    df = _df(spark, "hello, world! 42")
    r = token_counts(df).collect()[0]
    assert r.ws_tokens == 3
    # hello , world ! 42
    assert r.re_tokens == 5
    assert r.approx_tokens == 4  # ceil(16/4)


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = _df(spark, "Hello  World", "hello world", "different")
    rows = fingerprint(df).collect()
    fp = {r.doc_id: r.md5_fingerprint for r in rows}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_chunk_documents_overlap_and_short_docs(spark):
    from mover_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "a" * 500), (2, "xy"), (3, "")], "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk_chars=200, stride=150).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    # 500 chars, stride 150 -> starts 1,151,301,451 = 4 chunks
    assert len(by_doc[1]) == 4
    c = dict(by_doc[1])
    assert len(c[0]) == 200 and len(c[3]) == 50
    assert c[0][-50:] == c[1][:50]  # 50-char overlap between neighbors
    assert by_doc[2] == [(0, "xy")]  # shorter than one chunk
    assert by_doc[3] == [(0, "")]   # empty doc still yields one (empty) chunk


def test_token_packing_spans_and_conserves(spark):
    from pyspark.sql import functions as F

    from mover_spark.operators.text import pack_by_token_budget

    docs = [(i, " ".join(["w"] * n)) for i, n in enumerate([400, 900, 50, 700, 1200, 10])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pack_by_token_budget(df, budget=1000).collect()
    # total tokens conserved across bins
    assert sum(r.bin_tokens for r in out) == sum(n for _, n in [(i, n) for i, n in enumerate([400, 900, 50, 700, 1200, 10])])
    # bins assigned by cumulative position: doc0(400)->bin0, doc1(900 at cum 400)->bin0, ...
    first = {r.bin: r.first_doc for r in out}
    assert first[0] == 0
    # cum-before per doc: 0,400,1300,1350,2050,3250 -> bins 0,0,1,1,2,3; the
    # 1200-token doc lands in bin 2 even though it exceeds the budget
    bins = {r.bin: r.n_docs for r in out}
    assert bins == {0: 2, 1: 2, 2: 1, 3: 1}


def test_repetition_stats_constructed(spark):
    """Hand-computable repetition signals: 'a a a b' -> top word 3/4,
    dup words 1 - 2/4, 2-grams [aa,aa,ab] -> 1 - 2/3; single-word doc has
    no 2-grams (null)."""
    from mover_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "x")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[1].n_words == 4
    assert got[1].top_word_frac == 0.75
    assert got[1].dup_word_frac == 0.5
    assert got[1].dup_2gram_frac == round(1 - 2 / 3, 6)
    assert got[2].n_words == 1 and got[2].top_word_frac == 1.0
    assert got[2].dup_2gram_frac is None


def test_collocation_pmi_hand_computed(spark):
    """PMI on a corpus small enough to verify by hand: 'b c' is a perfect
    collocation (b always precedes c), 'a a' is anti-correlated filler.
    Also pins the edge rules: single-word docs contribute unigrams but no
    bigrams, empty tokens are dropped, min_count prunes rare pairs."""
    import math

    from mover_spark.operators.text import collocation_pmi

    docs = spark.createDataFrame(
        [(1, "b c a b c"), (2, "a  b c"), (3, "a a b c"), (4, "a")],
        "doc_id long, text string",
    )
    # unigrams: a=5, b=4, c=4 -> n_uni=13; bigrams (per doc, adjacent):
    # d1: (b,c)(c,a)(a,b)(b,c)  d2: (a,b)(b,c)  d3: (a,a)(a,b)(b,c)
    # -> n_bi=9; counts: (b,c)=4 (a,b)=3 (c,a)=1 (a,a)=1
    got = {(r.w1, r.w2): r for r in collocation_pmi(docs, k=10, min_count=2).collect()}
    assert set(got) == {("b", "c"), ("a", "b")}
    assert got[("b", "c")].n_pair == 4
    assert got[("b", "c")].pmi == round(math.log((4 / 9) / ((4 / 13) * (4 / 13))), 6)
    assert got[("a", "b")].pmi == round(math.log((3 / 9) / ((5 / 13) * (4 / 13))), 6)

    # ordering + k: top-1 is the highest-PMI pair
    top = collocation_pmi(docs, k=1, min_count=1).collect()
    assert (top[0].w1, top[0].w2) == ("b", "c")

    # top-k plans as TakeOrderedAndProject (heap), never a global sort
    plan = collocation_pmi(docs, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_unigram_xent_hand_computed(spark):
    """Cross-entropy on a countable corpus: repeated common words score
    LOW (predictable), a doc of corpus-rare words scores HIGH; values
    match the quantized-integer formula exactly and empty tokens drop."""
    import math

    from mover_spark.operators.text import unigram_xent

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a a b  b"), (3, "c d")],
        "doc_id long, text string",
    )
    # corpus counts: a=6, b=2, c=1, d=1 -> N=10
    got = {r.doc_id: r for r in unigram_xent(docs).collect()}

    def lp(c, n=10):
        return round(math.log(c / n) * 1e9)

    assert got[1].n_tokens == 4
    assert got[1].xent == round(-((4 * lp(6)) / 4) / 1e9, 6)
    assert got[2].n_tokens == 4  # the double space contributes no token
    assert got[2].xent == round(-((2 * lp(6) + 2 * lp(2)) / 4) / 1e9, 6)
    assert got[3].xent == round(-((lp(1) + lp(1)) / 2) / 1e9, 6)
    # rare-word doc is the most surprising, boilerplate the least
    assert got[3].xent > got[2].xent > got[1].xent


def test_doc_novelty_hand_computed(spark):
    """Novelty = fraction of a doc's distinct bigrams with corpus df 1:
    a fully-templated copy scores 0, fresh content scores 1, and
    single-word docs vanish (no bigrams)."""
    from mover_spark.operators.text import doc_novelty

    docs = spark.createDataFrame(
        [
            (1, "x y z"),          # bigrams: "x y", "y z"
            (2, "x y z"),          # exact copy -> df 2 for both
            (3, "x y fresh one"),  # "x y" df 3; "y fresh", "fresh one" df 1
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in doc_novelty(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].novelty == 0.0 and got[2].novelty == 0.0
    assert got[3].n_shingles == 3
    assert got[3].novelty == round(2 / 3, 6)


def test_cap_per_key_deterministic_and_capped(spark, catalog):
    """Quota sampling keeps <= n per key and the SAME rows regardless of
    physical partitioning."""
    from mover_spark.operators.sampling import cap_per_key

    docs = catalog.df("documents")
    a = {r.doc_id for r in cap_per_key(docs, "source", 5, "doc_id").collect()}
    b = {
        r.doc_id
        for r in cap_per_key(docs.repartition(13), "source", 5, "doc_id").collect()
    }
    assert a == b
    per_src = (
        cap_per_key(docs, "source", 5, "doc_id")
        .groupBy("source")
        .count()
        .collect()
    )
    assert all(r["count"] <= 5 for r in per_src)


def test_redact_pii_patterns(spark):
    from mover_spark.operators.text import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.io thanks"),
            (2, "ssn 123-45-6789 phone +1 555 123 4567"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert got[1].n_email == 1 and "[EMAIL]" in got[1].clean_text
    assert "jo.doe" not in got[1].clean_text
    # SSN is claimed by the SSN pattern, not the looser phone pattern
    assert got[2].n_ssn == 1 and "[SSN]" in got[2].clean_text
    assert got[2].n_phone >= 1 and "[PHONE]" in got[2].clean_text
    assert "123-45-6789" not in got[2].clean_text
    assert got[3].clean_text == "nothing here"


def test_decontaminate_drops_overlaps_only(spark):
    from mover_spark.operators.text import decontaminate

    eval_set = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "x alpha beta gamma y"),   # shares 3-gram "alpha beta gamma"
            (2, "alpha beta x gamma y"),   # max shared run is 2 words: kept
            (3, "totally unrelated words here"),
            (4, "hi"),                     # shorter than n: kept, no shingles
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in decontaminate(train, eval_set, n=3).collect()}
    assert kept == {2, 3, 4}


def test_tfidf_rare_term_wins(spark):
    from mover_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common rare rare"),
            (2, "common common common"),
            (3, "common other other"),
        ],
        "doc_id long, text string",
    )
    top1 = {
        r.doc_id: r.term
        for r in tfidf_top_terms(docs, k=1).collect()
    }
    # "rare" appears in 1/3 docs -> highest idf beats the frequent "common"
    assert top1[1] == "rare"
    assert top1[2] == "common"
    assert top1[3] == "other"


def test_tfidf_topk_is_per_doc(catalog):
    from mover_spark.operators.text import tfidf_top_terms

    out = tfidf_top_terms(catalog.df("documents"), k=3)
    from pyspark.sql import functions as F

    per_doc = out.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert per_doc <= 3


def test_repetition_stats_empty_tokens(spark):
    """ADVICE r2: runs of spaces split into '' tokens; both the word pass
    and the 2-gram pass must drop them. 'a  b' has words [a, b] but NO
    2-gram (both raw pairs contain an empty component)."""
    from mover_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a  b"), (2, " x x "), (3, "p q p q")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}

    assert rows[1].n_words == 2
    assert rows[1].dup_2gram_frac is None  # no valid 2-grams survive

    # ' x x ' -> words [x, x]; raw pairs ('',x),(x,x),(x,'') -> one gram
    assert rows[2].n_words == 2
    assert rows[2].top_word_frac == 1.0
    assert rows[2].dup_2gram_frac == 0.0

    assert rows[3].n_words == 4
    assert rows[3].dup_2gram_frac == round(1.0 - 2.0 / 3.0, 6)  # p q, q p, p q


def test_text_stats_unicode_and_empty_tokens(spark):
    """CJK/accented letters are NOT punctuation; consecutive spaces don't
    create phantom words; all-space text yields NULL ratios, not a crash."""
    from mover_spark.operators.text import text_stats

    df = spark.createDataFrame(
        [(1, "你好 世界"), (2, "héllo  wörld"), (3, "   "), (4, "a!! b??")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text_stats(df).collect()}
    assert out[1].punct_ratio == 0.0 and out[1].n_words == 2
    assert out[2].n_words == 2 and out[2].punct_ratio == 0.0
    assert out[2].avg_word_len == 5.0
    assert out[3].n_words == 0 and out[3].avg_word_len is None
    assert abs(out[4].punct_ratio - 4 / 7) < 1e-6


def test_redact_pii_ordered_counts_reconcile(spark):
    """An SSN span must count as SSN only — the phone pattern sees the
    already-redacted text, so audit counts equal tokens written."""
    from mover_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "ssn 123-45-6789 call +1 555 123 4567 mail a@b.co")],
        "doc_id long, text string",
    )
    r = redact_pii(df).collect()[0]
    assert (r.n_email, r.n_ssn, r.n_phone) == (1, 1, 1)
    assert r.clean_text.count("[SSN]") == 1
    assert r.clean_text.count("[PHONE]") == 1
    assert r.clean_text.count("[EMAIL]") == 1


def test_token_packing_string_ids(spark):
    """String doc ids bucket through the monotone byte-prefix proxy —
    the numeric-only percentile path used to throw on them — and produce
    the same bins as the numeric-id ordering."""
    from mover_spark.operators.text import pack_by_token_budget

    sizes = [400, 900, 50, 700, 1200, 10]
    docs = [(f"doc-{i:04d}", " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = pack_by_token_budget(df, budget=1000).collect()
    assert sum(r.bin_tokens for r in out) == sum(sizes)
    bins = {r.bin: r.n_docs for r in out}
    assert bins == {0: 2, 1: 2, 2: 1, 3: 1}


def test_source_drift_kl_hand_computed(spark):
    """Smoothed KL on a countable corpus: the off-distribution source
    scores strictly higher than the typical ones, values match the
    quantized formula, and KL stays >= 0 (both sides are proper
    add-one-smoothed distributions)."""
    import math

    from mover_spark.operators.text import source_drift_kl

    docs = spark.createDataFrame(
        [
            (1, "s1", "a b a b"),
            (2, "s1", "a b"),
            (3, "s2", "a b a b a b"),
            (4, "s3", "z z z z z z"),  # drifted: vocabulary nobody else uses
        ],
        "doc_id long, source string, text string",
    )
    got = {r.source: r for r in source_drift_kl(docs).collect()}

    # corpus: a=6, b=6, z=6 -> N=18, V=3
    cnt = {"s1": {"a": 3, "b": 3}, "s2": {"a": 3, "b": 3}, "s3": {"z": 6}}
    tot = {"a": 6, "b": 6, "z": 6}

    def kl(src):
        n_s = sum(cnt[src].values())
        s = 0
        for t in tot:
            ps = (cnt[src].get(t, 0) + 1) / (n_s + 3)
            pc = (tot[t] + 1) / (18 + 3)
            s += round(ps * math.log(ps / pc) * 1e12)
        return round(s / 1e12, 6)

    for src in ("s1", "s2", "s3"):
        assert got[src].kl_nats == kl(src), src
        assert got[src].kl_nats >= 0
    assert got[src := "s3"].kl_nats > got["s1"].kl_nats
    assert got["s1"].n_tokens == 6 and got["s3"].n_tokens == 6
