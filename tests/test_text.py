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
