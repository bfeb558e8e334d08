"""Streaming quality gate: score every arriving document's unigram
cross-entropy against a STATIC corpus language model and flag the ones
that pass — the online form of the perplexity-proxy filter
(operators/text.py:unigram_xent), for gating a live crawl before it ever
lands in the corpus.

Design for streaming:
- The LM is tiny relative to the corpus (one row per vocabulary term),
  so it ships as a LITERAL MAP inside the scoring expression — the
  stream side is then PURE in-row arithmetic: no stream-static join, no
  aggregation, no watermark, no state store. Stateless append mode; a
  micro-batch of any size scores at scan speed.
- A vocabulary too large to inline (cap guarded below) needs the batch
  form's explode + join + aggregate instead — that form requires a
  watermarked aggregation in streaming; raising loudly beats silently
  building a 10M-entry expression tree.
- Scores are the SAME quantized-integer formulation as unigram_xent
  (term log-prob rounded once to a 1e-9-grain BIGINT, integer sums), so
  the drained result hash-matches a pure-SQL oracle. Out-of-vocabulary
  terms take the floor log-prob ln(1/N) — deterministic, mirrored in
  the oracle's COALESCE.

The corpus/stream split follows streaming/neardup.py's convention:
doc_id % STREAM_MOD == 0 streams in, the rest is the static corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .neardup import STREAM_MOD, read_documents_stream

#: literal-map guard: above this the scoring expression stops being a
#: reasonable plan constant and the explode+join form is the right tool
VOCAB_CAP = 100_000

#: gate threshold in nats; the fixture vocabulary is ~40 uniform-ish
#: words (ln 40 ~ 3.69), so 3.75 splits typical from surprising docs
XENT_GATE = 3.75


def _round_half_away(x: float) -> int:
    """Python's round() is banker's rounding; Spark ROUND and DuckDB
    ROUND are half-away-from-zero. The LM values must quantize the way
    the SQL oracle does."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def corpus_lm(corpus: DataFrame, text_col: str = "text") -> tuple[dict, int]:
    """(term -> quantized log-prob, oov log-prob) from the static corpus.
    One count aggregate; the collect is vocabulary-sized and guarded.
    Quantization happens driver-side in Python, which shares libm with
    DuckDB on this platform — the oracle recomputes ln() bit-identically;
    JVM Math.log is deliberately NOT in the loop."""
    cnt = (
        corpus.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = cnt.limit(VOCAB_CAP + 1).collect()
    if len(rows) > VOCAB_CAP:
        raise ValueError(
            f"corpus vocabulary exceeds VOCAB_CAP={VOCAB_CAP}: the literal-map "
            "stream scorer is the small-vocab fast path; use the batch "
            "unigram_xent explode+join form (with a watermarked aggregation "
            "for streams) instead"
        )
    n = sum(r.c for r in rows)
    if n == 0:
        return {}, 0
    lm = {r.term: _round_half_away(math.log(r.c / n) * 1e9) for r in rows}
    return lm, _round_half_away(math.log(1.0 / n) * 1e9)


def xent_gate_stream(
    stream_docs: DataFrame, lm: dict, oov: int, gate: float = XENT_GATE
) -> DataFrame:
    """(doc_id, n_tokens, xent, passed) per stream document — stateless
    in-row scoring against the literal LM map. Documents with zero
    non-empty tokens are dropped (undefined score), matching the batch
    operator."""
    entries = []
    for t, v in sorted(lm.items()):
        entries.append(F.lit(t))
        entries.append(F.lit(v))
    # an empty LM degenerates cleanly: element_at on the empty map is NULL
    # for every key, so coalesce scores everything at the OOV floor
    m = F.create_map(*entries)
    # bind the token array to a column ONCE: referencing the split+filter
    # expression from both size() and aggregate() would tokenize each
    # document twice per row
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(F.col("__toks"))
    s = F.aggregate(
        F.col("__toks"),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.coalesce(F.element_at(m, t), F.lit(oov)),
    )
    xent = F.round(-(s.cast("double") / n.cast("double")) / F.lit(1e9), 6)
    return (
        stream_docs.select(F.col("doc_id"), toks.alias("__toks"))
        .select(
            "doc_id",
            n.cast("bigint").alias("n_tokens"),
            xent.alias("xent"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("passed", F.col("xent") <= F.lit(gate))
    )


_DRAIN_SEQ = [0]


def quality_gate_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the gate with availableNow and return the result batch
    DataFrame — the driver-contract entry, hash-checked against the SQL
    mirror (static-corpus LM + left-join-scored stream docs)."""
    from mover_spark.catalog import Catalog
    from mover_spark.streaming.events import run_to_memory

    docs = Catalog(spark, sf_dir).df("documents")
    lm, oov = corpus_lm(docs.where(F.col("doc_id") % STREAM_MOD != 0))
    stream = read_documents_stream(spark, sf_dir).where(
        F.col("doc_id") % STREAM_MOD == 0
    )
    _DRAIN_SEQ[0] += 1
    name = f"quality_gate_{_DRAIN_SEQ[0]}"
    run_to_memory(
        xent_gate_stream(stream, lm, oov),
        name,
        # stateless in-row scoring: no keyed state, the default small-drain
        # partition floor applies (see run_to_memory)
        output_mode="append",
    )
    from mover_spark.streaming.events import drained_table

    return drained_table(spark, name)
