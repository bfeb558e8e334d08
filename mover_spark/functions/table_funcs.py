"""User-defined TABLE and AGGREGATE functions — completing the extension
surface next to the pandas scalar UDFs and applyInPandas kernels used by
the dedup/similarity operators.

The reference's only extension point is the declarative column config
(config/config.go:30-37); a Spark engine exposes the full UDF/UDAF/UDTF
triad. Both examples below follow the repo's determinism discipline so
they stay oracle-checkable (arbitrary Python is allowed here — these show
the patterns that keep results engine-exact anyway).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf

#: fixed-point scale for the UDAF: small enough that the squared sums stay
#: below 2^53, so their double conversion (and hence the division) is exact
#: on every engine
_RMS_SCALE = 100


@udtf(returnType="win_idx: int, window_text: string")
class WordWindows:
    """UDTF: split a document into fixed-size word windows, one output row
    per window — the lateral-join table function (each input row expands to
    a variable number of output rows, something a scalar UDF can't do).
    Registered per-session via ``register_table_funcs``; used from SQL as
    ``... , LATERAL word_windows(text, 10)``."""

    def eval(self, text: str, size: int):
        if not size or size < 1:
            # a clear error instead of range()'s opaque ValueError on 0 /
            # silent zero rows on negatives / TypeError on NULL
            raise ValueError(f"word_windows: size must be >= 1, got {size!r}")
        words = (text or "").split(" ")
        for i in range(0, len(words), size):
            yield i // size, " ".join(words[i : i + size])


@pandas_udf("double")
def quantized_rms(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF): root-mean-square of a value
    column. Determinism: values quantize to int64 (scale 100) and the
    SQUARED integer sum accumulates in arbitrary-precision Python ints —
    exact in any accumulation order AND immune to int64 wrap (|value|
    over ~3e7 squared exceeds int64; a wrapped negative sum would feed
    sqrt a negative and kill the job, or worse return a plausible wrong
    RMS). NULLs skip, like every SQL aggregate."""
    import numpy as np

    vals = v.to_numpy(dtype="float64")
    vals = vals[~np.isnan(vals)]
    q = np.floor(np.abs(vals) * _RMS_SCALE + 0.5).astype("int64")
    s = int((q.astype(object) * q.astype(object)).sum())
    n = len(q)
    if n == 0:
        return None
    # math.sqrt (not ** 0.5): pow(x, 0.5) is not guaranteed to equal the
    # correctly-rounded sqrt in the last ulp, SQL SQRT is
    import math

    return math.sqrt(s / n) / _RMS_SCALE


def register_table_funcs(spark) -> None:
    """Make the UDTF callable from SQL (idempotent)."""
    spark.udtf.register("word_windows", WordWindows)
