"""Small parity helpers."""

from __future__ import annotations

import re


def md5_i64(col, chars: int = 15):
    """Engine-portable 60-bit hash: the first 15 hex chars of md5 as int64.

    The value is identical in DuckDB via
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT`` — unlike
    Spark-internal ``xxhash64``, which no other engine implements. 15 hex
    chars = 60 bits keeps the value strictly positive and far inside int64,
    so no signedness games on either side. All JVM-side (md5/substring/conv
    are codegen'd built-ins)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, chars), 16, 10).cast("long")


#: DuckDB rendering of md5_i64 for oracle SQL strings
MD5_I64_SQL = "('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 15))::BIGINT"

#: table-name sniffing from a seed query — same regex as the reference
#: (/root/reference/etl/util.go:19); documentedly fails on subqueries and
#: quoted names (etl/util_test.go:9-13), so prefer an explicit -table arg.
QUERY_TABLE_RE = re.compile(
    r"^SELECT (?P<columns>.*[^T]) FROM (?P<table>\w+).*", re.IGNORECASE
)


def get_query_table(query: str) -> str:
    """Extract the target table from a seed SELECT (etl/util.go:38-46)."""
    m = QUERY_TABLE_RE.match(query.strip())
    if not m:
        raise ValueError(f"unable to retrieve table name from query: {query!r}")
    return m.group("table")
