"""Small parity helpers."""

from __future__ import annotations

import re

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
