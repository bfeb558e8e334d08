"""Property tests for the engine-portable hash contract.

Every oracle-checked query that hashes rows relies on Spark and DuckDB
computing IDENTICAL hash values from identical inputs. These tests pin
that contract without a JVM: a pure-Python mirror of each hash runs
against the DuckDB SQL rendering over hypothesis-generated inputs, so a
drift in either formula (or a DuckDB behavior change) fails here first,
in milliseconds, instead of as an opaque value-hash mismatch at sf0.01.
"""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from mover_spark.util import MD5_I64_SQL, MIX31_A, MIX31_B, MIX31_P, MIX31_SQL


def _py_mix31(x: int) -> int:
    return ((x % MIX31_P) * MIX31_A + MIX31_B) % MIX31_P


def _py_md5_i64(s: str, chars: int = 15) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:chars], 16)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**62))
def test_mix31_matches_duckdb(x):
    con = duckdb.connect()
    got = con.sql(f"SELECT {MIX31_SQL.format(x=x)}").fetchone()[0]
    con.close()
    assert got == _py_mix31(x)
    assert 0 <= got < MIX31_P


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="'\x00"), max_size=40))
def test_md5_i64_matches_duckdb(s):
    con = duckdb.connect()
    got = con.sql(
        "SELECT " + MD5_I64_SQL.format(x=f"'{s}'")
    ).fetchone()[0]
    con.close()
    assert got == _py_md5_i64(s)
    assert 0 <= got < (1 << 60)


def test_mix31_bijective_on_dense_range():
    """Affine mod a prime permutes [0, p): no collisions for ids < 2^31 —
    the property that makes the KMV k-minimum set collision-free."""
    seen = {_py_mix31(x) for x in range(100_000)}
    assert len(seen) == 100_000
