"""PII sanitization compiled to Spark column expressions.

Reference behavior (/root/reference/etl/sanitizer.go):
- precedence per column: Replace > Fake > Sanitize (sanitizer.go:95-108)
- Replace: template with `{attr}` substituted from the row (sanitizer.go:110-124)
- Fake: faker value from {last_name, first_name, email, street_address,
  phone_number}, locale-aware, 'fr' wired (sanitizer.go:22-24,66-93)
- Sanitize: NULL-out (sanitizer.go:102-104)
- Unique: re-roll until unseen via an in-memory seen-set (sanitizer.go:80-90)
- rows PK-deduped across result sets before transform (sanitizer.go:38-64)

Spark re-design: everything is a vectorized column expression — no UDFs, no
driver state. Fakes are DETERMINISTIC (pool lookup indexed by pk % pool size)
where the reference is random per run; determinism makes the transform
oracle-checkable and idempotent. Uniqueness is by construction (PK suffix)
instead of the reference's unbounded retry loop — collision-free at any scale
and embarrassingly parallel.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ATTR_RE = re.compile(r"\{(?P<attr>\w+)\}")

# Deterministic fake pools (public sample names; any list works — the contract
# is only "plausible fake value", sanitizer.go:66-78). Default locale is
# English-flavored; the 'fr' locale (the only one the reference wires,
# sanitizer.go:22-30) swaps in French pools below.
FAKE_POOLS: dict[str, list[str]] = {
    "last_name": ["Smith", "Johnson", "Williams", "Brown", "Jones", "Miller", "Davis", "Wilson"],
    "first_name": ["Mary", "John", "Luke", "Anna", "Paul", "Claire", "Lewis", "Emma"],
    "email_local": ["alex", "sam", "jo", "max", "kim", "lee", "ray", "pat"],
    "street": ["Main Street", "Oak Avenue", "Maple Drive", "Park Road"],
}

# 'fr' locale pools (reference wires faker locale 'fr', sanitizer.go:22-24)
FR_POOLS: dict[str, list[str]] = {
    "last_name": ["Martin", "Bernard", "Dubois", "Thomas", "Robert", "Richard", "Petit", "Durand"],
    "first_name": ["Marie", "Jean", "Luc", "Anne", "Pierre", "Camille", "Louis", "Emma"],
    "email_local": ["marie", "jean", "luc", "anne", "pierre", "camille", "louis", "emma"],
    "street": ["rue de la Paix", "avenue Victor Hugo", "boulevard Saint-Michel", "rue du Bac"],
}


@dataclass
class ColumnRule:
    """config.Column (config/config.go:30-37)."""

    name: str
    fake: str = ""
    unique: bool = False
    replace: str | None = None
    sanitize: bool = False
    download: dict | None = None


def compile_template(template: str, df: DataFrame) -> Column:
    """`{attr}` template -> concat() expression (sanitizer.go:110-124).

    Vectorized equivalent of replaceVar: attrs not present in the row pass
    through verbatim, string values substitute raw, non-strings via CAST to
    string (Go fmt %d/%v arms). NULL attr values substitute as '<nil>'
    (fmt %v of a nil interface) — without the coalesce, Spark's concat
    propagates the NULL through the WHOLE template, silently nulling the
    replaced column instead of substituting per-attr like the reference.
    """
    parts: list[Column] = []
    pos = 0
    for m in ATTR_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        attr = m.group("attr")
        if attr in df.columns:
            parts.append(F.coalesce(F.col(attr).cast("string"), F.lit("<nil>")))
        else:
            parts.append(F.lit(m.group(0)))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def _pool_pick(pool: list[str], key: Column) -> Column:
    """Deterministic pool lookup: pool[key % len] — pure JVM, no UDF.
    `key` must already be a nonnegative long (see _pk_index)."""
    arr = F.array(*[F.lit(x) for x in pool])
    idx = (F.pmod(key, F.lit(len(pool))) + 1).cast("int")
    return F.element_at(arr, idx)


def _pk_index(pk: Column, dtype: str) -> Column:
    """Nonnegative long index derived from the PK, for pool picking.

    Numeric PKs pass through raw: _pool_pick's F.pmod is a positive
    modulo, so pool[pmod(pk, n)] == pool[pk % n] for every nonnegative
    key the oracle checks, with no abs() (whose -2^63 corner overflows
    under ANSI). Non-numeric PKs (string / UUID — catalog.py's
    first-column fallback can hand us any type) hash through xxhash64:
    the old cast('long') gave NULL (or threw under ANSI), nulling every
    fake and silently breaking the uniqueness contract."""
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return pk.cast("long")
    return F.pmod(F.xxhash64(pk.cast("string")), F.lit((1 << 31) - 1))


def fake_column(
    kind: str,
    pk: Column,
    unique: bool = False,
    locale: str = "",
    key: Column | None = None,
    pk_dtype: str = "string",
) -> Column:
    """Deterministic fake value (sanitizer.go:66-93). Uniqueness by
    construction: suffix the PK instead of the reference's retry loop.
    `key` is the nonnegative long pick index; when omitted it is derived
    by _pk_index(pk, pk_dtype) — ONE pick scheme per column, chosen by
    the column's dtype exactly as sanitize_df does (direct callers with
    a numeric pk pass pk_dtype='bigint' to match). The previous per-row
    coalesce(try_cast, hash) default let a numeric-LOOKING string value
    ('123') take the numeric arm while sanitize_df hashed the whole
    column — two schemes per column and a direct-vs-sanitize_df desync;
    dtype branching restores the invariant."""
    if key is None:
        key = _pk_index(pk, pk_dtype)
    pools = FR_POOLS if locale == "fr" else FAKE_POOLS
    if kind == "last_name":
        out = _pool_pick(pools["last_name"], key)
    elif kind == "first_name":
        out = _pool_pick(pools["first_name"], key)
    elif kind == "email":
        out = F.concat(_pool_pick(pools["email_local"], key), F.lit("@example.org"))
        if unique:
            return F.concat(
                _pool_pick(pools["email_local"], key),
                F.lit("-"),
                pk.cast("string"),
                F.lit("@example.org"),
            )
    elif kind == "street_address":
        out = F.concat(
            (F.pmod(key, F.lit(99)) + 1).cast("string"),
            F.lit(" "),
            _pool_pick(pools["street"], key),
        )
    elif kind == "phone_number":
        prefix = "+33 6 " if locale == "fr" else "+1 555 "
        out = F.concat(F.lit(prefix), F.lpad(F.pmod(key, F.lit(99999999)).cast("string"), 8, "0"))
    else:  # unknown kind: reference leaves the value untouched
        return pk  # caller handles passthrough; see sanitize_df
    if unique and kind != "email":
        out = F.concat(out, F.lit("-"), pk.cast("string"))
    return out


def sanitize_df(
    df: DataFrame,
    rules: list[ColumnRule],
    primary_keys: list[str],
    locale: str = "",
    dedup: bool = True,
) -> DataFrame:
    """PK-dedup + column transforms (sanitizer.go:38-64,95-108)."""
    if dedup:
        df = df.dropDuplicates(primary_keys)

    def _pk_cols():
        # resolved lazily: only fake rules need a PK, and a caller with
        # no PK (primary_keys=[]) must still be able to replace/null-out
        if not primary_keys:
            raise ValueError(
                "fake rules need a primary key column to derive "
                "deterministic values from; primary_keys is empty"
            )
        pk = F.col(primary_keys[0])
        return pk, _pk_index(pk, dict(df.dtypes)[primary_keys[0]])

    known_fakes = {"last_name", "first_name", "email", "street_address", "phone_number"}
    for rule in rules:
        if rule.name not in df.columns:
            continue
        dtype = dict(df.dtypes)[rule.name]
        if rule.replace is not None:  # precedence: Replace first
            df = df.withColumn(rule.name, compile_template(rule.replace, df))
        elif rule.fake:
            if rule.fake in known_fakes:
                pk, key = _pk_cols()
                df = df.withColumn(
                    rule.name,
                    fake_column(
                        rule.fake, pk, unique=rule.unique, locale=locale, key=key
                    ),
                )
            # unknown fake kind: value untouched (sanitizer.go:67-78 switch default)
        elif rule.sanitize:
            df = df.withColumn(rule.name, F.lit(None).cast(dtype))
    return df
