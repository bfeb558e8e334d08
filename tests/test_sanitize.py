"""Sanitizer tests — ports the reference's only real unit test
(/root/reference/etl/sanitizer_test.go:10-47) plus the fake/unique family."""

from pyspark.sql import functions as F

from mover_spark.operators.sanitize import ColumnRule, sanitize_df


def _user_df(spark):
    return spark.createDataFrame(
        [(1, "thoas", "Florent Messa", "florent@secret.com", "hunter2")],
        "id long, username string, name string, email string, password string",
    )


def test_reference_sanitize_values(spark):
    """sanitizer_test.go:44-46: name->{username}, email->ulule-{id}@ulule.com,
    password->NULL."""
    rules = [
        ColumnRule("name", replace="{username}"),
        ColumnRule("email", replace="ulule-{id}@ulule.com"),
        ColumnRule("password", sanitize=True),
    ]
    row = sanitize_df(_user_df(spark), rules, ["id"]).collect()[0]
    assert row.name == "thoas"
    assert row.email == "ulule-1@ulule.com"
    assert row.password is None
    assert row.username == "thoas"  # untouched


def test_replace_precedence_over_fake_and_sanitize(spark):
    """Precedence Replace > Fake > Sanitize (sanitizer.go:95-108)."""
    rules = [ColumnRule("email", fake="email", sanitize=True, replace="x-{id}")]
    row = sanitize_df(_user_df(spark), rules, ["id"]).collect()[0]
    assert row.email == "x-1"


def test_fake_deterministic_and_unique(spark):
    df = spark.createDataFrame([(i, "e") for i in range(20)], "id long, email string")
    rules = [ColumnRule("email", fake="email", unique=True)]
    out = sanitize_df(df, rules, ["id"]).collect()
    emails = [r.email for r in out]
    assert len(set(emails)) == 20  # unique by construction
    # deterministic across runs
    out2 = sanitize_df(df, rules, ["id"]).collect()
    assert emails == [r.email for r in out2]
    assert all("@" in e for e in emails)


def test_fake_kinds(spark):
    df = spark.createDataFrame(
        [(7, "a", "b", "c", "d")],
        "id long, ln string, fn string, addr string, phone string",
    )
    rules = [
        ColumnRule("ln", fake="last_name"),
        ColumnRule("fn", fake="first_name"),
        ColumnRule("addr", fake="street_address"),
        ColumnRule("phone", fake="phone_number"),
    ]
    row = sanitize_df(df, rules, ["id"]).collect()[0]
    assert row.ln and row.ln != "a"
    assert row.fn and row.fn != "b"
    assert row.addr[0].isdigit()
    assert row.phone.startswith("+1 555")


def test_fake_locale_fr(spark):
    """'fr' locale swaps in the French pools (sanitizer.go:22-30): same
    deterministic scheme, different values from the default locale."""
    from mover_spark.operators.sanitize import FAKE_POOLS, FR_POOLS

    assert FR_POOLS is not FAKE_POOLS
    df = spark.createDataFrame(
        [(7, "a", "b")], "id long, ln string, phone string"
    )
    rules = [ColumnRule("ln", fake="last_name"), ColumnRule("phone", fake="phone_number")]
    fr = sanitize_df(df, rules, ["id"], locale="fr").collect()[0]
    en = sanitize_df(df, rules, ["id"]).collect()[0]
    assert fr.ln in FR_POOLS["last_name"] and en.ln in FAKE_POOLS["last_name"]
    assert fr.ln != en.ln
    assert fr.phone.startswith("+33") and en.phone.startswith("+1")


def test_unknown_template_attr_passthrough(spark):
    """Attrs absent from the row stay verbatim (replaceVar only substitutes
    known keys, sanitizer.go:110-124)."""
    rules = [ColumnRule("name", replace="{nope}-{id}")]
    row = sanitize_df(_user_df(spark), rules, ["id"]).collect()[0]
    assert row.name == "{nope}-1"


def test_pk_dedup(spark):
    df = _user_df(spark)
    doubled = df.unionByName(df)
    out = sanitize_df(doubled, [], ["id"])
    assert out.count() == 1


def test_sanitize_null_keeps_dtype(spark):
    df = spark.createDataFrame([(1, 2.5)], "id long, bal double")
    out = sanitize_df(df, [ColumnRule("bal", sanitize=True)], ["id"])
    assert dict(out.dtypes)["bal"] == "double"
    assert out.collect()[0].bal is None


def test_template_null_attr_substitutes_nil(spark):
    """A NULL attribute substitutes as '<nil>' (Go fmt %v of nil), not
    nulling the entire replaced string via concat propagation."""
    from mover_spark.operators.sanitize import ColumnRule, sanitize_df

    df = spark.createDataFrame(
        [(1, None, "x"), (2, "bob", "y")], "id long, name string, c string"
    )
    out = {
        r.id: r.c
        for r in sanitize_df(
            df, [ColumnRule("c", replace="user-{id}-{name}")], ["id"]
        ).collect()
    }
    assert out == {1: "user-1-<nil>", 2: "user-2-bob"}


def test_fake_with_string_pk(spark):
    """Non-numeric PKs hash to a pick index — the old cast('long') nulled
    every fake (or threw under ANSI), breaking uniqueness silently."""
    from mover_spark.operators.sanitize import ColumnRule, sanitize_df

    df = spark.createDataFrame(
        [("u-a", "x"), ("u-b", "y")], "uid string, email string"
    )
    rows = sanitize_df(
        df, [ColumnRule("email", fake="email", unique=True)], ["uid"]
    ).collect()
    vals = {r.email for r in rows}
    assert all(v and v.endswith("@example.org") for v in vals)
    assert len(vals) == 2  # unique by PK-suffix construction


def test_no_pk_needed_for_replace_and_nullout(spark):
    """primary_keys=[] must work when no fake rule needs a PK."""
    from mover_spark.operators.sanitize import ColumnRule, sanitize_df

    df = spark.createDataFrame([(1, "s", "t")], "id long, a string, b string")
    out = sanitize_df(
        df,
        [ColumnRule("a", sanitize=True), ColumnRule("b", replace="z")],
        [],
        dedup=False,
    ).collect()[0]
    assert out.a is None and out.b == "z"


def test_fake_column_direct_string_pk_defaults(spark):
    """Direct fake_column call (no key=) with a string pk: the default
    key must route through the hash fallback, not cast('long') — which
    nulled the pick (or threw under ANSI)."""
    from pyspark.sql import functions as F

    from mover_spark.operators.sanitize import fake_column

    df = spark.createDataFrame([("u-a",), ("u-b",)], "uid string")
    rows = df.select(
        fake_column("email", F.col("uid"), unique=True).alias("e")
    ).collect()
    vals = {r.e for r in rows}
    assert all(v and v.endswith("@example.org") for v in vals)
    assert len(vals) == 2


def test_fake_column_one_pick_scheme_per_column(spark):
    """A numeric-LOOKING string pk ('123') must use the SAME hash-arm pick
    as every other value in a string column — and the same pick sanitize_df
    derives from the catalog dtype. The old per-row coalesce(try_cast, hash)
    default sent '123' down the numeric arm, splitting one column across
    two pick schemes."""
    from pyspark.sql import functions as F

    from mover_spark.operators.sanitize import _pk_index, fake_column

    df = spark.createDataFrame([("123",), ("u-b",)], "uid string")
    got = df.select(
        F.col("uid"),
        fake_column("first_name", F.col("uid")).alias("direct"),
        fake_column(
            "first_name", F.col("uid"), key=_pk_index(F.col("uid"), "string")
        ).alias("via_dtype"),
    ).collect()
    for r in got:
        assert r.direct == r.via_dtype, r
