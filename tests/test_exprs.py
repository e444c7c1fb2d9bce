"""Expression-language unit tests for the surfaces the parquet fixtures
don't exercise: ANY/ALL quantified comparisons, container ops, FILTER,
XOR/NOT, casts, hashing (SURVEY §2.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.functions.exprs import E


@pytest.fixture(scope="module")
def nested(spark):
    rows = [
        (1, ["a", "b", "c"], [1.0, 50.0, 99.0], {"color": "red", "size": "L"}, True, -5, None),
        (2, ["b"], [10.0], {"color": "blue"}, False, 3, "x"),
        (3, [], [], {}, None, 0, "y"),
        (4, ["spark", "fast"], [75.0, 80.0], {"origin": "eu"}, True, -2, None),
    ]
    return spark.createDataFrame(
        rows, "rec_id int, tags array<string>, scores array<double>, attrs map<string,string>, flag boolean, small_int int, maybe_null string"
    )


def _vals(df, col_expr, alias="v"):
    return {r["rec_id"]: r[alias] for r in df.select("rec_id", col_expr.col().alias(alias)).collect()}


def test_any_all_quantifiers(nested):
    # > ANY: any score above 60
    got = _vals(nested, E.any(">", E.v(60.0), E.f("scores")))
    # 60 > any score (note operand order: left cmp element)
    assert got == {1: True, 2: True, 3: False, 4: False}
    got = _vals(nested, E.all("<", E.v(0.0), E.f("scores")))
    assert got == {1: True, 2: True, 3: True, 4: True}  # vacuous truth on empty
    got = _vals(nested, E.any("=", E.v("b"), E.f("tags")))
    assert got == {1: True, 2: True, 3: False, 4: False}


def test_container_ops(nested):
    assert _vals(nested, E.sizeof(E.f("tags"))) == {1: 3, 2: 1, 3: 0, 4: 2}
    assert _vals(nested, E.contains_key(E.f("attrs"), "color")) == {1: True, 2: True, 3: False, 4: False}
    assert _vals(nested, E.contains_value(E.f("attrs"), E.v("eu"))) == {1: False, 2: False, 3: False, 4: True}
    assert _vals(nested, E.in_list(E.v("spark"), E.f("tags"))) == {1: False, 2: False, 3: False, 4: True}
    assert _vals(nested, E.size_is(E.f("tags"), 1)) == {1: False, 2: True, 3: False, 4: False}


def test_list_filter_by_mask(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"], [True, False, True])],
        "rec_id int, xs array<string>, mask array<boolean>",
    )
    got = {r["rec_id"]: r["v"] for r in df.select("rec_id", E.list_filter(E.f("xs"), E.f("mask")).col().alias("v")).collect()}
    assert got == {1: ["a", "c"]}


def test_field_subaccess(spark):
    df = spark.createDataFrame(
        [(1, {"a": {"x": 10}}, [5, 6, 7])],
        "rec_id int, nested map<string,map<string,bigint>>, arr array<int>",
    )
    row = df.select(
        E.f("nested", key="a", subkey="x").col().alias("nx"),
        E.f("arr", index=0).col().alias("a0"),
    ).collect()[0]
    assert row["nx"] == 10 and row["a0"] == 5


def test_logic_and_null_tests(nested):
    assert _vals(nested, ~E.f("flag")) == {1: False, 2: True, 3: None, 4: False}
    assert _vals(nested, E.f("maybe_null").is_null()) == {1: True, 2: False, 3: False, 4: True}
    xor = _vals(nested, E.f("flag") ^ (E.f("small_int") > 0))
    assert xor == {1: True, 2: True, 3: None, 4: True}


def test_abs_cast_hash_rlike(nested):
    assert _vals(nested, E.abs(E.f("small_int"))) == {1: 5, 2: 3, 3: 0, 4: 2}
    assert _vals(nested, E.f("small_int").cast("string")) == {1: "-5", 2: "3", 3: "0", 4: "-2"}
    hashes = _vals(nested, E.hash(E.f("rec_id").cast("string")))
    assert len(set(hashes.values())) == 4  # distinct, deterministic
    # RLIKE is a regex search: pattern 'a' hits "sparkling" too
    assert _vals(nested, E.rlike_any(E.v("sparkling"), E.f("tags"))) == {
        1: True, 2: False, 3: False, 4: True,
    }


def test_not_in_not_between(nested):
    assert _vals(nested, E.not_in(E.f("rec_id"), 1, 3)) == {1: False, 2: True, 3: False, 4: True}
    assert _vals(nested, E.not_between(E.f("small_int"), 0, 5)) == {1: True, 2: False, 3: False, 4: True}


def test_iff_concat_substring(nested):
    assert _vals(nested, E.iff(E.f("small_int") < 0, "neg", "nonneg")) == {
        1: "neg", 2: "nonneg", 3: "nonneg", 4: "neg",
    }
    assert _vals(nested, E.concat(E.v("r"), E.f("rec_id").cast("string"))) == {
        1: "r1", 2: "r2", 3: "r3", 4: "r4",
    }
    assert _vals(nested, E.substring(E.v("abcdef"), 2, 3)) == {i: "bcd" for i in (1, 2, 3, 4)}


def test_in_with_non_literal_operands(nested):
    # IN lists containing fields / computed expressions must compile the
    # general OR-chain, not silently drop non-literal operands
    from bullet_spark_spark.functions.exprs import NAry

    got = _vals(nested, E.f("rec_id").isin(1, E.f("small_int")))
    assert got == {1: True, 2: False, 3: False, 4: False}
    got = _vals(nested, NAry("IN", [E.f("small_int"), E.v(0), E.f("rec_id")]))
    assert got == {1: False, 2: False, 3: True, 4: False}
    got = _vals(nested, NAry("NOT IN", [E.f("small_int"), E.v(0), E.f("rec_id")]))
    assert got == {1: True, 2: True, 3: False, 4: True}


def test_sql_renderer_differential(nested):
    """Expr.sql() (the one-py4j-call fast path the dynamic multiplexer's
    routing compiler uses) must be semantically IDENTICAL to Expr.col():
    every expression family evaluated both ways over the nested fixture,
    row for row, nulls included."""
    exprs = [
        (E.f("small_int") + 2) * E.v(3) - E.f("rec_id") / E.v(2.0),
        -E.f("small_int"),
        E.f("rec_id") % 3,
        (E.f("small_int") > 0) & (E.f("flag") == True),  # noqa: E712
        (E.f("rec_id") >= 3) | ~(E.f("flag")),
        (E.f("rec_id") > 2) ^ (E.f("small_int") < 0),
        E.f("maybe_null").is_null(),
        E.f("maybe_null").is_not_null(),
        E.f("rec_id").isin(1, 3),
        E.not_in(E.f("rec_id"), 1, 3),
        E.f("rec_id").between(2, 3),
        E.not_between(E.f("rec_id"), 2, 3),
        E.f("tags", index=0),
        E.f("attrs", key="color"),
        E.any("=", E.f("tags", index=0), E.f("tags")),
        E.all(">", E.v(100.0), E.f("scores")),
        E.contains_key(E.f("attrs"), "color"),
        E.contains_value(E.f("attrs"), "red"),
        E.in_list(E.v("b"), E.f("tags")),
        E.sizeof(E.f("tags")),
        E.size_is(E.f("tags"), 1),
        E.strlen(E.f("maybe_null")),
        E.lower(E.f("maybe_null")),
        E.upper(E.f("maybe_null")),
        E.trim(E.f("maybe_null")),
        E.abs(E.f("small_int")),
        E.hash(E.f("rec_id")),
        E.f("maybe_null").rlike("^[xy]$"),
        E.rlike_any(E.f("maybe_null"), E.f("tags")),
        E.concat(E.f("maybe_null"), E.v("_"), E.f("rec_id").cast("string")),
        E.substring(E.f("maybe_null"), 1, 1),
        E.iff(E.f("rec_id") > 2, E.v("hi"), E.v("lo")),
        E.list_filter(E.f("tags"), E.raw("transform(tags, t -> t = 'b')")),
        E.f("rec_id").cast("double"),
        E.raw("rec_id * 2"),
    ]
    for e in exprs:
        sql_text = e.sql()
        got_col = _vals(nested, e)
        got_sql = {
            r["rec_id"]: r["v"]
            for r in nested.select("rec_id", F.expr(sql_text).alias("v")).collect()
        }
        assert got_col == got_sql, f"sql() diverges for {sql_text}"


def test_sql_renderer_escaping(spark):
    """String literals with quotes/backslashes survive the SQL round trip."""
    df = spark.createDataFrame([("it's a \\ test",)], "s string")
    e = E.f("s") == E.v("it's a \\ test")
    got = df.select(F.expr(e.sql()).alias("v")).collect()[0]["v"]
    assert got is True
