"""Property-based differential testing: random filter-expression trees are
built twice from one template — once through the engine's Expr builders,
once as ANSI SQL — and must select identical row sets (Spark vs DuckDB).
Randomized analogue of the §2.3 oracle rows (the reference has no
property-based tests at all, SURVEY §5.1 'Not present')."""

from __future__ import annotations

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from bullet_spark_spark.functions.exprs import E, Expr
from bullet_spark_spark.plans import Projection, Query, RawAgg, compile_query

SF_DIR = __import__("os").environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)


def _oracle_rows(sql: str):
    """Run generated oracle SQL on a DISPOSABLE DuckDB connection,
    rejecting (hypothesis.assume) examples that crash the ORACLE itself.
    A duckdb InternalException is FATAL to its whole database — one
    crashing example on the shared session fixture invalidated every
    downstream differential test (19 suite failures, r11). Known trigger
    pinned by test_duckdb_internal_bug_is_oracle_side: duplicated OR
    branches of a degenerate BETWEEN on a parquet view, e.g.
    ``(a AND v BETWEEN 0 AND 0) OR (a AND v BETWEEN 0 AND 0)`` —
    a DuckDB optimizer bug, not an engine behavior."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/events.parquet')"
        )
        try:
            return con.execute(sql).fetchall()
        except duckdb.InternalException:
            assume(False)  # oracle crashed — reject the example
    finally:
        con.close()

# -- paired (Expr, SQL) generators -----------------------------------------

_CMPS = ["=", "!=", ">", ">=", "<", "<="]
_SQL_CMP = {"=": "=", "!=": "<>", ">": ">", ">=": ">=", "<": "<", "<=": "<="}


@st.composite
def atom(draw):
    kind = draw(st.sampled_from(["value_cmp", "user_cmp", "type_eq", "between", "isin", "null", "json"]))
    if kind == "value_cmp":
        op = draw(st.sampled_from(_CMPS))
        c = draw(st.integers(0, 100))
        return (
            getattr(E.f("value"), {"=": "__eq__", "!=": "__ne__", ">": "__gt__",
                                   ">=": "__ge__", "<": "__lt__", "<=": "__le__"}[op])(float(c)),
            f"(value {_SQL_CMP[op]} {c})",
        )
    if kind == "user_cmp":
        op = draw(st.sampled_from([">", "<="]))
        c = draw(st.integers(0, 120))
        e = E.f("user_id") > c if op == ">" else E.f("user_id") <= c
        return (e, f"(user_id {op} {c})")
    if kind == "type_eq":
        t = draw(st.sampled_from(["purchase", "signup", "error", "click", "view", "nope"]))
        return (E.f("event_type") == t, f"(event_type = '{t}')")
    if kind == "between":
        lo = draw(st.integers(0, 80))
        hi = lo + draw(st.integers(0, 40))
        return (E.f("value").between(float(lo), float(hi)), f"(value BETWEEN {lo} AND {hi})")
    if kind == "isin":
        vals = draw(st.lists(st.integers(0, 50), min_size=1, max_size=4, unique=True))
        in_list = ", ".join(map(str, vals))
        return (E.f("user_id").isin(*vals), f"(user_id IN ({in_list}))")
    if kind == "null":
        return (E.f("props").is_not_null(), "(props IS NOT NULL)")
    # json
    c = draw(st.integers(0, 100))
    return (
        E.raw(f"cast(get_json_object(props, '$.k') as bigint) > {c}"),
        f"(CAST(json_extract_string(props, '$.k') AS BIGINT) > {c})",
    )


@st.composite
def predicate(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(atom())
    combo = draw(st.sampled_from(["AND", "OR", "NOT"]))
    le, ls = draw(predicate(depth=depth - 1))
    if combo == "NOT":
        return (~le, f"(NOT {ls})")
    re_, rs = draw(predicate(depth=depth - 1))
    if combo == "AND":
        return (le & re_, f"({ls} AND {rs})")
    return (le | re_, f"({ls} OR {rs})")


@st.composite
def group_spec(draw):
    """Random GroupAgg: keys ⊆ {event_type, user_id mod-bucket}, ops ⊆
    {count, min, max, count_field} (fp-exact ops only — sums are covered by
    the decimal-exact oracle entries)."""
    keys = draw(st.sampled_from([[], ["event_type"], ["user_id"], ["event_type", "user_id"]]))
    ops = draw(
        st.lists(
            st.sampled_from(["count", "min_value", "max_value", "count_value"]),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    return keys, ops


_OP_EXPR = {
    "count": ("count(*)", "COUNT"),
    "min_value": ("min(value)", "MIN"),
    "max_value": ("max(value)", "MAX"),
    "count_value": ("count(value)", "COUNT_FIELD"),
}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(spec=group_spec(), pred=predicate(depth=1))
def test_random_group_aggs_match_duckdb(spark, tables, duck, spec, pred):
    from bullet_spark_spark.plans import AggOp, GroupAgg

    keys, ops = spec
    expr, sql_pred = pred
    operations = [(AggOp[_OP_EXPR[o][1]], "value" if "value" in o else None, o) for o in ops]
    q = Query(
        source="events",
        filter=expr,
        aggregation=GroupAgg(fields=keys, operations=operations),
    )
    df = compile_query(spark, q)
    srows = sorted(tuple(r) for r in df.collect())
    sel_keys = (", ".join(keys) + ", ") if keys else ""
    sel_ops = ", ".join(f"{_OP_EXPR[o][0]} AS {o}" for o in ops)
    group = f"GROUP BY {', '.join(keys)}" if keys else ""
    drows = sorted(
        tuple(r)
        for r in _oracle_rows(
            f"SELECT {sel_keys}{sel_ops} FROM events WHERE {sql_pred} {group}"
        )
    )
    # (global agg on empty input: both engines return one row of 0/NULLs)
    assert srows == drows


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pred=predicate())
def test_random_filters_match_duckdb(spark, tables, duck, pred):
    expr, sql_text = pred
    q = Query(
        source="events",
        filter=expr,
        projection=Projection(fields=[("event_id", E.f("event_id"))]),
        aggregation=RawAgg(limit=100_000_000),
    )
    got = sorted(r[0] for r in compile_query(spark, q).collect())
    want = sorted(
        r[0]
        for r in _oracle_rows(f"SELECT event_id FROM events WHERE {sql_text}")
    )
    assert got == want, f"mismatch for: {sql_text} ({len(got)} vs {len(want)} rows)"


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pred=predicate())
def test_sql_renderer_matches_col_path(spark, tables, pred):
    """Random expression trees: Expr.sql() (the dynamic multiplexer's
    one-py4j-call compile path) must select EXACTLY the rows the
    Column path selects — the renderer is load-bearing for the control
    plane, so it gets the same randomized differential as the engine
    itself. Raw nodes are skipped only if they fail to render (none of
    the generated atoms should)."""
    import pyspark.sql.functions as F

    expr, _ = pred
    ev = tables["events"]
    got_col = sorted(
        r[0] for r in ev.filter(expr.col()).select("event_id").collect()
    )
    got_sql = sorted(
        r[0] for r in ev.filter(F.expr(expr.sql())).select("event_id").collect()
    )
    assert got_col == got_sql


def test_duckdb_internal_bug_is_oracle_side(spark, tables):
    """Document the r11 finding: this predicate crashes DuckDB itself
    (InternalException, fatal to its database) while the ENGINE evaluates
    it fine — the falsifying example hypothesis found, pinned so the
    _oracle_rows rejection path stays exercised and so a future duckdb
    upgrade that fixes the bug is visible (this test will keep passing;
    the rejection simply stops firing)."""
    import duckdb
    import pytest as _pt

    sql = (
        "SELECT event_id FROM events WHERE "
        "(((event_type = 'purchase') AND (value BETWEEN 0 AND 0)) "
        "OR ((event_type = 'purchase') AND (value BETWEEN 0 AND 0)))"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    crashed = False
    try:
        con.execute(sql).fetchall()
    except duckdb.InternalException:
        crashed = True
    con.close()
    # engine side: same predicate, no problem
    expr = (E.f("event_type") == "purchase") & E.f("value").between(0, 0) | (
        (E.f("event_type") == "purchase") & E.f("value").between(0, 0)
    )
    q = Query(
        source="events",
        filter=expr,
        projection=Projection(fields=[("event_id", E.f("event_id"))]),
        aggregation=RawAgg(limit=100_000_000),
    )
    rows = compile_query(spark, q).collect()
    assert isinstance(rows, list)  # evaluates cleanly (0 matches is fine)
    if not crashed:
        # duckdb fixed the bug — compare values outright
        assert sorted(r[0] for r in rows) == []
