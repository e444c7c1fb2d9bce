"""Differential-test canonicalization — mirrors the driver's compare
(FIXTURES.md 'Oracle canonicalization rules'): sort columns by name, sort
rows, round floats, NULL as literal, then compare."""

from __future__ import annotations

import math
from typing import Any


def canon_value(v: Any, ndigits: int = 9) -> Any:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, ndigits)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x, ndigits) for x in v)
    return v


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def spark_result(df) -> tuple[list[str], list[tuple]]:
    rows = [tuple(r) for r in df.collect()]
    return list(df.columns), rows


def duck_result(conn, sql: str) -> tuple[list[str], list[tuple]]:
    cur = conn.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, [tuple(r) for r in cur.fetchall()]


def assert_match(df, conn, sql: str) -> None:
    scols, srows = spark_result(df)
    dcols, drows = duck_result(conn, sql)
    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    a, b = canon_rows(scols, srows), canon_rows(dcols, drows)
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == y, f"row {i} differs:\n  spark: {x}\n  duck:  {y}"
