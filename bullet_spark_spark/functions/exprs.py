"""Bullet expression language → Spark Column compiler.

Covers the full bullet-core 1.5.2 expression surface the reference executes
interpretively inside ``Querier.consume`` (SURVEY.md §2.3; field-equality form
visible at reference FilterStreamingTest.scala:45 via ``makeFieldFilterQuery``):

- literals, fields, nested subfield ``a.b``, list index ``a[0]``, map-of-map
  ``a.b.c``  (bullet-core FieldExpression)
- arithmetic ``+ - * /``, unary ``-``
- comparison ``= != > >= < <=`` with ANY/ALL list-quantified variants
- logical ``AND OR XOR NOT``; membership ``IN/NOT IN/BETWEEN``; null tests
- ``RLIKE``; string LOWER/UPPER/TRIM/SUBSTRING/CONCAT; ABS
- container SIZEOF/SIZEIS, CONTAINSKEY, CONTAINSVALUE, FILTER(list, mask)
- IF(cond, a, b); CAST; HASH; UNIX_TIMESTAMP

Unlike the reference's per-record tree interpreter, every expression here
compiles to a Catalyst ``Column`` — it runs inside whole-stage codegen on the
JVM, is eligible for predicate pushdown into the parquet scan, and never
touches Python at execution time.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


class ExprSQLUnsupported(Exception):
    """Raised by ``Expr.sql()`` for the (rare) nodes with no faithful Spark
    SQL text form — callers fall back to the py4j ``col()`` path."""


def _sql_lit(v: Any) -> str:
    """Literal → Spark SQL text (escaped; backslash is an escape char in
    Spark's default string-literal parsing)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            raise ExprSQLUnsupported(f"non-finite literal {v}")
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise ExprSQLUnsupported(f"literal type {type(v).__name__}")


@dataclass(frozen=True)
class Expr:
    """Base class for expression-tree nodes."""

    def col(self) -> Column:
        raise NotImplementedError

    def sql(self) -> str:
        """Render this expression as Spark SQL text.

        ``F.expr(e.sql())`` is semantically identical to ``e.col()``
        (pinned by the differential test in tests/test_exprs.py) but costs
        ONE py4j round trip instead of one per AST node — the difference
        between 0.24 s and 2 ms when the dynamic multiplexer compiles a
        32-query routing expression (the control-plane registry-churn
        path). Raises ExprSQLUnsupported where no faithful text form
        exists; callers fall back to ``col()``."""
        raise ExprSQLUnsupported(type(self).__name__)

    # operator sugar so specs read naturally: E.f("value") > 50
    def _bin(self, op: str, other: Any) -> "Binary":
        return Binary(op, self, _wrap(other))

    def __add__(self, o): return self._bin("+", o)
    def __sub__(self, o): return self._bin("-", o)
    def __mul__(self, o): return self._bin("*", o)
    def __truediv__(self, o): return self._bin("/", o)
    def __mod__(self, o): return self._bin("%", o)
    def __neg__(self): return Unary("-", self)
    def __eq__(self, o): return self._bin("=", o)  # type: ignore[override]
    def __ne__(self, o): return self._bin("!=", o)  # type: ignore[override]
    def __gt__(self, o): return self._bin(">", o)
    def __ge__(self, o): return self._bin(">=", o)
    def __lt__(self, o): return self._bin("<", o)
    def __le__(self, o): return self._bin("<=", o)
    def __and__(self, o): return self._bin("AND", o)
    def __or__(self, o): return self._bin("OR", o)
    def __xor__(self, o): return self._bin("XOR", o)
    def __invert__(self): return Unary("NOT", self)
    def __hash__(self):
        return object.__hash__(self)

    def isin(self, *vals: Any) -> "NAry":
        return NAry("IN", [self, *[_wrap(v) for v in vals]])

    def between(self, lo: Any, hi: Any) -> "NAry":
        return NAry("BETWEEN", [self, _wrap(lo), _wrap(hi)])

    def is_null(self) -> "Unary":
        return Unary("ISNULL", self)

    def is_not_null(self) -> "Unary":
        return Unary("ISNOTNULL", self)

    def rlike(self, pattern: str) -> "Binary":
        return Binary("RLIKE", self, Value(pattern))

    def cast(self, to: str) -> "Cast":
        return Cast(self, to)

    def alias_pair(self, name: str) -> tuple[str, "Expr"]:
        return (name, self)


def _wrap(v: Any) -> Expr:
    return v if isinstance(v, Expr) else Value(v)


@dataclass(frozen=True, eq=False)
class Value(Expr):
    """Literal (bullet-core ValueExpression)."""

    value: Any

    def col(self) -> Column:
        return F.lit(self.value)

    def sql(self) -> str:
        return _sql_lit(self.value)


@dataclass(frozen=True, eq=False)
class Field(Expr):
    """Field access incl. nested subfield / index / map-of-map
    (bullet-core FieldExpression: ``a``, ``a.b``, ``a[0]``, ``a[0].c``,
    ``a.b.c``). Dots are resolved against struct/map columns by Catalyst;
    integer indices use ``getItem`` (0-based, as in bullet)."""

    name: str
    index: int | None = None
    key: str | None = None
    subkey: str | None = None

    def col(self) -> Column:
        # bullet's FieldExpression yields NULL for a missing index/key;
        # plain getItem subscripts RAISE under ANSI mode (Spark 4 default)
        # — use the null-safe accessors (get / try_element_at)
        c = F.col(self.name)
        if self.index is not None:
            c = F.get(c, self.index)
        if self.key is not None:
            c = F.try_element_at(c, F.lit(self.key))
        if self.subkey is not None:
            c = F.try_element_at(c, F.lit(self.subkey))
        return c

    def sql(self) -> str:
        if "`" in self.name:
            raise ExprSQLUnsupported("backquote in field name")
        s = f"`{self.name}`" if not self.name.isidentifier() else self.name
        # getItem() is null-tolerant; plain [] subscripts RAISE under ANSI
        # mode (Spark 4 default) on out-of-range/missing — use the
        # null-safe accessors so both paths agree
        if self.index is not None:
            s = f"get({s}, {int(self.index)})"
        if self.key is not None:
            s = f"try_element_at({s}, {_sql_lit(self.key)})"
        if self.subkey is not None:
            s = f"try_element_at({s}, {_sql_lit(self.subkey)})"
        return s


_BINARY_BUILTIN = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "AND": lambda a, b: a & b,
    "OR": lambda a, b: a | b,
    "XOR": lambda a, b: a.cast("boolean") != b.cast("boolean"),
}

_CMP_FN = {
    "=": lambda x, y: x == y,
    "!=": lambda x, y: x != y,
    ">": lambda x, y: x > y,
    ">=": lambda x, y: x >= y,
    "<": lambda x, y: x < y,
    "<=": lambda x, y: x <= y,
}


@dataclass(frozen=True, eq=False)
class Binary(Expr):
    """Binary op. ``op`` ∈ arithmetic/comparison/logical/RLIKE, plus
    quantified comparisons ``=_ANY``, ``>_ALL`` … where the right side is a
    list column (bullet-core's ANY/ALL variants) — compiled to
    ``exists``/``forall`` lambda expressions over the array."""

    op: str
    left: Expr
    right: Expr

    def col(self) -> Column:
        a, b = self.left.col(), self.right.col()
        op = self.op.upper() if self.op not in _CMP_FN else self.op
        if self.op in _CMP_FN or op in ("AND", "OR", "XOR", "+", "-", "*", "/", "%"):
            if op == "XOR":
                return a.cast("boolean") != b.cast("boolean")
            return _BINARY_BUILTIN[self.op](a, b)
        if op == "RLIKE":
            return a.rlike(self.right.value) if isinstance(self.right, Value) else F.regexp_like(a, b)
        if op == "RLIKE_ANY":
            # true if a matches ANY pattern in list b
            return F.exists(b, lambda p: F.regexp_like(a, p))
        if op.endswith("_ANY") or op.endswith("_ALL"):
            base, quant = op[:-4], op[-3:]
            cmp = _CMP_FN[base]
            if quant == "ANY":
                return F.exists(b, lambda x: cmp(a, x))
            return F.forall(b, lambda x: cmp(a, x))
        if op == "CONTAINSKEY":
            return F.map_contains_key(a, b)
        if op == "CONTAINSVALUE":
            return F.array_contains(F.map_values(a), b)
        if op == "IN_LIST":  # membership of scalar in a *list column*
            return F.array_contains(b, a)
        raise ValueError(f"unknown binary op {self.op!r}")

    def sql(self) -> str:
        a, b = self.left.sql(), self.right.sql()
        op = self.op.upper() if self.op not in _CMP_FN else self.op
        if self.op in _CMP_FN or op in ("AND", "OR", "+", "-", "*", "/", "%"):
            return f"({a} {self.op} {b})"
        if op == "XOR":
            return f"(cast({a} as boolean) != cast({b} as boolean))"
        if op == "RLIKE":
            return f"({a} RLIKE {b})"
        if op == "RLIKE_ANY":
            return f"exists({b}, __p -> regexp_like({a}, __p))"
        if op.endswith("_ANY") or op.endswith("_ALL"):
            base, quant = op[:-4], op[-3:]
            fn = "exists" if quant == "ANY" else "forall"
            return f"{fn}({b}, __x -> ({a} {base} __x))"
        if op == "CONTAINSKEY":
            return f"map_contains_key({a}, {b})"
        if op == "CONTAINSVALUE":
            return f"array_contains(map_values({a}), {b})"
        if op == "IN_LIST":
            return f"array_contains({b}, {a})"
        raise ExprSQLUnsupported(self.op)


@dataclass(frozen=True, eq=False)
class Unary(Expr):
    op: str
    operand: Expr

    def col(self) -> Column:
        c = self.operand.col()
        op = self.op.upper()
        if op == "-":
            return -c
        if op == "NOT":
            return ~c.cast("boolean")
        if op == "ISNULL":
            return c.isNull()
        if op == "ISNOTNULL":
            return c.isNotNull()
        if op == "ABS":
            return F.abs(c)
        if op == "LOWER":
            return F.lower(c)
        if op == "UPPER":
            return F.upper(c)
        if op == "TRIM":
            return F.trim(c)
        if op == "SIZEOF":  # list/map size (bullet SIZEOF; strings → STRLEN)
            return F.size(c)
        if op == "STRLEN":
            return F.length(c)
        if op == "HASH":
            return F.xxhash64(c)
        if op == "UNIX_TIMESTAMP":
            return F.unix_timestamp(c)
        raise ValueError(f"unknown unary op {self.op!r}")

    _SQL_FN = {
        "ABS": "abs", "LOWER": "lower", "UPPER": "upper", "TRIM": "trim",
        "SIZEOF": "size", "STRLEN": "length", "HASH": "xxhash64",
        "UNIX_TIMESTAMP": "unix_timestamp",
    }

    def sql(self) -> str:
        c = self.operand.sql()
        op = self.op.upper()
        if op == "-":
            return f"(- {c})"
        if op == "NOT":
            return f"(NOT cast({c} as boolean))"
        if op == "ISNULL":
            return f"({c} IS NULL)"
        if op == "ISNOTNULL":
            return f"({c} IS NOT NULL)"
        if op in self._SQL_FN:
            return f"{self._SQL_FN[op]}({c})"
        raise ExprSQLUnsupported(self.op)


@dataclass(frozen=True, eq=False)
class NAry(Expr):
    """N-ary ops: IN, NOT IN, BETWEEN, CONCAT, SUBSTRING, IF, FILTER."""

    op: str
    operands: Sequence[Expr]

    def col(self) -> Column:
        ops = [o.col() for o in self.operands]
        op = self.op.upper()
        if op in ("IN", "NOT IN"):
            # fast path: all-literal list → Catalyst In (pushdown-eligible);
            # general case (fields/computed operands) → OR-chain of
            # equalities, which keeps SQL three-valued NULL semantics
            if all(isinstance(o, Value) for o in self.operands[1:]):
                mem = ops[0].isin(*[o.value for o in self.operands[1:]])
            else:
                from functools import reduce

                mem = reduce(lambda a, b: a | b, [ops[0] == c for c in ops[1:]])
            return ~mem if op == "NOT IN" else mem
        if op == "BETWEEN":
            return ops[0].between(ops[1], ops[2])
        if op == "NOT BETWEEN":
            return ~ops[0].between(ops[1], ops[2])
        if op == "CONCAT":
            return F.concat(*ops)
        if op == "SUBSTRING":  # (str, pos, len?) — 1-based as in SQL
            length = ops[2] if len(ops) == 3 else F.lit(2147483647)
            return F.substring(ops[0], ops[1], length)
        if op == "IF":
            return F.when(ops[0], ops[1]).otherwise(ops[2])
        if op == "SPLIT":
            # pattern must be a literal: F.split takes a Java-regex STRING
            pat = self.operands[1]
            if not isinstance(pat, Value):
                raise ValueError("SPLIT pattern must be a literal string")
            return F.split(ops[0], str(pat.value))
        if op == "FILTER":
            # FILTER(list, mask-list): keep list[i] where mask[i] (bullet-core NAry FILTER)
            return F.filter(
                F.zip_with(ops[0], ops[1], lambda x, m: F.struct(x.alias("x"), m.alias("m"))),
                lambda s: s["m"],
            ).transform(lambda s: s["x"])
        raise ValueError(f"unknown n-ary op {self.op!r}")

    def sql(self) -> str:
        ops = [o.sql() for o in self.operands]
        op = self.op.upper()
        if op in ("IN", "NOT IN"):
            if all(isinstance(o, Value) for o in self.operands[1:]):
                mem = f"({ops[0]} IN ({', '.join(ops[1:])}))"
            else:
                mem = "(" + " OR ".join(f"({ops[0]} = {c})" for c in ops[1:]) + ")"
            return f"(NOT {mem})" if op == "NOT IN" else mem
        if op == "BETWEEN":
            return f"({ops[0]} BETWEEN {ops[1]} AND {ops[2]})"
        if op == "NOT BETWEEN":
            return f"({ops[0]} NOT BETWEEN {ops[1]} AND {ops[2]})"
        if op == "CONCAT":
            return f"concat({', '.join(ops)})"
        if op == "SUBSTRING":
            length = ops[2] if len(ops) == 3 else "2147483647"
            return f"substring({ops[0]}, {ops[1]}, {length})"
        if op == "IF":
            return f"if({ops[0]}, {ops[1]}, {ops[2]})"
        if op == "SPLIT":
            pat = self.operands[1]
            if not isinstance(pat, Value):
                raise ExprSQLUnsupported("SPLIT pattern must be literal")
            return f"split({ops[0]}, {_sql_lit(str(pat.value))})"
        if op == "FILTER":
            return (
                f"transform(filter(zip_with({ops[0]}, {ops[1]}, "
                "(__x, __m) -> struct(__x as x, __m as m)), __s -> __s.m), __s -> __s.x)"
            )
        raise ExprSQLUnsupported(self.op)


@dataclass(frozen=True, eq=False)
class Cast(Expr):
    operand: Expr
    to: str

    def col(self) -> Column:
        return self.operand.col().cast(self.to)

    def sql(self) -> str:
        return f"cast({self.operand.sql()} as {self.to})"


@dataclass(frozen=True, eq=False)
class Raw(Expr):
    """Escape hatch: a raw Spark SQL expression string (our engine's UDF-free
    extension surface; not part of bullet parity)."""

    sql_text: str

    def col(self) -> Column:
        return F.expr(self.sql_text)

    def sql(self) -> str:
        return f"({self.sql_text})"


class E:
    """Expression builder shorthand: ``E.f("value") > 50``, ``E.v(1)``,
    ``E.concat(...)``, ``E.iff(cond, a, b)`` …"""

    @staticmethod
    def f(name: str, index: int | None = None, key: str | None = None,
          subkey: str | None = None) -> Field:
        return Field(name, index, key, subkey)

    @staticmethod
    def v(value: Any) -> Value:
        return Value(value)

    @staticmethod
    def raw(sql: str) -> Raw:
        return Raw(sql)

    @staticmethod
    def concat(*parts: Expr | Any) -> NAry:
        return NAry("CONCAT", [_wrap(p) for p in parts])

    @staticmethod
    def substring(s: Expr | Any, pos: int, length: int | None = None) -> NAry:
        ops = [_wrap(s), Value(pos)] + ([Value(length)] if length is not None else [])
        return NAry("SUBSTRING", ops)

    @staticmethod
    def iff(cond: Expr, then: Any, otherwise: Any) -> NAry:
        return NAry("IF", [cond, _wrap(then), _wrap(otherwise)])

    @staticmethod
    def lower(e): return Unary("LOWER", _wrap(e))
    @staticmethod
    def upper(e): return Unary("UPPER", _wrap(e))
    @staticmethod
    def trim(e): return Unary("TRIM", _wrap(e))
    @staticmethod
    def abs(e): return Unary("ABS", _wrap(e))
    @staticmethod
    def sizeof(e): return Unary("SIZEOF", _wrap(e))
    @staticmethod
    def strlen(e): return Unary("STRLEN", _wrap(e))
    @staticmethod
    def hash(e): return Unary("HASH", _wrap(e))
    @staticmethod
    def unix_timestamp(e): return Unary("UNIX_TIMESTAMP", _wrap(e))

    @staticmethod
    def size_is(e, n: int): return Unary("SIZEOF", _wrap(e))._bin("=", Value(n))

    @staticmethod
    def contains_key(m, k: str): return Binary("CONTAINSKEY", _wrap(m), Value(k))

    @staticmethod
    def contains_value(m, v): return Binary("CONTAINSVALUE", _wrap(m), _wrap(v))

    @staticmethod
    def in_list(x, lst): return Binary("IN_LIST", _wrap(x), _wrap(lst))

    @staticmethod
    def list_filter(lst, mask): return NAry("FILTER", [_wrap(lst), _wrap(mask)])

    @staticmethod
    def not_in(x, *vals): return NAry("NOT IN", [_wrap(x), *[_wrap(v) for v in vals]])

    @staticmethod
    def not_between(x, lo, hi): return NAry("NOT BETWEEN", [_wrap(x), _wrap(lo), _wrap(hi)])

    @staticmethod
    def any(op: str, left, right): return Binary(f"{op}_ANY", _wrap(left), _wrap(right))

    @staticmethod
    def all(op: str, left, right): return Binary(f"{op}_ALL", _wrap(left), _wrap(right))

    @staticmethod
    def rlike_any(s, patterns): return Binary("RLIKE_ANY", _wrap(s), _wrap(patterns))


def compile_expr(e: Expr) -> Column:
    """Expression tree → Catalyst Column."""
    return e.col()
