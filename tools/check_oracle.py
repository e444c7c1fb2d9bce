"""Local replica of the driver's CORRECTNESS gate: run every queries() entry
at sf0.01 through Spark AND the matching oracle_sql() through DuckDB, compare
row-count + column names + canonicalized values (FIXTURES.md rules: sort cols
by name, sort rows, floats rounded 1e-9, NULL literal).

Round-5 additions (VERDICT r4 tasks 1 & 8):

* A **typed audit**: the r4 driver-red rows (`pack_sequences`,
  `pipeline_end_to_end`) passed this tool's value-level compare while failing
  the driver's hash, because DuckDB types `sum(int) OVER` as HUGEINT (int128)
  while Spark emits LONG — and ``str(170) == str(170)`` regardless of dtype.
  The compare now ALSO fetches the DuckDB result via Arrow and diffs the
  logical type class per column (int vs float vs decimal vs string/bool/
  temporal/nested) against Spark's schema; any HUGEINT (or other class
  mismatch) is a FAIL even when values stringify identically, so the class of
  bug behind the r4 red rows can't re-enter through a new oracle string.
* ``--emit PATH``: write a JSON artifact (per-query status, rows, seconds,
  sf) so a sweep at --sf /root/testdata/sf0.1 lands in the repo as
  ``ORACLE_SF01.json`` instead of being a builder claim.

Round-6 hardening (VERDICT r5 task 2): the r5 driver reds passed this tool
because (a) the typed audit whitelisted decimal-vs-decimal — but the driver's
hasher fetches DECIMAL differently per engine, so raw DECIMAL output columns
hash-mismatch even when values are identical — and (b) ``canon()``
stringified lists, while the driver's pandas canonicalizer raises
``TypeError: unhashable type: 'list'`` on ARRAY output columns. The gate is
now strictly MORE demanding than the driver:

* **Surface audit** — any oracle-checked query whose *Spark output schema*
  contains DecimalType, ArrayType, MapType or StructType FAILS outright.
  Driver-hash-safe surface = bigint / rounded double / string / bool /
  date-time only (the repo convention at ``__spark_entry__.py:15-20``).
* The typed audit no longer whitelists decimal-vs-decimal, and ``canon()``
  refuses lists instead of stringifying them.

Usage:
  python tools/check_oracle.py [--sf DIR] [--emit PATH] [name ...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 9):.9f}"
    if isinstance(v, bool):
        return str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict, set)):
        # The driver's pandas canonicalizer cannot sort rows containing
        # containers (unhashable) — an output that reaches here would be a
        # guaranteed driver red. Refuse instead of stringifying.
        raise TypeError(
            f"container value in oracle-checked output (driver-unhashable): {v!r}"
        )
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{round(float(v), 9):.9f}"
    except Exception:
        pass
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def _arrow_class(t) -> str:
    """Collapse a pyarrow DataType to the logical class the driver's typed
    hasher distinguishes. int64 vs int32 hash alike after upcast, but
    int128/HUGEINT does not fit the int64 lane — call it out explicitly."""
    import pyarrow as pa

    s = str(t)
    if s in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32"):
        return "int"
    if s in ("uint64", "int128") or "128" in s and "decimal" not in s:
        return "HUGEINT"
    if s.startswith("decimal"):
        return "decimal"
    if s in ("float", "double", "halffloat", "float32", "float64"):
        return "float"
    if s == "bool":
        return "bool"
    if s.startswith(("timestamp", "date", "time")):
        return "temporal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_class(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return s


def _spark_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "temporal"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_class(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.BinaryType):
        return "binary"
    return dt.simpleString()


def type_mismatches(sdf, cur) -> list[str]:
    """Compare Spark schema vs DuckDB Arrow schema per column name; return
    human-readable mismatch strings (empty = typed-hash-safe)."""
    try:
        duck_schema = cur.fetch_arrow_table().schema
    except Exception:
        return []
    duck = {f.name: _arrow_class(f.type) for f in duck_schema}
    out = []
    for f in sdf.schema.fields:
        if f.name not in duck:
            continue
        sc, dc = _spark_class(f.dataType), duck[f.name]
        # NO decimal-vs-decimal whitelist (r5 lesson): the driver's hasher
        # fetches DECIMAL through different paths per engine, so even
        # value-identical decimal columns hash-mismatch. Strict class
        # equality only.
        if sc != dc:
            out.append(f"{f.name}: spark={sc} duck={dc}")
    return out


def surface_violations(sdf) -> list[str]:
    """Driver-hash-safe output surface = bigint / double / string / bool /
    temporal / binary. DECIMAL columns hash differently per engine fetch
    path (r4 HUGEINT reds, r5 decimal reds); ARRAY/MAP/STRUCT columns crash
    the driver's pandas sort (unhashable). Any hit = FAIL."""
    from pyspark.sql import types as T

    bad = []
    for f in sdf.schema.fields:
        if isinstance(
            f.dataType, (T.DecimalType, T.ArrayType, T.MapType, T.StructType)
        ):
            bad.append(f"{f.name}: {f.dataType.simpleString()}")
    return bad


def unasserted_rows_only(queries, oracles, quality_asserts) -> list[str]:
    """Meta-gate (VERDICT r10 #2): every registered query WITHOUT an
    oracle must carry a ``quality_asserts()`` entry. Before this gate, a
    new rows-only registration silently landed as status ``rows_only``
    — counted, never checked — and the "all 29 rows-only are asserted"
    program invariant could regress invisibly. Returns the offending
    names (empty == gate passes); :func:`main` fails the WHOLE sweep on
    any hit, before running a single query."""
    return sorted(
        n for n in queries if n not in oracles and n not in quality_asserts
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--emit", default=None, help="write a JSON artifact here")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from bullet_spark_spark import get_spark
    from bullet_spark_spark.sources.batch import TABLES

    qs = entry.queries()
    oracles = entry.oracle_sql()
    qa_map = getattr(entry, "quality_asserts", lambda: {})()
    # registration-level invariant: checked over the FULL inventory even
    # when a name filter narrows the run — an unasserted rows-only query
    # is a program regression regardless of which subset executes today.
    # Runs BEFORE Spark startup so the failure is instant.
    missing_asserts = unasserted_rows_only(qs, oracles, qa_map)
    if missing_asserts:
        print(
            "META-GATE FAIL: rows-only queries without a quality_asserts() "
            "entry (every non-oracle registration must carry an in-sweep "
            f"assert): {' '.join(missing_asserts)}"
        )
        sys.exit(2)

    spark = get_spark(app_name="check-oracle", shuffle_partitions=16)
    conn = duckdb.connect()
    for name in TABLES:
        path = f"{args.sf}/{name}.parquet"
        if os.path.exists(path):
            conn.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    names = args.names or list(qs)
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    report: dict[str, dict] = {}
    for name in names:
        # r7 sweep-hygiene: queries persist / eagerly localCheckpoint
        # internal frames; without per-query cleanup the block manager
        # accumulates ~190 queries of debris and LATE queries measure GC
        # pressure, not themselves (dedup_span_exact: 11 s in-sweep vs
        # 1 s standalone). clearCache drops persisted frames; the driver
        # gc releases py4j RDD refs so ContextCleaner frees checkpoint
        # blocks.
        import gc

        spark.catalog.clearCache()
        gc.collect()
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            scols = list(df.columns)
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            failures.append(name)
            report[name] = {"status": "fail", "err": f"spark: {type(e).__name__}"}
            continue
        dt = time.time() - t0
        if name not in oracles:
            qa = qa_map.get(name)
            if qa is not None:
                # r9: rows-only queries with a registered statistical
                # guarantee run it in-sweep — a violated guarantee is a
                # FAIL, not a shrug (the sweep artifact records which
                # rows-only entries are asserted vs merely counted)
                try:
                    qa(spark, args.sf, [r for r in df.collect()])
                except AssertionError as e:
                    print(f"FAIL  {name}: quality assert: {e}")
                    n_fail += 1
                    failures.append(name)
                    report[name] = {
                        "status": "fail",
                        "err": f"quality_assert: {str(e)[:160]}",
                    }
                    continue
                print(
                    f"ROWS+ {name}: {len(srows)} rows ({dt:.1f}s) "
                    "[rows-only, quality assert PASSED]"
                )
                n_rowsonly += 1
                report[name] = {
                    "status": "rows_only_asserted",
                    "rows": len(srows),
                    "sec": round(dt, 2),
                }
                continue
            print(f"ROWS  {name}: {len(srows)} rows ({dt:.1f}s) [no oracle — rows-only]")
            n_rowsonly += 1
            report[name] = {"status": "rows_only", "rows": len(srows), "sec": round(dt, 2)}
            continue
        try:
            cur = conn.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = [tuple(r) for r in cur.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            failures.append(name)
            report[name] = {"status": "fail", "err": f"duckdb: {type(e).__name__}"}
            continue
        sviol = surface_violations(df)
        if sviol:
            print(
                f"FAIL  {name}: forbidden output surface "
                f"(decimal/array/map/struct): {'; '.join(sviol)}"
            )
            n_fail += 1
            failures.append(name)
            report[name] = {"status": "fail", "err": f"surface: {'; '.join(sviol)}"}
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            n_fail += 1
            failures.append(name)
            report[name] = {"status": "fail", "err": "columns"}
            continue
        # typed audit needs a fresh cursor (fetchall consumed the first)
        tmis = type_mismatches(df, conn.execute(oracles[name]))
        if tmis:
            print(f"FAIL  {name}: dtype mismatch (driver typed-hash risk): {'; '.join(tmis)}")
            n_fail += 1
            failures.append(name)
            report[name] = {"status": "fail", "err": f"dtype: {'; '.join(tmis)}"}
            continue
        try:
            a, b = canon_rows(scols, srows), canon_rows(dcols, drows)
        except TypeError as e:
            print(f"FAIL  {name}: {e}")
            n_fail += 1
            failures.append(name)
            report[name] = {"status": "fail", "err": f"canon: {str(e)[:120]}"}
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            n_fail += 1
            failures.append(name)
            report[name] = {"status": "fail", "err": "rowcount"}
            continue
        diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), None)
        if diff is not None:
            print(f"FAIL  {name}: first diff at row {diff}:")
            print(f"      spark: {a[diff]}")
            print(f"      duck:  {b[diff]}")
            n_fail += 1
            failures.append(name)
            report[name] = {"status": "fail", "err": "values"}
            continue
        print(f"PASS  {name}: {len(a)} rows ({dt:.1f}s)")
        n_pass += 1
        report[name] = {"status": "pass", "rows": len(a), "sec": round(dt, 2)}

    print(f"\n{n_pass} pass / {n_fail} fail / {n_rowsonly} rows-only of {len(names)}")
    if args.emit:
        with open(args.emit, "w") as f:
            json.dump(
                {
                    "sf": args.sf,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rowsonly,
                    "queries": report,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {args.emit}")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
