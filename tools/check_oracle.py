"""Local replica of the driver's CORRECTNESS gate: run every queries() entry
at sf0.01 through Spark AND the matching oracle_sql() through DuckDB, compare
row-count + column names + canonicalized values (FIXTURES.md rules: sort cols
by name, sort rows, floats rounded 1e-9, NULL literal).

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
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
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(canon(x)) for x in v) + "]"
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from bullet_spark_spark import get_spark
    from bullet_spark_spark.sources.batch import TABLES

    spark = get_spark(app_name="check-oracle", shuffle_partitions=16)
    conn = duckdb.connect()
    for name in TABLES:
        path = f"{args.sf}/{name}.parquet"
        if os.path.exists(path):
            conn.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs)
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            scols = list(df.columns)
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows ({dt:.1f}s) [no oracle — rows-only]")
            n_rowsonly += 1
            continue
        try:
            cur = conn.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = [tuple(r) for r in cur.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            failures.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            n_fail += 1
            failures.append(name)
            continue
        a, b = canon_rows(scols, srows), canon_rows(dcols, drows)
        if len(a) != len(b):
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            n_fail += 1
            failures.append(name)
            continue
        diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), None)
        if diff is not None:
            print(f"FAIL  {name}: first diff at row {diff}:")
            print(f"      spark: {a[diff]}")
            print(f"      duck:  {b[diff]}")
            n_fail += 1
            failures.append(name)
            continue
        print(f"PASS  {name}: {len(a)} rows ({dt:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass / {n_fail} fail / {n_rowsonly} rows-only of {len(names)}")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
