"""Red-flag plan sweep across the whole bench suite (guide §7.2): for every
BENCH query, print counts of plan signals worth a second look —
BatchEvalPython (row-at-a-time Python), CartesianProduct, BroadcastNestedLoopJoin,
SortMergeJoin, Exchange, live parquet scans — so optimization effort goes
where a plan is actually suspicious. Plan-only (no .count()), but iterative
queries execute their driver-side loops during construction.

Usage: python tools/audit_redflags.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entry
    from bullet_spark_spark import get_spark

    spark = get_spark(app_name="audit-redflags")
    qs = entry.queries()
    fm = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    sig_res = {
        "pyrow": re.compile(r"BatchEvalPython"),
        "cart": re.compile(r"CartesianProduct"),
        "bnlj": re.compile(r"BroadcastNestedLoopJoin"),
        "smj": re.compile(r"SortMergeJoin"),
        "exch": re.compile(r"\bExchange\b"),
        "scan": re.compile(r"Scan parquet"),
        "arrow": re.compile(r"ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas"),
    }
    print(f"{'query':38s} pyrow cart bnlj smj exch scan arrow")
    for name in bench.BENCH:
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(fm)
        except Exception as ex:  # noqa: BLE001
            print(f"{name:38s} ERROR {type(ex).__name__}: {str(ex)[:60]}")
            continue
        counts = {k: len(r.findall(plan)) for k, r in sig_res.items()}
        flag = " <<" if counts["pyrow"] or counts["cart"] else ""
        print(
            f"{name:38s} {counts['pyrow']:5d} {counts['cart']:4d} "
            f"{counts['bnlj']:4d} {counts['smj']:3d} {counts['exch']:4d} "
            f"{counts['scan']:4d} {counts['arrow']:5d}{flag}"
        )


if __name__ == "__main__":
    main()
