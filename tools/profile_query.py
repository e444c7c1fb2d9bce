"""Per-query profiling harness for the optimization rounds.

Runs named queries() entries in isolation with the bench methodology
(warmup, clearCache + gc between samples, median of N), optionally timing
via the noop sink (guide §1.4 — computes every column, no count-pruning)
and optionally dumping `.explain("formatted")` to plans/<tag>/<name>_<suffix>.txt.

Usage:
  python tools/profile_query.py [--repeats 3] [--noop] [--plans r11] \
      [--suffix before] name [name ...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="time via noop sink")
    ap.add_argument("--plans", default=None, help="plans/<tag>/ output dir tag")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=SF_DIR)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bullet_spark_spark import get_spark

    spark = get_spark(app_name="bullet-spark-spark-profile")
    qs = entry.queries()

    out: dict[str, dict] = {}
    for name in args.names:
        fn = qs[name]
        # warmup: file index + codegen
        fn(spark, args.sf).limit(1).collect()
        if args.plans:
            d = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans",
                args.plans,
            )
            os.makedirs(d, exist_ok=True)
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(d, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        samples = []
        for _ in range(args.repeats):
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(statistics.median(samples), 4),
            "samples": samples,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
