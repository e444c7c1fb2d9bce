"""Count Spark jobs a query runs at DataFrame-CONSTRUCTION time vs at
action time, by sampling ``dagScheduler.nextJobId`` around each phase.

Construct-time jobs are serial driver round trips (eager approxQuantile
boundary passes, cache fills, count probes) that scale with nothing but
their count — the measurement behind the r11 "Not yet optimized" entry
on the two-level-cumsum family (guide §5: the driver is a shared,
serial resource).

Usage:
  python tools/count_jobs.py QUERY [QUERY ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bullet_spark_spark.session import get_spark

    qs = dict(entry.queries())
    spark = get_spark()
    sc = spark.sparkContext

    def njobs() -> int:
        return sc._jsc.sc().dagScheduler().nextJobId()

    for name in args.names:
        if name not in qs:
            print(f"{name}: unknown query", file=sys.stderr)
            continue
        qs[name](spark, args.sf).count()  # warmup (JIT, file listing)
        spark.catalog.clearCache()
        gc.collect()
        j0, t0 = njobs(), time.time()
        df = qs[name](spark, args.sf)
        j1, t1 = njobs(), time.time()
        df.count()
        j2, t2 = njobs(), time.time()
        print(
            f"{name:36s} construct: {j1 - j0:3d} jobs {t1 - t0:6.2f}s"
            f" | action: {j2 - j1:3d} jobs {t2 - t1:6.2f}s"
        )


if __name__ == "__main__":
    main()
