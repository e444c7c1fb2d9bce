"""Reproduce the control-plane in-process decay (BENCH_LOCAL_r11_opt_baseline:
samples_32 = [19.73, 18.57, 16.68, 13.01, 12.53] — monotone within a process).

Runs N control-plane cycles in one session and prints per-cycle sub-phase
times: submit->registered wall, drain wall, served rate, plus driver RSS and
JVM heap. Optionally gc.collect() between cycles (--gc) to test the
py4j-reference/ContextCleaner hypothesis.
"""
from __future__ import annotations

import gc
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bullet_spark_spark import get_spark
from bullet_spark_spark.sources.batch import load_table
from bullet_spark_spark.sources.streaming import file_drip
from bullet_spark_spark.streaming.control import ControlPlane, submit_query
from bullet_spark_spark.streaming.dynamic import DynamicMultiplexer

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CYCLES = int(os.environ.get("N_CYCLES", "12"))
N_QUERIES = int(os.environ.get("N_QUERIES", "32"))
DO_GC = "--gc" in sys.argv


def jvm_heap(spark) -> tuple[float, float]:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    used = (rt.totalMemory() - rt.freeMemory()) / 1e6
    return round(used, 1), round(rt.totalMemory() / 1e6, 1)


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def main() -> None:
    spark = get_spark(app_name="control-decay-repro")
    events = load_table(spark, "events", SF_DIR)

    def cycle(i: int) -> None:
        with tempfile.TemporaryDirectory() as work:
            mux = DynamicMultiplexer(spark)
            plane = ControlPlane(
                spark, mux, f"{work}/control", f"{work}/status.jsonl",
                poll_interval_s=0.05,
            )
            plane.start()
            stream = file_drip(spark, events, f"{work}/drip", chunks=4)
            t0 = time.perf_counter()
            for q in range(N_QUERIES):
                submit_query(
                    f"{work}/control",
                    f"q{q}",
                    "SELECT user_id, COUNT(*) AS n, MIN(value) AS mn FROM STREAM() "
                    f"WHERE user_id % {N_QUERIES} = {q} GROUP BY user_id",
                )
            deadline = time.time() + 60
            while len(mux.queries) < N_QUERIES and time.time() < deadline:
                time.sleep(0.02)
            t_reg = time.perf_counter()
            mux.start(stream, checkpoint_dir=f"{work}/ck", available_now=True)
            t_drain = time.perf_counter()
            plane.stop()
            served = sum(
                1 for h in mux.queries.values() if h.state.value == "COMPLETED"
            )
            heap_used, heap_total = jvm_heap(spark)
            print(
                f"cycle {i:2d}: reg={t_reg - t0:6.3f}s drain={t_drain - t_reg:6.3f}s "
                f"rate={served / (t_drain - t0):6.2f} q/s served={served} "
                f"jvm_heap={heap_used:.0f}/{heap_total:.0f}MB rss={rss_mb():.0f}MB",
                flush=True,
            )
        if DO_GC:
            gc.collect()

    cycle(-1)  # warmup
    for i in range(N_CYCLES):
        cycle(i)
    spark.stop()


if __name__ == "__main__":
    main()
