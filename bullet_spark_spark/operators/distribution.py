"""Distribution operators (SURVEY §2.2 Q7-Q9) — the scale-conscious paths.

Three quantile strategies, chosen by data volume:

- ``percentile`` (exact, built-in): a TypedImperativeAggregate that gathers
  every value into one buffer — correct and fast at small/medium volume, but
  the buffer is O(rows): wrong shape for 100 TB.
- ``exact_quantiles_distributed``: global sort (range-partitioned, spills) +
  per-partition offsets + targeted rank lookup — O(rows log rows) work but
  O(1) driver memory; the exact path that survives scale. Interpolation
  formula matches DuckDB ``quantile_cont`` (h = (n-1)p, linear between
  floor/ceil ranks).
- ``percentile_approx`` (KLL-like mergeable sketch): bullet's own posture —
  its DISTRIBUTION is a DataSketches quantile sketch [D]; bounded state,
  mergeable partials, the default at scale.
"""

from __future__ import annotations

from bisect import bisect_right

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def exact_quantiles_distributed(
    df: DataFrame, col: str, probs: list[float]
) -> DataFrame:
    """Exact linear-interpolation quantiles without collecting values to one
    buffer: sort the column globally (distributed range partition), compute
    per-partition row offsets, fetch only the ≤2·|probs| boundary ranks, and
    interpolate. Returns (quantile, value) like DistributionAgg QUANTILE."""
    spark = df.sparkSession
    vals = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull()).sort("v")
    rdd = vals.rdd.map(lambda r: r[0])

    # per-partition counts → global offsets (tiny driver-side array)
    counts = rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, sum(1 for _ in it))]
    ).collect()
    counts.sort()
    offsets = []
    total = 0
    for _, c in counts:
        offsets.append(total)
        total += c
    if total == 0:
        return spark.createDataFrame([], "quantile double, value double")

    # target global ranks (floor and ceil around h = (n-1)*p)
    targets: set[int] = set()
    plan = []
    for p in probs:
        h = (total - 1) * p
        lo, hi = int(h // 1), min(int(h // 1) + 1, total - 1)
        frac = h - (h // 1)
        plan.append((p, lo, hi, frac))
        targets.update((lo, hi))

    # fetch only the needed ranks: each partition knows its offset, emits
    # (rank, value) for ranks it owns — O(|targets|) rows collected
    b_offsets = offsets
    b_targets = sorted(targets)

    def pick(i, it):
        base = b_offsets[i]
        lo_idx = bisect_right(b_targets, base - 1)
        wanted = b_targets[lo_idx:]
        out = []
        for j, v in enumerate(it):
            rank = base + j
            while wanted and wanted[0] < rank:
                wanted = wanted[1:]
            if not wanted:
                break
            if rank == wanted[0]:
                out.append((rank, v))
                wanted = wanted[1:]
        return out

    rank_vals = dict(rdd.mapPartitionsWithIndex(pick).collect())
    rows = []
    for p, lo, hi, frac in plan:
        a, b = rank_vals[lo], rank_vals[hi]
        rows.append((p, a + (b - a) * frac))
    return spark.createDataFrame(rows, "quantile double, value double")


def pmf_buckets(df: DataFrame, col: str, points: list[float]) -> DataFrame:
    """Histogram counts per bucket: one pass, one shuffle keyed by bucket —
    see plans.compiler._compile_distribution (shared semantics)."""
    from functools import reduce

    c = F.col(col)
    bucket = reduce(lambda acc, p: acc + F.when(c >= F.lit(p), 1).otherwise(0), points, F.lit(0))
    return (
        df.filter(c.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("bucket")
    )
