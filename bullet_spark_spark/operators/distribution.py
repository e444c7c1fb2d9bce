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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def exact_quantiles_distributed(
    df: DataFrame, col: str, probs: list[float], num_partitions: int | None = None
) -> DataFrame:
    """Exact linear-interpolation quantiles without collecting values to one
    buffer, 100% DataFrame ops (no Python-RDD row serialization):

    1. range-repartition the column (distributed sort — each partition holds
       a contiguous value range, spillable),
    2. per-partition counts → global offsets (driver sees only
       ``num_partitions`` integers — metadata, not data),
    3. global rank = offset[pid] + per-partition ``row_number`` (a window
       PARTITIONED by pid — fully parallel, never a single-partition window),
    4. fetch exactly the ≤2·|probs| boundary ranks and interpolate.

    Interpolation matches DuckDB ``quantile_cont`` (h = (n-1)p, linear
    between floor/ceil ranks). Returns (quantile, value) like
    DistributionAgg QUANTILE."""
    spark = df.sparkSession
    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = (
        vals.repartitionByRange(num_partitions, "v")
        .sortWithinPartitions("v")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = {
            r["pid"]: r["cnt"]
            for r in ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        total = sum(counts.values())
        if total == 0:
            return spark.createDataFrame([], "quantile double, value double")

        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]

        # target global ranks (floor and ceil around h = (n-1)*p)
        targets: set[int] = set()
        plan = []
        for p in probs:
            h = (total - 1) * p
            lo, hi = int(h // 1), min(int(h // 1) + 1, total - 1)
            frac = h - (h // 1)
            plan.append((p, lo, hi, frac))
            targets.update((lo, hi))

        off_map = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )
        rank = (
            off_map[F.col("pid")]
            + F.row_number().over(W.partitionBy("pid").orderBy("v"))
            - 1
        )
        rank_rows = (
            ranged.withColumn("rank", rank)
            .filter(F.col("rank").isin(*targets))
            .select("rank", "v")
            .collect()
        )
    finally:
        ranged.unpersist()
    rank_vals = {r["rank"]: r["v"] for r in rank_rows}
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
