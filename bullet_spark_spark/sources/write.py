"""Write-side layout helpers — the output half of the 100 TB posture.

The reference publishes results over its PubSub and leaves storage to the
user (ResultPublisher.scala:78-99); a Spark-native engine owns the file
layout, and layout is where scan cost is won or lost downstream:

- PARTITIONED writes put the partition key in the directory tree, so any
  later filter on it prunes whole directories before a byte is read
  (PartitionFilters in the scan node).
- BUCKETED writes pre-shuffle rows by key into a fixed bucket count, so
  later equi-joins/aggregations on that key skip their Exchange entirely
  (the zero-exchange join is pinned by test_multiplex_and_scale).
- SORTED row groups give parquet min/max statistics that skip pages within
  files for range predicates.

The classic failure mode these helpers prevent: ``df.write.partitionBy(k)``
straight off a wide shuffle emits (#tasks × #partition-values) files — at
32 tasks × 1000 days that is 32k files per write, and a 100 TB table decays
into a metadata problem. Repartitioning by the partition columns first
makes it one file per value (plus ``maxRecordsPerFile`` splits when a value
is large).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet with small-file discipline: ONE shuffle
    keyed on the partition columns (so each partition value is written by
    one task → one file), optional within-file sort for min/max page
    pruning, optional row cap so oversized partition values split instead
    of producing multi-GB files."""
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (saveAsTable — bucket metadata lives in the
    catalog, which is what lets the planner elide the Exchange on later
    joins/aggs keyed by ``bucket_cols``). Sort within buckets defaults to
    the bucket key: sort-merge joins then skip their Sort too.

    Pick ``num_buckets`` so a bucket of the LARGER fact table fits an
    executor's memory at full scale; both sides of a co-located join must
    use the same count."""
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_rows: int,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ≈count/target_file_rows right-sized
    files (streaming sinks and incremental loads accrete small files; scan
    cost at 100 TB is dominated by file/footer overhead once files are
    small). Returns the file count written. Round-robin repartition —
    compaction balances bytes, it does not re-cluster; pass ``sort_cols``
    to restore row-group clustering while paying the same rewrite."""
    df = spark.read.parquet(path)
    n = df.count()
    files = max(1, -(-n // target_file_rows))
    out = df.repartition(files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    tmp = path.rstrip("/") + "__compacting"
    out.write.mode("overwrite").parquet(tmp)
    # atomic-ish swap via the filesystem API Spark itself uses
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc.sc()
    hconf = jsc.hadoopConfiguration()
    p_old = jvm.org.apache.hadoop.fs.Path(path)
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = p_old.getFileSystem(hconf)
    fs.delete(p_old, True)
    fs.rename(p_tmp, p_old)
    return files


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Idempotent incremental backfill: replace ONLY the partition values
    present in ``df``, leaving every other partition untouched — Spark's
    dynamic partition overwrite, scoped to this one write so the session
    default (static overwrite, which would DELETE the whole table) is
    never changed globally. This is the daily-pipeline write pattern at
    100 TB: re-running a day's job rewrites that day's directories
    byte-identically and cannot damage the other ~n thousand days.

    Same small-file discipline as write_partitioned (one shuffle keyed on
    the partition columns → one file per value)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer.partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
