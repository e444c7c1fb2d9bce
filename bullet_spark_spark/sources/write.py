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


def zorder_key(
    ranks: list, bits: int
) -> "F.Column":
    """Interleave the low ``bits`` bits of per-dimension bucket ranks into
    one Morton (Z-order) value — bit b of dimension d lands at position
    b*D + d. Delegates to operators/layout.interleave_bits (one
    implementation of the bit arithmetic repo-wide); this module keeps
    the QUANTILE-rank write path (skew-balanced grid for the 1-GB-file
    production write), while operators/layout.py owns the exact
    min/max-scaled ANALYSIS path (oracle-checked zone maps, pruning
    reports, Hilbert comparison, streaming maintenance)."""
    from bullet_spark_spark.operators.layout import interleave_bits

    return interleave_bits(ranks, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int,
    bits: int = 6,
    rel_err: float = 0.01,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: rows are range-partitioned and sorted by
    a Morton interleave of per-column QUANTILE ranks, so every file's
    min/max footer statistics are narrow in EVERY z-ordered dimension at
    once. A box predicate on (a, b) then skips files/row-groups on both
    columns — where a linear sort gives narrow stats only for its leading
    column and every later dimension degrades to the full range. This is
    the Delta/Iceberg OPTIMIZE ZORDER posture, built from Spark
    primitives.

    Mechanics: per-dimension bucket edges come from ``approxQuantile``
    (driver materialization bounded at 2^bits-1 doubles per column;
    quantile — not uniform — edges keep the grid balanced under skew),
    the rank is `#edges <= x` evaluated as one array expression (no
    2^bits-deep CASE chain — whole-stage codegen stays within JIT method
    limits), and the write is ``repartitionByRange`` on the z-value (one
    skew-aware shuffle) + ``sortWithinPartitions`` so row groups inside
    each file are z-contiguous too. NULLs rank 0 (the first cell).

    At 100 TB: pick ``num_files`` for ~1 GB files; the quantile pass is
    one extra scan — amortized over every downstream box query."""
    if len(zorder_cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (use sort_cols for 1)")
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    ranks = []
    for c in zorder_cols:
        edges = df.select(F.col(c).cast("double").alias(c)).approxQuantile(
            c, probs, rel_err
        )
        arr = F.array(*[F.lit(float(e)) for e in edges])
        x = F.col(c).cast("double")
        ranks.append(
            F.coalesce(
                F.size(F.filter(arr, lambda e: e <= x)), F.lit(0)
            )
        )
    out = (
        df.withColumn("__z", zorder_key(ranks, bits))
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode(mode).parquet(path)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """Keyed UPSERT into a parquet table without a transactional format:
    rows in ``updates`` replace target rows sharing their key; new keys
    insert — the CDC-apply step (pair with quality.snapshot_diff to
    compute the minimal update set first).

    Partitioned tables rewrite ONLY the directories holding partition
    values present in ``updates`` (the overwrite_partitions discipline):
    read those partitions, anti-join out superseded keys, union the
    updates, dynamic-overwrite. Affected partition values are collected
    to build static pruning filters — bounded by #touched partitions
    (days, sources), never rows. At 100 TB the rewrite cost is
    proportional to touched data, not table size.

    Unpartitioned tables rewrite whole (documented honestly — without a
    table format there is no finer unit); the merged frame is eagerly
    localCheckpoint'ed first, both to break the self-overwrite cycle
    (Spark refuses plans that read the path they write) and so the read
    completes before any file is replaced."""
    partition_cols = partition_cols or []
    if not partition_cols:
        target = spark.read.parquet(path)
        merged = target.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        ).unionByName(updates)
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(path)
        return
    touched = [
        tuple(r) for r in updates.select(*partition_cols).distinct().collect()
    ]  # bounded: #touched partitions
    pred = F.lit(False)
    for values in touched:
        clause = F.lit(True)
        for c, v in zip(partition_cols, values):
            # null-safe: `col == lit(None)` is never true, so a NULL
            # partition value would read back ZERO existing rows while
            # dynamic overwrite still replaces that partition directory —
            # silently dropping its non-superseded keys (r4 advisory)
            clause = clause & F.col(c).eqNullSafe(F.lit(v))
        pred = pred | clause
    target = spark.read.parquet(path).filter(pred)
    merged = target.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    ).unionByName(updates.select(*target.columns))
    merged = merged.localCheckpoint(eager=True)
    overwrite_partitions(merged, path, partition_cols)
