"""Data-layout clustering: Z-order (Morton) interleaving, equal-height
bucketing, per-bucket zone-map stats, and a pruning report that measures
how many buckets a point predicate must touch under a given layout.

This is the write-time half of 100 TB efficiency the rest of the repo's
read-time operators assume: a table clustered on a space-filling curve
gives every *participating* dimension partial locality, so min/max zone
maps (parquet row-group stats, Delta/Iceberg file stats) prune point and
range predicates on ANY of the interleaved dimensions — where a
lexicographic sort prunes only its leading column. The reference has no
layout surface at all (its engine consumes a stream, SURVEY §2.1 P2);
this module extends the engine the way a lakehouse `OPTIMIZE ZORDER BY`
does, expressed as plain DataFrame ops so Catalyst keeps the whole plan.

Engine-exactness: every step is integer arithmetic (bit shifts, masks,
exact integer scaling via the `(a - a % b) / b` identity) plus the SQL
standard's deterministic NTILE over a fully tie-broken ORDER BY — so the
bucket assignment, the zone-map stats, and the pruning counts all
hash-match a DuckDB oracle digit-for-digit.

Two bucketing paths, one semantics:

* :func:`assign_buckets_exact` — NTILE semantics over a DISTRIBUTED
  global rank (range partition + per-partition sort + broadcast
  offsets; r11 — previously a one-task window sort). This is the
  ORACLE-PARITY path: equal-height buckets with the standard's exact
  fill rule (first ``n_rows % n`` buckets take one extra row),
  boundary-independent for a fully tie-broken sort, so it stays
  hash-identical to true NTILE while scaling like a sort-merge
  exchange.
* :func:`cluster_by_range` — ``repartitionByRange`` on the z-key. This
  is the PRODUCTION path: Spark samples range bounds and range-shuffles,
  every partition sorted and written independently — the exact shape a
  real `OPTIMIZE ZORDER` job has (one range exchange, no single-task
  sort). Bucket boundaries are sample-dependent, so this path is
  plan-contract tested (exchange shape + per-partition stats monotone in
  the z-key) rather than value-oracled.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interleave_bits(cols: Sequence[Column], bits: int = 8) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of each
    column → LONG. ``cols[0]`` owns bit positions 0, n, 2n, …; bit b of
    column i lands at position ``b * len(cols) + i``. Inputs must be
    non-negative integers already scaled into ``[0, 2**bits)`` (see
    :func:`scale_int`); total width ``bits * len(cols)`` must be < 63.

    Pure bit arithmetic (shiftright/AND/shiftleft/OR) — identical in any
    engine, stays inside whole-stage codegen (one projection, no UDF).
    """
    n = len(cols)
    if bits * n >= 63:
        raise ValueError(f"interleaved width {bits * n} overflows a long")
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + i))
    return out


def scale_int(col: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Exactly scale an integer column from ``[lo, hi]`` into
    ``[0, 2**bits)``: ``((x - lo) * (2**bits - 1)) div max(1, hi - lo)``.

    The integer division uses the ``(a - a % b) / b`` identity: ``%`` on
    longs is exact, the difference is exactly divisible, and an exact
    double division of values < 2**53 is exact — so the result is
    bit-identical to DuckDB's ``//`` operator without depending on either
    engine's float-division rounding. Caller guarantees
    ``(hi - lo) * (2**bits - 1) < 2**53`` (any real key range at bits<=16).
    """
    top = F.lit((1 << bits) - 1).cast("long")
    a = (col.cast("long") - lo.cast("long")) * top
    b = F.greatest(F.lit(1).cast("long"), hi.cast("long") - lo.cast("long"))
    return ((a - a % b) / b).cast("long")


def zorder_key(
    df: DataFrame, dims: Sequence[str], bits: int = 8, out_col: str = "zkey"
) -> DataFrame:
    """Append a Z-order key over ``dims``: one bounds aggregate (min/max
    per dimension, a single 1-row frame broadcast back — map-side
    partials, no driver collect), then scale + interleave as a single
    projection. At 100 TB this is one pass over the scan plus a 1-row
    cross join — the key itself adds no shuffle."""
    aggs = []
    for d in dims:
        aggs.append(F.min(d).alias(f"__lo_{d}"))
        aggs.append(F.max(d).alias(f"__hi_{d}"))
    bounds = df.agg(*aggs)
    scaled = [
        scale_int(F.col(d), F.col(f"__lo_{d}"), F.col(f"__hi_{d}"), bits)
        for d in dims
    ]
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, interleave_bits(scaled, bits))
        .drop(*[c for d in dims for c in (f"__lo_{d}", f"__hi_{d}")])
    )


def assign_buckets_exact(
    df: DataFrame,
    sort_cols: Sequence[str],
    n_buckets: int = 64,
    out_col: str = "bucket",
) -> DataFrame:
    """Equal-height buckets with NTILE semantics — the SQL standard's
    deterministic fill (first ``rows % n`` buckets get one extra row),
    so bucket membership hash-matches any engine given a fully
    tie-broken ``sort_cols``.

    Computed WITHOUT the single-task global window sort ntile implies
    (r11): range-partition on ``sort_cols``, per-partition sort, then
    global rank = per-partition row_number + broadcast per-partition
    offsets (the exact_quantiles_distributed pattern), and the ntile
    fill rule applied to the rank arithmetically. Partition boundaries
    are SAMPLED by repartitionByRange, but the global rank — and hence
    the bucket id — is boundary-independent for a total order, so the
    oracle surface is bit-identical to true NTILE. The ranged frame is
    pinned by an eager localCheckpoint (NOT persist_generation: callers
    bucketize the same source twice per query — z-order vs linear — and
    a shared generation slot would release the first materialization
    while it is still feeding its consumer; an independent re-execution
    re-samples pids and corrupts the offset pairing, the
    group_quantiles lesson)."""
    spark = df.sparkSession
    n_range = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    cols = [F.col(c) for c in sort_cols]
    # lazy: materializes once at the first consuming action, every later
    # action (the offset build, the final join) reads the same blocks —
    # same pid-consistency guarantee as eager, one fewer scheduling round
    ranged = (
        df.repartitionByRange(n_range, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    pc = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__pc"))
    # pid-count frame: ≤ shuffle-partitions rows — both windows bounded
    off = pc.select(
        "__pid",
        (
            F.sum("__pc").over(Window.orderBy("__pid")) - F.col("__pc")
        ).alias("__off"),
        F.sum("__pc").over(Window.partitionBy(F.lit(1))).alias("__n"),
    )
    rank = (
        F.row_number().over(Window.partitionBy("__pid").orderBy(*cols))
        + F.col("__off")
        - 1
    )
    base = F.floor(F.col("__n") / n_buckets)
    big = F.col("__n") % n_buckets
    head = big * (base + 1)  # rows living in the big (base+1)-sized buckets
    bucket = (
        F.when(F.col("__rank") < head, F.floor(F.col("__rank") / (base + 1)))
        .otherwise(big + F.floor((F.col("__rank") - head) / base))
        + 1
    )
    return (
        ranged.join(F.broadcast(off), "__pid")
        .withColumn("__rank", rank)
        .withColumn(out_col, bucket.cast("int"))
        .drop("__pid", "__off", "__n", "__rank")
    )


def cluster_by_range(
    df: DataFrame, key_col: str, n_buckets: int = 64
) -> DataFrame:
    """Production clustering: range-shuffle on ``key_col`` into
    ``n_buckets`` write partitions (Spark samples split points — one
    range exchange, each partition independently sorted and written; no
    single-task sort). Bucket id = ``spark_partition_id()`` after the
    exchange. Boundaries are sample-dependent → plan-contract tested,
    not value-oracled."""
    return (
        df.repartitionByRange(n_buckets, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("bucket", F.spark_partition_id())
    )


def bucket_stats(
    df: DataFrame, dims: Sequence[str], bucket_col: str = "bucket"
) -> DataFrame:
    """Zone map: per-bucket min/max of every dimension + row count — the
    file-level stats a lakehouse keeps per data file. One aggregation
    with map-side partials; output is ``n_buckets`` rows regardless of
    input size."""
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for d in dims:
        aggs.append(F.min(d).alias(f"min_{d}"))
        aggs.append(F.max(d).alias(f"max_{d}"))
    return df.groupBy(bucket_col).agg(*aggs)


def pruning_report(
    stats: DataFrame,
    keys: DataFrame,
    dim: str,
    key_col: str,
    layout: str,
) -> DataFrame:
    """How many buckets must a point predicate ``dim = k`` read under
    this layout? For every key, count the zone-map rows whose
    ``[min_dim, max_dim]`` contains it; report the average (rounded 6dp)
    and the worst case over all keys, labeled with the layout name →
    one row. The join is keys × n_buckets zone-map rows — the zone map
    side is bounded (files, not rows), broadcast; this is exactly the
    planning-time cost a real engine pays to prune, which is the point:
    the report measures read amplification WITHOUT scanning the data."""
    touched = (
        keys.crossJoin(F.broadcast(stats))
        .filter(
            (F.col(key_col) >= F.col(f"min_{dim}"))
            & (F.col(key_col) <= F.col(f"max_{dim}"))
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("touched"))
    )
    return touched.agg(
        F.lit(layout).alias("layout"),
        F.round(
            F.sum("touched").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_buckets"),
        F.max("touched").cast("long").alias("max_buckets"),
    )


def zorder_key_fixed(
    df: DataFrame,
    bounds: Sequence[tuple[str, int, int]],
    bits: int = 8,
    out_col: str = "zkey",
) -> DataFrame:
    """Z-order key with CALLER-PROVIDED per-dimension bounds — the
    STREAMING variant: a live stream has no global min/max to aggregate,
    so production zone-map maintenance pins the bounds from a historical
    profile (values outside clamp to the edge buckets via greatest/
    least). Pure projection — works identically on a batch frame and a
    streaming frame, which is what the drip≡batch parity test exercises.

    ``bounds`` is an ordered [(col, lo, hi), ...]; ordering fixes which
    column owns bit 0 (same convention as :func:`interleave_bits`)."""
    scaled = [
        scale_int(
            F.greatest(F.lit(lo).cast("long"),
                       F.least(F.lit(hi).cast("long"), F.col(c).cast("long"))),
            F.lit(lo), F.lit(hi), bits,
        )
        for c, lo, hi in bounds
    ]
    return df.withColumn(out_col, interleave_bits(scaled, bits))


def prefix_bucket(
    zkey: Column, total_bits: int, n_buckets: int
) -> Column:
    """Fixed-boundary bucket id: the top log2(n_buckets) bits of the
    z-key — equal-WIDTH z-ranges (unlike NTILE's equal-height), so the
    assignment is a stateless projection any micro-batch can compute
    without seeing the rest of the data. ``n_buckets`` must be a power
    of two ≤ 2**total_bits."""
    lg = n_buckets.bit_length() - 1
    if (1 << lg) != n_buckets or lg > total_bits:
        raise ValueError(f"n_buckets={n_buckets} not a power of two <= 2^{total_bits}")
    return F.shiftright(zkey, total_bits - lg).cast("long")


def _hilbert_xy2d(n: int, x: int, y: int) -> int:
    """Reference Hilbert index (Wikipedia's iterative xy2d): maps (x, y)
    in [0, n)² onto [0, n²) along the Hilbert curve."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_table(spark, bits: int = 8):
    """The full 2-D Hilbert mapping as a (hx, hy, hd) DataFrame —
    2^(2·bits) rows (65 536 at bits=8, ~1 MB): small enough to BROADCAST,
    which is the whole design. The curve's per-bit rotation state makes a
    closed-form Column expression explode exponentially in plan size; a
    broadcast lookup join keeps the computation JVM-side, exact, and
    plan-friendly at any data size (the r6 interpreted-HOF lesson applied
    to layout: precompute once, join, never per-row Python)."""
    n = 1 << bits
    rows = [
        (x, y, _hilbert_xy2d(n, x, y)) for x in range(n) for y in range(n)
    ]
    return spark.createDataFrame(rows, "hx long, hy long, hd long")


def hilbert_key(
    df: DataFrame,
    dims: Sequence[str],
    bits: int = 8,
    out_col: str = "hkey",
) -> DataFrame:
    """Append a 2-D Hilbert clustering key: the z-order alternative with
    strictly better locality (consecutive curve positions are always
    grid-adjacent — no Z-shape jumps), so zone maps prune a bit tighter
    on the same bucket count. Bounds scale exactly like
    :func:`zorder_key`; the curve mapping rides a broadcast hash join
    against the 2^(2·bits)-row lookup — one scan, no extra shuffle.

    Row preservation (r7 advisory): the lookup join is LEFT, so a row
    with a NULL dimension keeps its place with a NULL ``hkey`` — the
    same semantics :func:`zorder_key` gives such rows (they sort last
    under NULLS LAST and never silently disappear from the layout)."""
    if len(dims) != 2:
        raise ValueError("hilbert_key is 2-D (use zorder_key for N dims)")
    aggs = []
    for d in dims:
        aggs.append(F.min(d).alias(f"__lo_{d}"))
        aggs.append(F.max(d).alias(f"__hi_{d}"))
    bounds = df.agg(*aggs)
    table = hilbert_table(df.sparkSession, bits)
    scaled = df.crossJoin(F.broadcast(bounds)).select(
        "*",
        scale_int(
            F.col(dims[0]), F.col(f"__lo_{dims[0]}"), F.col(f"__hi_{dims[0]}"), bits
        ).alias("__sx"),
        scale_int(
            F.col(dims[1]), F.col(f"__lo_{dims[1]}"), F.col(f"__hi_{dims[1]}"), bits
        ).alias("__sy"),
    )
    return (
        scaled.join(
            F.broadcast(table),
            (F.col("__sx") == F.col("hx")) & (F.col("__sy") == F.col("hy")),
            "left",
        )
        .withColumn(out_col, F.col("hd"))
        .drop("hx", "hy", "hd", "__sx", "__sy",
              *[c for d in dims for c in (f"__lo_{d}", f"__hi_{d}")])
    )


def compaction_plan(
    files: DataFrame,
    size_col: str,
    target_bytes: int,
    partition_cols: Sequence[str] | None = None,
    file_id_col: str | None = None,
) -> DataFrame:
    """Small-file compaction plan → one row per planned output shard:
    (partition..., shard, file_count, total_bytes, fill_ratio). The
    table-maintenance half of the layout family: zorder_key decides
    ROW order inside files; this decides which existing small FILES
    merge into which ~``target_bytes`` rewrite task (the OPTIMIZE /
    bin-packing step every long-lived 100 TB table needs, or read
    amplification accretes one tiny parquet footer at a time).

    Semantics: within each partition, files sort size-DESC (id
    tiebreak) and the exclusive cumulative byte count assigns shard =
    floor(cum_excl / target) — the deterministic, fully-declarative
    variant of first-fit-decreasing: bin boundaries stripe the
    cumulative byte axis, so every shard's total differs from target
    by at most one member file, oversized files isolate into their own
    shard, and the DESC order pools the long small-file tail into the
    final stripes instead of sprinkling stragglers everywhere.
    Integer-exact except ``fill_ratio`` (one IEEE division, 6 dp).

    Scale shape: a file INVENTORY is metadata-scale (100 TB at 128 MB
    ≈ 800k rows), so the per-partition cumsum window is one shuffle of
    almost nothing; the plan never touches the data files themselves —
    execute it by feeding each (partition, shard) group to a rewrite
    job. Pass ``file_id_col`` whenever sizes can tie — it is the sort
    tiebreak that keeps shard membership deterministic across runs."""
    if target_bytes <= 0:
        # floor(cum/0) would yield NULL/Inf shard ids — a silent garbage
        # plan rather than an error (ADVICE r9)
        raise ValueError(f"target_bytes must be > 0, got {target_bytes}")
    keys = list(partition_cols or [])
    order = [F.col(size_col).desc()]
    if file_id_col:
        order.append(F.col(file_id_col).asc())
    # unpartitioned-by-design fallback: a FILE INVENTORY is metadata-
    # scale (~800k rows at 100 TB / 128 MB), bounded
    w = (
        Window.partitionBy(*keys).orderBy(*order)
        if keys
        else Window.partitionBy().orderBy(*order)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cx = F.sum(size_col).over(w) - F.col(size_col)
    assigned = files.withColumn(
        "__shard",
        F.floor(cx / F.lit(float(target_bytes))).cast("bigint"),
    )
    return (
        assigned.groupBy(*keys, "__shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("file_count"),
            F.sum(size_col).cast("bigint").alias("total_bytes"),
        )
        .select(
            *keys,
            F.col("__shard").alias("shard"),
            "file_count",
            "total_bytes",
            F.round(
                F.col("total_bytes").cast("double")
                / F.lit(float(target_bytes)),
                6,
            ).alias("fill_ratio"),
        )
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | Sequence[str],
    buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Write ``df`` as an EXTERNAL BUCKETED table: rows are hash-routed
    into ``buckets`` files per partition by ``key`` (Spark's Murmur3
    bucket spec), optionally sorted within each bucket. This is the
    write-time contract that makes later joins and aggregations on the
    bucket key SHUFFLE-FREE: two tables bucketed on the same key with
    compatible bucket counts sort-merge-join with no Exchange on either
    side — at 100 TB the exchange this deletes IS the join's cost.
    Idempotent: an existing table of the same name is replaced."""
    keys = [key] if isinstance(key, str) else list(key)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.bucketBy(buckets, keys[0], *keys[1:])
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.option("path", path).mode("overwrite").format("parquet").saveAsTable(
        table
    )


def bucketed_join(
    spark,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two ALREADY-BUCKETED catalog tables on their bucket key. With
    matching bucket specs Catalyst reports both scans as pre-partitioned
    (HashPartitioning over the bucket columns), so the sort-merge join
    plans with ZERO Exchange operators — verify with
    :func:`assert_no_join_exchange` in tests. Broadcast is disabled for
    this one join via hints (a broadcast would hide the co-location
    contract being exercised)."""
    lt = spark.table(left_table).hint("SHUFFLE_MERGE")
    rt = spark.table(right_table)
    keys = [on] if isinstance(on, str) else list(on)
    return lt.join(rt, on=keys, how=how)


def assert_no_exchange(df: DataFrame, what: str = "bucketed plan") -> None:
    """Raise when the physical plan contains any Exchange (shuffle or
    broadcast) — the bucketing co-location contract, shared by the join
    form (both sides pre-partitioned) and the aggregation form (groupBy
    on the bucket key consumes the scan's HashPartitioning directly,
    collapsing partial+final into one stage)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            f"{what} planned an Exchange — co-location contract broken:\n"
            + plan
        )


def assert_no_join_exchange(df: DataFrame) -> None:
    """Join-form alias of :func:`assert_no_exchange`: call on the raw
    bucketed join BEFORE any re-keyed aggregation (which legitimately
    shuffles)."""
    assert_no_exchange(df, "bucketed join")
