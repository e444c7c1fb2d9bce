"""Temporal relational operators: as-of join, range/interval join,
time-bucket hierarchical rollup.

Absent from the reference (SURVEY §2.5 gap ledger — its only join is the
keyed partial-aggregate merge, JoinStreaming.scala:20-27, and its only time
notion is emission windows, §2.4). These are the time-series capabilities a
Spark-native engine adds on top, expressed so Catalyst keeps the physical
plan shuffle-minimal:

- ``asof_join``: union + carry-forward window. ONE shuffle on the key, no
  range-explosion, no per-row subquery. This is the scalable shape: a naive
  ``l.ts >= r.ts`` theta-join is a quadratic BroadcastNestedLoop; sorting the
  union and carrying the latest right row forward is O(n log n) within each
  key partition and streams at 100 TB.
- ``range_join_bucketed``: interval containment join via bucket-explode +
  equi-join. Each interval lands in every bucket it overlaps; points join
  their bucket only — candidate pairs are bucket-local, never the cross
  product. For a small interval side, pass ``broadcast_intervals=True`` and
  skip bucketing entirely (BroadcastNestedLoop over a tiny build side is
  cheaper than exploding).
- ``time_bucket_rollup``: hypertable-style continuous-aggregate hierarchy —
  coarser resolutions re-aggregate the FINER level's partials, so the raw
  table is scanned exactly once no matter how many resolutions are asked
  for. Partial sums stay DECIMAL until the final projection so every level
  is engine-order-independent (exact, mergeable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bullet_spark_spark.operators._cache import persist_generation


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tolerance_sec: float | None = None,
    suffix: str = "",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with the
    greatest ``right_ts <= left_ts`` for the same key (inclusive, like DuckDB
    ``ASOF JOIN`` / pandas ``merge_asof``). Unmatched left rows keep NULLs.

    Physical shape: tag both sides, union, sort each key partition by
    (ts, side) with right rows ordered before left rows at equal ts, then
    ``last(payload, ignorenulls=True)`` over an unbounded-preceding frame
    carries the latest right payload onto each left row. Exactly one shuffle
    (the window partitionBy), linear scan per partition.

    ``tolerance_sec`` additionally voids matches older than the given
    horizon (match kept only if ``left_ts - matched_ts <= tolerance``).
    """
    payload = F.struct(
        F.col(right_ts).alias("__matched_ts"),
        *[F.col(c) for c in right_value_cols],
    )
    r = right.select(
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__r"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in key_cols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_sec is not None:
        in_tol = (
            F.col("__ts").cast("double")
            - F.col("__match.__matched_ts").cast("double")
        ) <= F.lit(float(tolerance_sec))
        carried = carried.withColumn(
            "__match", F.when(in_tol, F.col("__match"))
        )
    out_left = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_right = [
        F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_value_cols
    ]
    return carried.select(
        *out_left,
        F.col("__match.__matched_ts").alias(f"{right_ts}{suffix}_matched"),
        *out_right,
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Interval-containment join: every (point, interval) pair with
    ``lo <= point < hi``.

    ``broadcast_intervals=True`` (small interval side — price bands, SLA
    tiers): plain theta-join over a broadcast build side; Catalyst plans
    BroadcastNestedLoop, which is optimal when the build side is tiny.

    Otherwise (fact-fact): both sides map to width-``bucket_width`` buckets —
    points to ``floor(p/w)``, intervals exploded to every bucket they
    overlap — and the join becomes a bucket equi-join + residual predicate.
    Candidate pairs are bucket-local; shuffle keys are bucket ids, so skew
    follows bucket occupancy (pick ``bucket_width`` near the median interval
    width to bound the explode factor).
    """
    pred = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    if broadcast_intervals:
        return points.join(F.broadcast(intervals), on=pred)
    w = float(bucket_width)
    p = points.withColumn("__b", F.floor(F.col(point_col) / F.lit(w)))
    # degenerate/reversed intervals (hi <= lo) match nothing by definition —
    # and MUST be dropped before the explode: sequence(start, stop) with
    # stop < start generates a DESCENDING range, so one bad row would
    # explode to millions of buckets. The exclusive hi is handled exactly
    # (drop the last bucket iff hi sits on its edge), not with an absolute
    # epsilon that underflows at large magnitudes.
    stop = F.floor(F.col(hi_col) / F.lit(w)) - F.when(
        F.col(hi_col) % F.lit(w) == 0, F.lit(1)
    ).otherwise(F.lit(0))
    iv = intervals.filter(F.col(lo_col) < F.col(hi_col)).withColumn(
        "__b",
        F.explode(F.sequence(F.floor(F.col(lo_col) / F.lit(w)), stop)),
    )
    return p.join(iv, on="__b").filter(pred).drop("__b")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float | None = None,
    broadcast_right: bool = False,
    max_buckets_per_row: int | None = 4096,
) -> DataFrame:
    """Interval × interval OVERLAP join: every (l, r) pair of VALID
    (``lo < hi``) intervals with ``l.lo < r.hi AND r.lo < l.hi``
    (half-open [lo, hi) overlap — the Allen-algebra "not before, not
    after" union; a degenerate [x, x) interval is EMPTY and matches
    nothing on every path). Completes the temporal join trio: asof
    (point←latest point), range (point∈interval), THIS
    (interval∩interval ≠ ∅) — outage windows × sessions, maintenance ×
    SLAs, speech segments × annotation spans.

    ``broadcast_right=True`` (small right side): plain theta-join over a
    broadcast build — BroadcastNestedLoop is optimal for a tiny build
    side. Otherwise BOTH sides explode to every width-``bucket_width``
    bucket they touch and the join is a bucket equi-join + residual
    overlap predicate; a pair overlapping across several shared buckets
    would duplicate, so the pair is kept only in the FIRST shared bucket
    — ``greatest(floor(l.lo/w), floor(r.lo/w)) = bucket`` — a pure
    per-row predicate (no post-join distinct over the candidate space).

    Explode-factor guards (r11, VERDICT r10 #4 — the factor is no longer
    caller-trusted):

    * ``bucket_width=None`` (default) derives the width IN-ENGINE as the
      MEDIAN valid-interval length across both sides (one cheap
      percentile aggregate) — the width that bounds the typical explode
      at ~2 rows/interval; the explicit override remains.
    * ``max_buckets_per_row`` (default 4096) caps the per-row explode:
      an interval longer than ``cap·w`` (one year-long outage among
      second-scale sessions would otherwise quietly multiply rows by
      ~len/w) is SPLIT OUT of the bucket path and joined via a broadcast
      theta-join instead — exact, and cheap precisely because long-tail
      rows are few by definition (if they aren't, they dominate every
      bucket anyway and the theta join is the honest plan). Pair-
      disjoint routing: (long l × every r) ∪ (short l × long r) ∪
      (short l × short r via buckets). ``None`` disables the split."""
    pred = (F.col(left_lo) < F.col(right_hi)) & (F.col(right_lo) < F.col(left_hi))
    valid_l = F.col(left_lo) < F.col(left_hi)
    valid_r = F.col(right_lo) < F.col(right_hi)
    if broadcast_right:
        return left.filter(valid_l).join(
            F.broadcast(right.filter(valid_r)), on=pred
        )
    # each side fans out to several consumers (median-width agg, the
    # long/short split filters, the broadcast theta builds) — unpersisted,
    # every consumer re-executes the side's upstream lineage (audit_scans:
    # 9 base-table scans on the skew fixture). One bounded generation per
    # call site; sides are interval frames, typically aggregates of the
    # base tables.
    from bullet_spark_spark.operators._cache import persist_generation

    left, right = persist_generation(
        "temporal.interval_overlap.sides",
        left.filter(valid_l),
        right.filter(valid_r),
    )
    if bucket_width is None:
        # one cheap agg: approx median of valid-interval lengths, both
        # sides pooled — a plan-shape parameter, not an answer, so the
        # sketch percentile is fine. LAZY since r12 (VERDICT r11 task 3):
        # the old ``.first()`` was 4-6 serial construct-time driver jobs
        # (it materialized both persisted sides before the action); the
        # width is now a persisted 1-row aggregate attached by scalar
        # subquery everywhere a literal width was used. The persist is
        # the consistency guarantee: the width feeds MANY branches (the
        # long/short routing filters, both explodes, the first-shared-
        # bucket dedup), and a per-branch re-evaluation of the sketch
        # could route a pair long on one side and short on the other —
        # all branches must (and do) read the one cached row.
        lens = left.select(
            (F.col(left_hi) - F.col(left_lo)).cast("double").alias("__len")
        ).unionByName(
            right.select(
                (F.col(right_hi) - F.col(right_lo)).cast("double").alias("__len")
            )
        )
        wdf = lens.agg(F.percentile_approx("__len", F.lit(0.5)).alias("__m")).select(
            F.when(
                F.col("__m").isNotNull() & (F.col("__m") > 0), F.col("__m")
            )
            .otherwise(F.lit(1.0))
            .alias("__w")
        )
        (wdf,) = persist_generation("temporal.interval_overlap.width", wdf)
        wcol = wdf.scalar()
    else:
        wcol = F.lit(float(bucket_width))

    if max_buckets_per_row is not None:
        long_len = wcol * F.lit(int(max_buckets_per_row))
        long_l = (F.col(left_hi) - F.col(left_lo)) > long_len
        long_r = (F.col(right_hi) - F.col(right_lo)) > long_len
        left_long = left.filter(long_l)
        right_long = right.filter(long_r)
        left_bkt = left.filter(~long_l)
        right_bkt = right.filter(~long_r)
    else:
        left_bkt, right_bkt = left, right
        left_long = right_long = None

    def explode_side(df: DataFrame, lo: str, hi: str) -> DataFrame:
        start = F.floor(F.col(lo) / wcol)
        stop = F.floor(F.col(hi) / wcol) - F.when(
            F.col(hi) % wcol == 0, F.lit(1)
        ).otherwise(F.lit(0))
        # degenerate (hi <= lo) intervals match nothing AND would explode
        # a descending sequence — dropped upstream (valid_* filters).
        # Bucket endpoints are projected BEFORE the explode: a scalar
        # subquery is legal in a Project/Filter but not inside a Generate.
        return (
            df.withColumn("__bs", start)
            .withColumn("__be", F.greatest(stop, start))
            .withColumn("__b", F.explode(F.sequence("__bs", "__be")))
            .drop("__bs", "__be")
        )

    l = explode_side(left_bkt, left_lo, left_hi)
    r = explode_side(right_bkt, right_lo, right_hi)
    first_shared = F.greatest(
        F.floor(F.col(left_lo) / wcol), F.floor(F.col(right_lo) / wcol)
    )
    out = (
        l.join(r, on="__b")
        .filter(pred & (F.col("__b") == first_shared))
        .drop("__b")
    )
    if max_buckets_per_row is not None:
        # (long l × every valid r): broadcast the long LEFT build side
        pairs_ll = right.join(F.broadcast(left_long), on=pred)
        # (short l × long r): broadcast the long RIGHT build side
        pairs_sr = left_bkt.join(F.broadcast(right_long), on=pred)
        out = out.unionByName(
            pairs_ll.select(*out.columns)
        ).unionByName(pairs_sr.select(*out.columns))
    return out


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    levels: list[str],
    aggs: list[tuple[str, str, str]],
) -> DataFrame:
    """Multi-resolution time-bucket aggregation with partial reuse
    (hypertable continuous-aggregate shape).

    ``levels``: coarsening ``date_trunc`` units, finest first (e.g.
    ``["day", "month", "year"]``). ``aggs``: (op, col, out_name) with op ∈
    count/sum — the decomposable set, so level k+1 re-aggregates level k's
    partials and the base table is scanned ONCE total. Sums accumulate in
    DECIMAL(28,4) until the final projection: exact, order-independent, and
    mergeable across levels without float drift.

    Returns one frame: (level, bucket_start, <aggs...>), every level unioned.
    """
    partial_cols = []
    for op, col, out in aggs:
        if op == "count":
            partial_cols.append(F.count(F.lit(1)).cast("decimal(28,4)").alias(f"__p_{out}"))
        elif op == "sum":
            partial_cols.append(
                F.sum(F.col(col).cast("decimal(28,4)")).alias(f"__p_{out}")
            )
        else:
            raise ValueError(f"time_bucket_rollup: non-decomposable op {op!r}")

    fine = (
        df.groupBy(F.date_trunc(levels[0], F.col(ts_col)).alias("bucket_start"))
        .agg(*partial_cols)
    )

    def finalize(frame: DataFrame, level: str) -> DataFrame:
        outs = []
        for op, _col, out in aggs:
            c = F.col(f"__p_{out}")
            outs.append(
                c.cast("bigint").alias(out) if op == "count" else c.cast("double").alias(out)
            )
        return frame.select(
            F.lit(level).alias("level"), "bucket_start", *outs
        )

    out = finalize(fine, levels[0])
    prev = fine
    for lvl in levels[1:]:
        merge = [
            F.sum(F.col(f"__p_{out_}")).alias(f"__p_{out_}") for _op, _c, out_ in aggs
        ]
        prev = prev.groupBy(
            F.date_trunc(lvl, F.col("bucket_start")).alias("bucket_start")
        ).agg(*merge)
        out = out.unionByName(finalize(prev, lvl))
    return out


def distinct_rollup(
    df: DataFrame,
    ts_col: str,
    levels: list[str],
    key_col: str,
    out_name: str = "n_distinct",
) -> DataFrame:
    """Multi-resolution EXACT count-distinct rollup with partial reuse.

    COUNT DISTINCT is not decomposable from counts, but it IS decomposable
    from distinct (bucket, key) pairs: aggregate (finest_bucket, key) once —
    one shuffle over the base table — then every coarser level re-dedups
    the previous level's pair set, which is already ≤ |buckets|·|keys| and
    shrinks at each step. The base table is scanned exactly once; no
    sketch, no approximation (the HLL path stays available through
    CountDistinctAgg(approx=True) for when estimates suffice).

    The finest level aggregates a per-pair row count rather than a bare
    ``distinct()``, and every level reports that count as ``n_rows``
    alongside the distinct count. This is not just useful output — it is
    what keeps the single-scan shape: a pure dedup-over-dedup chain gets
    collapsed by Catalyst (RemoveRedundantAggregates after column pruning)
    back into independent full-table dedups per level (one base scan and
    one raw-row shuffle PER level); a counted aggregate whose count is
    consumed downstream is not removable, so the (bucket, key) exchange
    survives and AQE reuses it for every coarser level (plan-asserted in
    tests).

    Returns (level, bucket_start, <out_name>, n_rows), every level unioned,
    finest first.
    """
    pairs = df.groupBy(
        F.date_trunc(levels[0], F.col(ts_col)).alias("bucket_start"),
        F.col(key_col).alias("__k"),
    ).agg(F.count(F.lit(1)).alias("__c"))

    def count_level(p: DataFrame, level: str) -> DataFrame:
        return (
            p.groupBy("bucket_start")
            .agg(
                F.count(F.lit(1)).alias(out_name),
                F.sum("__c").cast("bigint").alias("n_rows"),
            )
            .select(F.lit(level).alias("level"), "bucket_start", out_name, "n_rows")
        )

    out = count_level(pairs, levels[0])
    prev = pairs
    for lvl in levels[1:]:
        prev = prev.groupBy(
            F.date_trunc(lvl, F.col("bucket_start")).alias("bucket_start"),
            F.col("__k"),
        ).agg(F.sum("__c").alias("__c"))
        out = out.unionByName(count_level(prev, lvl))
    return out


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    lookback_sec: float = 600.0,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time interval bound — the
    streaming counterpart of the batch as-of/range joins.

    Both sides are watermarked by ``max_delay`` and the join predicate
    bounds ``right_ts ∈ [left_ts − lookback, left_ts]``. The time bound is
    what makes the join's state finite: with watermarks on both inputs and
    a range condition on the event times, Structured Streaming evicts
    buffered rows as the watermark passes them — unbounded state otherwise
    (the same discipline streaming_dedup applies, and the one the
    reference's tombstone cache lacks, JoinStreaming.scala:60-62).

    ``how``: inner (both sides bounded) or left_outer (NULLs emitted once
    the watermark proves no match can arrive).
    """
    from bullet_spark_spark.sources.streaming import ensure_event_time

    l_wm = ensure_event_time(left, left_ts).withWatermark(left_ts, max_delay)
    r_wm = ensure_event_time(right, right_ts).withWatermark(right_ts, max_delay)
    # side-qualified refs: with the natural call where both streams name
    # their event-time column the same (e.g. "ts"), bare F.col() would be
    # ambiguous (or resolve one-sided, making the bound vacuous and state
    # unbounded)
    lt, rt = l_wm[left_ts], r_wm[right_ts]
    cond = (rt <= lt) & (rt >= lt - F.expr(f"INTERVAL {int(lookback_sec)} SECONDS"))
    for k in key_cols:
        cond = cond & (l_wm[k] == r_wm[k])
    return l_wm.join(r_wm, on=cond, how=how)


def zscore_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "day",
    trailing: int = 7,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Time-series anomaly flags — the monitoring read of the engine's
    own domain (bullet watches live streams; this is the 'did today's
    metric move' question asked of any pipeline): bucket the stream,
    compare each bucket's mean against the mean/std of the ``trailing``
    preceding buckets, flag |z| ≥ ``z_thresh``. Buckets with fewer than
    3 trailing observations yield NULL z and no verdict. A zero-variance
    baseline yields NULL z too (the score is undefined) but DOES flag
    when the bucket deviates from it — a constant metric suddenly moving
    is the canonical incident, not a division-by-zero edge to swallow.

    Cross-engine exact: bucket means are decimal-quantized (18,6) BEFORE
    the trailing-window sums, so Σx and Σx² are exact decimals (window
    frame accumulation order — segment trees vs running sums — differs
    between engines for floats, and would flip borderline flags); the
    variance ((Σx² − n·mean²)/(n−1)) then evaluates in identical IEEE
    arithmetic everywhere. One shuffle for the bucket aggregation; the
    trailing window runs single-partition over the BUCKET-count-sized
    frame (add a series key to the window partition for per-metric
    monitoring at scale)."""
    from pyspark.sql.window import Window as _W

    b = F.date_trunc(bucket, F.col(ts_col)).cast("timestamp")
    per = df.groupBy(b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).cast("decimal(18,6)").alias("m"),
    )
    # unpartitioned by design: one row per TIME BUCKET (range/width-
    # bounded), not per record
    w = _W.orderBy("bucket").rowsBetween(-trailing, -1)
    s1 = F.sum("m").over(w).cast("double")
    s2 = F.sum(F.col("m") * F.col("m")).over(w).cast("double")
    c = F.count("m").over(w)
    mean_b = s1 / c
    var = (s2 - c * mean_b * mean_b) / (c - 1)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    zcol = F.when(
        (c >= 3) & (std > 0),
        F.round((F.col("m").cast("double") - mean_b) / std, 6),
    )
    flat_shift = (c >= 3) & (std == 0) & (F.col("m").cast("double") != mean_b)
    return per.select(
        "bucket",
        "n",
        F.col("m").cast("double").alias("mean"),
        zcol.alias("z"),
        (
            (zcol.isNotNull() & (F.abs(zcol) >= z_thresh))
            | F.coalesce(flat_shift, F.lit(False))
        ).alias("is_anomaly"),
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    step_seconds: int,
) -> DataFrame:
    """Regularize an irregular per-key time series onto a fixed grid with
    forward-fill → (key, bucket_ts, values…, is_gap): every key gets one
    row per ``step_seconds`` bucket between its first and last
    observation; buckets with no observation carry the latest prior
    values (is_gap = true). The resample step before any
    window/anomaly/retention computation that assumes a dense grid
    (zscore_anomalies' trailing windows, charting, rate-of-change).

    Multiple observations in one bucket keep the LATEST (by raw ts, ties
    by value for a total order). The grid is per key — a key's series is
    never padded beyond its own observed range (global padding would
    manufacture data before a key existed).

    Shape at 100 TB: one shuffle on the key computes each key's
    (min, max) bucket span; the dense grid is generated by
    ``sequence()`` + explode — rows ∝ output size, no join against a
    calendar table; the fill is one last-non-null window per key in
    bucket order. Pathologically long spans (a key observed once a year
    on a 1 s grid) inflate the explode — callers choose ``step_seconds``
    to match the series cadence."""
    from pyspark.sql.window import Window as W

    bucket = (F.unix_timestamp(F.col(ts_col)) / step_seconds).cast("long")
    per_bucket = (
        df.withColumn("__b", bucket)
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(key_col, "__b").orderBy(
                    F.col(ts_col).desc(), *[F.col(c).desc() for c in value_cols]
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        # join-presence marker: is_gap must flag MISSING buckets, not
        # buckets whose observed first value column happens to be NULL —
        # deriving it from value_cols[0] IS NULL conflated the two and
        # forward-filled over real NULL observations (r4 advisory)
        .select(key_col, "__b", *value_cols, F.lit(True).alias("__present"))
    )
    spans = per_bucket.groupBy(key_col).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = spans.select(
        key_col, F.explode(F.sequence("__lo", "__hi")).alias("__b")
    )
    joined = grid.join(per_bucket, [key_col, "__b"], "left")
    w = (
        W.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = joined.select(
        F.col(key_col),
        F.to_timestamp(F.col("__b") * step_seconds).alias("bucket_ts"),
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
        F.col("__present").isNull().alias("is_gap"),
    )
    return filled


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Regularize an irregular per-key series onto a fixed grid with
    LINEAR INTERPOLATION → (key, bucket_ts, value, is_interp): the
    measurement companion of :func:`resample_ffill` (forward-fill is
    right for STATE series — a config that held until changed; linear
    interpolation is right for MEASUREMENT series — a gauge sampled
    irregularly, where holding the last read biases every downstream
    rate/derivative).

    Same grid machinery as resample_ffill (per-key span, sequence +
    explode — rows ∝ output, no calendar join); gaps take
    ``v_prev + (v_next − v_prev)·(b − b_prev)/(b_next − b_prev)`` from
    one backward and one forward last/first-non-null window per key —
    both PARTITIONED by key (parallel). Grid edges always coincide with
    observations (the span is the key's own min/max bucket), so every
    gap is interior and the interpolation is total. Observations with a
    NULL value are treated as missing (interpolated over). One IEEE
    expression per gap, written token-identically in the oracle."""
    from pyspark.sql.window import Window as W

    bucket = (F.unix_timestamp(F.col(ts_col)) / step_seconds).cast("long")
    per_bucket = (
        df.withColumn("__b", bucket)
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(key_col, "__b").orderBy(
                    F.col(ts_col).desc(), F.col(value_col).desc()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(
            key_col,
            "__b",
            F.col(value_col).cast("double").alias("__v"),
            F.lit(True).alias("__present"),
        )
    )
    spans = per_bucket.groupBy(key_col).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = spans.select(
        key_col, F.explode(F.sequence("__lo", "__hi")).alias("__b")
    )
    joined = grid.join(per_bucket, [key_col, "__b"], "left")
    back = (
        W.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    known_b = F.when(F.col("__v").isNotNull(), F.col("__b"))
    pv = F.last("__v", ignorenulls=True).over(back)
    pb = F.last(known_b, ignorenulls=True).over(back)
    nv = F.first("__v", ignorenulls=True).over(fwd)
    nb = F.first(known_b, ignorenulls=True).over(fwd)
    interp = pv + (nv - pv) * (
        (F.col("__b") - pb).cast("double") / (nb - pb).cast("double")
    )
    out_v = F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(
        # one-sided edges (all-NULL observed values on a side) degrade to
        # the available neighbor
        F.when(pb.isNull(), nv).when(nb.isNull(), pv).otherwise(interp)
    )
    return joined.select(
        F.col(key_col),
        F.to_timestamp(F.col("__b") * step_seconds).alias("bucket_ts"),
        # floor quantization, not round(): interpolation fractions like
        # 1/2 land EXACTLY on .5 micro-boundaries where engine round()
        # tie-breaking differs (HALF_UP vs HALF_EVEN — the sim_int8
        # lesson); floor is IEEE-identical everywhere
        (F.floor(out_v * F.lit(1e6)) / F.lit(1e6)).alias("value"),
        F.col("__v").isNull().alias("is_interp"),
    )


def period_over_period(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    unit: str = "day",
    agg: str = "sum",
) -> DataFrame:
    """Period-over-period growth → (bucket_start, value, prev_value,
    pct_change): the BI staple (DoD/WoW/MoM deltas). ``agg`` ∈ sum/count;
    sums accumulate as exact decimals (engine-order-independent), the
    comparison is against the PREVIOUS EXISTING bucket (gaps compare to
    the last observed period — resample_ffill first if strict-calendar
    adjacency is required). pct_change = (v − prev)/prev rounded 6 dp,
    NULL for the first bucket and for prev = 0.

    One aggregation to #buckets rows; the lag window runs over that tiny
    frame (single partition by construction — harmless at any corpus
    size because the frame is bucket-count-sized)."""
    from pyspark.sql.window import Window as W

    if agg == "sum":
        a = F.sum(F.col(value_col).cast("decimal(28,6)")).cast("double")
    elif agg == "count":
        a = F.count(F.lit(1)).cast("double")
    else:
        raise ValueError(f"period_over_period supports sum/count, got {agg!r}")
    b = (
        df.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("bucket_start"))
        .agg(a.alias("value"))
    )
    w = W.partitionBy().orderBy("bucket_start")
    out = b.withColumn("prev_value", F.lag("value").over(w))
    pct = F.when(
        F.col("prev_value").isNotNull() & (F.col("prev_value") != 0),
        F.round(
            (F.col("value") - F.col("prev_value")) / F.col("prev_value"), 6
        ),
    )
    return out.withColumn("pct_change", pct)


def trailing_window_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
    out_col: str = "trailing_sum",
) -> DataFrame:
    """Per-key trailing time-RANGE aggregate: for every row, the exact
    decimal sum of ``value_col`` over [ts − window_sec, ts] for the same
    key — the rolling-revenue/rolling-volume signal (time-based frame, so
    irregular series need no resampling first; a ROWS frame would count
    events, not time). Event-count over the same range rides along as
    ``<out>_n``.

    One shuffle (the key partition); the RANGE frame is Spark's native
    running-frame scan over each key's sorted partition — no self-join,
    no explode. Rows sharing (key, ts) are frame-PEERS under RANGE
    semantics: each includes the other (standard SQL; identical in
    DuckDB), so no tiebreak is needed for determinism. The frame orders
    by MICROSECOND epoch (unix_micros / DuckDB epoch_us) — second-level
    truncation silently widens frames at sub-second event rates AND
    diverges from engines whose epoch keeps fractions (surfaced by the
    sf0.1 cross-engine sweep). Sums accumulate as DECIMAL (exact,
    order-independent within the frame) and surface as double rounded
    6 dp."""
    w = (
        W.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-window_sec * 1_000_000, 0)
    )
    s = F.round(
        F.sum(F.col(value_col).cast("decimal(28,6)")).over(w).cast("double"), 6
    )
    n = F.count(F.lit(1)).over(w)
    return df.withColumn(out_col, s).withColumn(f"{out_col}_n", n)


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.25,
    span_rows: int = 20,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially-weighted moving average over the trailing
    ``span_rows`` observations → every input row + ``out_col`` — the
    smoothing baseline for drift/anomaly monitors (pandas ``ewm(alpha,
    adjust=True)`` semantics, truncated to a bounded frame so state never
    grows with series length):

        y_i = Σ_k (1-α)^k · x_{i-k}  /  Σ_k (1-α)^k,   k < span_rows

    Engine-exactness: both numerator and denominator evaluate as a HORNER
    FOLD over the frame's ordered value list (acc·(1-α) + x, oldest →
    newest) — pure IEEE multiply-add in a fixed order, bit-identical in
    any engine, with no pow() call whose libm rounding could differ in
    the last ulp (DuckDB oracle: windowed list + list_reduce — same fold,
    same order). Ordering ties on (ts, value): rows with equal timestamps
    AND equal values permute without changing the fold, so the result is
    total-order-independent where the sort is.

    Scale shape: ONE key-partition shuffle; the frame is a ROWS window
    over each key's sorted run — no self-join, per-row state is the
    ``span_rows``-element list (bounded). The reference has no smoothing
    surface; M5 temporal-family extension.
    """
    c = F.lit(1.0 - alpha)
    w = (
        W.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")), F.col(value_col))
        .rowsBetween(-(span_rows - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    num = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc * c + x)
    den = F.aggregate(
        F.transform(arr, lambda _: F.lit(1.0)),
        F.lit(0.0),
        lambda acc, x: acc * c + x,
    )
    return df.withColumn(out_col, F.round(num / den, 6))


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    direction: str = "backward",
    tolerance_sec: float | None = None,
    suffix: str = "",
) -> DataFrame:
    """As-of join with a DIRECTION — backward (greatest right_ts ≤
    left_ts; delegates to :func:`asof_join`), forward (smallest
    right_ts ≥ left_ts), or nearest (closer of the two, ties backward):
    pandas ``merge_asof(direction=...)`` parity, the missing two thirds
    of the as-of family (sensor alignment joins forward; gap-tolerant
    enrichment joins nearest).

    Forward is the backward algorithm on NEGATED microsecond timestamps
    (one key-partition shuffle, carry-forward window — same linear
    shape); nearest runs both passes and picks per row (two shuffles,
    still never a range-explosion or per-row subquery).
    """
    if direction == "backward":
        return asof_join(
            left, right, key_cols, left_ts, right_ts, right_value_cols,
            tolerance_sec=tolerance_sec, suffix=suffix,
        )

    def _forward(l_df: DataFrame, sfx: str) -> DataFrame:
        # negate time: backward-on-(-t) == forward-on-t (inclusive both)
        l_neg = l_df.withColumn("__negts", -F.unix_micros(F.col(left_ts).cast("timestamp")))
        r_neg = right.withColumn("__negts", -F.unix_micros(F.col(right_ts).cast("timestamp")))
        out = asof_join(
            l_neg,
            r_neg.withColumn("__orig_rts", F.col(right_ts)),
            key_cols,
            "__negts",
            "__negts",
            ["__orig_rts", *right_value_cols],
            suffix=sfx,
        )
        matched = f"__orig_rts{sfx}"
        out = out.drop("__negts", f"__negts{sfx}_matched").withColumnRenamed(
            matched, f"{right_ts}{sfx}_matched"
        )
        if tolerance_sec is not None:
            in_tol = (
                F.col(f"{right_ts}{sfx}_matched").cast("double")
                - F.col(left_ts).cast("double")
            ) <= F.lit(float(tolerance_sec))
            for c in [f"{right_ts}{sfx}_matched", *[f"{v}{sfx}" for v in right_value_cols]]:
                out = out.withColumn(c, F.when(in_tol, F.col(c)))
        return out

    if direction == "forward":
        return _forward(left, suffix)
    if direction != "nearest":
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")

    back = asof_join(
        left, right, key_cols, left_ts, right_ts, right_value_cols,
        tolerance_sec=tolerance_sec, suffix="__b",
    )
    both = _forward(back, "__f")
    lt = F.unix_micros(F.col(left_ts).cast("timestamp"))
    bt = F.unix_micros(F.col(f"{right_ts}__b_matched").cast("timestamp"))
    ft = F.unix_micros(F.col(f"{right_ts}__f_matched").cast("timestamp"))
    use_back = F.when(
        bt.isNotNull() & (ft.isNull() | ((lt - bt) <= (ft - lt))), F.lit(True)
    ).otherwise(F.lit(False))
    out = both.withColumn("__use_back", use_back)
    sel = [F.col(c) for c in left.columns]
    sel.append(
        F.when(F.col("__use_back"), F.col(f"{right_ts}__b_matched"))
        .otherwise(F.col(f"{right_ts}__f_matched"))
        .alias(f"{right_ts}{suffix}_matched")
    )
    for v in right_value_cols:
        sel.append(
            F.when(F.col("__use_back"), F.col(f"{v}__b"))
            .otherwise(F.col(f"{v}__f"))
            .alias(f"{v}{suffix}")
        )
    return out.select(*sel)

def seasonal_decompose_additive(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: int,
    key_cols: list[str] | None = None,
    quant_dp: int = 9,
) -> DataFrame:
    """Classical ADDITIVE seasonal decomposition (the moving-average
    method behind statsmodels' seasonal_decompose — public knowledge) →
    (key..., ts, value, trend, seasonal, resid):

    * trend     — centered moving average of width ``period`` (even
      periods use the standard 2×MA half-weight endpoints); NULL where
      the window is incomplete (the first/last period/2 points).
    * seasonal  — mean detrended value per position-in-period,
      re-centered so one period sums to ~0.
    * resid     — value − trend − seasonal (NULL where trend is NULL).

    The time-series read a monitoring/forecasting stack needs before
    alerting on a metric with daily/weekly shape — detrended anomalies
    (resid) don't false-positive on the seasonal swing the way raw
    zscore_anomalies does.

    Cross-engine determinism (the pagerank floor-quantization
    discipline): the windowed trend sums run on the value column's
    ORIGINAL type (pass integer counts for exact window sums — sliding
    double sums are accumulation-order-dependent); every aggregated mean
    goes through q(x) = floor(x·10^dp) — an exact small integer in a
    double — summed as BIGINT and divided back out, so the seasonal
    means are bit-identical in any engine and the whole decomposition is
    oracle-checkable value-for-value, not just to a tolerance.

    Scale shape: series are keyed by ``key_cols`` (one shuffle); the
    moving average is a bounded ROWS window per key; the seasonal means
    are ONE (key, pos) aggregate joined back — state is period-sized per
    key, never series-sized. Position-in-period comes from a row_number
    per key (ties on ts break by value); irregular sampling is the
    caller's responsibility (resample_ffill regularizes first)."""
    keys = list(key_cols or [])
    kpart = [F.col(k) for k in keys]
    order = W.partitionBy(*kpart).orderBy("ts", "__vraw")
    scale = float(10 ** quant_dp)

    def q_scaled(col):  # exact integer floor(x·10^dp), carried as long
        return F.floor(col * F.lit(scale)).cast("long")

    half = period // 2
    wspec = order.rowsBetween(-half, half)
    cnt = F.count("__vraw").over(wspec)
    ssum = F.sum("__vraw").over(wspec)
    if period % 2 == 0:
        # standard 2xMA: half weight on both window endpoints
        first_v = F.first("__vraw").over(wspec)
        last_v = F.last("__vraw").over(wspec)
        trend = F.when(
            cnt == period + 1,
            (
                ssum.cast("double")
                - (first_v + last_v).cast("double") / F.lit(2.0)
            )
            / F.lit(float(period)),
        )
    else:
        trend = F.when(
            cnt == period, ssum.cast("double") / F.lit(float(period))
        )
    base = df.select(
        *keys,
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("__vraw"),
    ).select(
        "*",
        ((F.row_number().over(order) - 1) % period).alias("__pos"),
        trend.alias("trend"),
    )
    detr = base.withColumn(
        "__dq", q_scaled(F.col("__vraw").cast("double") - F.col("trend"))
    )
    smeans = detr.groupBy(*keys, "__pos").agg(
        F.sum("__dq").alias("__dsum"), F.count("__dq").alias("__dcnt")
    )
    smean = F.col("__dsum").cast("double") / (
        F.col("__dcnt").cast("double") * F.lit(scale)
    )
    quant = smeans.select(*keys, "__pos", q_scaled(smean).alias("__sq"))
    centered = quant.withColumn(
        "__soff",
        (
            F.col("__sq").cast("double")
            - F.avg(F.col("__sq").cast("double")).over(W.partitionBy(*kpart))
        )
        / F.lit(scale),
    )
    out = base.join(centered.select(*keys, "__pos", "__soff"), keys + ["__pos"])
    qout = lambda c: F.floor(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return out.select(
        *keys,
        "ts",
        F.col("__vraw").cast("double").alias("value"),
        qout(F.col("trend")).alias("trend"),
        qout(F.col("__soff")).alias("seasonal"),
        qout(F.col("__vraw").cast("double") - F.col("trend") - F.col("__soff")).alias("resid"),
    )


def holt_linear_forecast(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
    key_cols: list[str] | None = None,
    quant_dp: int = 9,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing + h-step forecast
    (Holt 1957, the classical double-smoothing method — public
    knowledge) → one row per key per step: (key..., h, level, trend,
    forecast):

        l_t = q(α·x_t + (1−α)·(l_{t−1} + b_{t−1}))
        b_t = q(β·(l_t − l_{t−1}) + (1−β)·b_{t−1})
        forecast(h) = q(l_n + h·b_n)

    initialized l_0 = x_0, b_0 = 0 (the zero-trend convention — it only
    matters for very short series, and both engines replay it
    identically). The one-line capacity/volume forecast a monitoring
    stack runs after :func:`seasonal_decompose_additive` has taken the
    seasonal shape out.

    Engine-exactness: the recurrence is inherently sequential, so it
    evaluates as ONE fold over each key's ordered value list (the ewma
    posture) with every state update floor-quantized at ``quant_dp``
    (q(y) = floor(y·10^dp)/10^dp — bit-identical IEEE in any engine; the
    pagerank discipline). The DuckDB oracle runs the same fold via
    list_reduce over a struct-transformed list, same order, same
    quantization — value-for-value hash-matched, not tolerance-checked.

    Scale shape: ONE key-partition shuffle; each key's series collects
    into a single ordered array (state bounded by series length per key
    — regularize/bucket first if a key's series exceeds executor memory,
    e.g. via time_bucket_rollup), then the fold is row-local and the
    horizon explode emits h rows per key."""
    keys = list(key_cols or [])
    scale = float(10 ** quant_dp)

    def q(col):
        return F.floor(col * F.lit(scale)) / F.lit(scale)

    a, b_ = float(alpha), float(beta)
    ordered = (
        df.groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("ts"),
                        F.col(value_col).cast("double").alias("v"),
                    )
                )
            ).alias("__series")
        )
        .withColumn("__vals", F.transform("__series", lambda s: s["v"]))
    )
    init = F.struct(
        F.element_at("__vals", 1).alias("l"), F.lit(0.0).alias("b")
    )
    rest = F.slice(F.col("__vals"), 2, F.greatest(F.size("__vals") - 1, F.lit(0)))

    def step(acc, x):
        new_l = q(F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"]))
        new_b = q(
            F.lit(b_) * (new_l - acc["l"]) + F.lit(1.0 - b_) * acc["b"]
        )
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    fitted = ordered.where(F.size("__vals") > 0).select(
        *keys, F.aggregate(rest, init, step).alias("__st")
    )
    return fitted.select(
        *keys,
        F.col("__st.l").alias("level"),
        F.col("__st.b").alias("trend"),
        F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h"),
    ).select(
        *keys,
        F.col("h").cast("long").alias("h"),
        # floor-quantized output surface (seasonal_decompose posture):
        # round() on 1e-9-quantized doubles can tie-flip between engines
        (F.floor(F.col("level") * F.lit(1e6)) / F.lit(1e6)).alias("level"),
        (F.floor(F.col("trend") * F.lit(1e6)) / F.lit(1e6)).alias("trend"),
        (
            F.floor(
                q(F.col("level") + F.col("h") * F.col("trend")) * F.lit(1e6)
            )
            / F.lit(1e6)
        ).alias("forecast"),
    )


def cusum_path(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    k_slack: float = 0.5,
    h_threshold: float = 4.0,
    quant_dp: int = 9,
) -> DataFrame:
    """Two-sided CUSUM change-point statistic per observation (Page 1954,
    the classical sequential drift detector — public knowledge) → one row
    per (key..., ts): (value, z, s_pos, s_neg, alarm). A z-score monitor
    flags single spikes; CUSUM accumulates SUSTAINED small shifts — the
    "source quietly degraded 0.3σ three weeks ago" signal a corpus/
    telemetry pipeline wants:

        s⁺_t = max(0, s⁺_{t−1} + z_t − k)      (upward shift)
        s⁻_t = max(0, s⁻_{t−1} − z_t − k)      (downward shift)
        alarm iff s⁺_t > h or s⁻_t > h

    with z standardized per key and k the slack (shifts below k·σ are
    ignored), h the decision threshold.

    THE SCALE TRICK — no sequential fold: the max(0, ·) recurrence has
    the classical reflection closed form s⁺_t = cs_t − min(0, min_{j≤t}
    cs_j) with cs the prefix sum of (z − k), so the whole path computes
    as ONE key exchange + running-sum and running-min windows — no
    per-key collect_list, no O(series) driver state, no list fold (the
    Holt recurrence has no such closed form; this one does, so use it).
    Engine-exactness: z floor-quantizes at ``quant_dp`` and accumulates
    as DECIMAL(28,9) (exact prefix sums — window sums of doubles drift
    across engines), statistics surface floor-quantized at 6 dp."""
    keys = list(key_cols or [])
    scale = float(10 ** quant_dp)

    def q(col):
        return F.floor(col * F.lit(scale)) / F.lit(scale)

    stats = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("__sx"),
        F.sum(
            (F.col(value_col).cast("double") * F.col(value_col).cast("double"))
            .cast("decimal(38,6)")
        ).alias("__sxx"),
    )
    # plain multiply, not pow(x, 2): libm pow differs from x*x in the last
    # ulp across engines (the ks_two_sample lesson) — under a 1e9 floor
    # quantizer one ulp flips the bucket
    mean_raw = F.col("__sx").cast("double") / F.col("__n")
    stats = stats.select(
        *keys,
        q(mean_raw).alias("__mean"),
        q(
            F.sqrt(
                F.greatest(
                    F.col("__sxx").cast("double") / F.col("__n")
                    - mean_raw * mean_raw,
                    F.lit(0.0),
                )
            )
        ).alias("__std"),
    )
    j = df.join(stats, keys) if keys else df.crossJoin(F.broadcast(stats))
    z = q(
        (F.col(value_col).cast("double") - F.col("__mean"))
        / F.when(F.col("__std") > 0, F.col("__std")).otherwise(F.lit(1.0))
    )
    base = j.select(
        *keys,
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        z.cast("decimal(28,9)").alias("__z"),
    )
    # no-keys fallback = ONE series by definition (unpartitioned window
    # over a single bounded series, by design)
    w = W.partitionBy(*keys).orderBy("ts") if keys else W.orderBy("ts")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    k = F.lit(float(k_slack)).cast("decimal(28,9)")
    # prefix sums downcast to decimal(20,9) IMMEDIATELY: Spark's window
    # sum widens decimals to precision 38, and the reflection subtraction
    # below would then need 39 — which trips allowPrecisionLoss and
    # silently ROUNDS the result to scale 6 (this surfaced as a 1e-6
    # oracle flip at exactly a 6-dp boundary). z-scaled prefix sums are
    # bounded by ~series_len·(|z|+k), far inside decimal(20,9).
    with_cs = base.select(
        *keys,
        "ts",
        "value",
        "__z",
        F.sum(F.col("__z") - k).over(run).cast("decimal(20,9)").alias("__csp"),
        F.sum(-F.col("__z") - k).over(run).cast("decimal(20,9)").alias("__csn"),
    )
    zero = F.lit(0).cast("decimal(20,9)")
    with_min = with_cs.select(
        *keys,
        "ts",
        "value",
        "__z",
        (
            F.col("__csp") - F.least(zero, F.min("__csp").over(run))
        ).alias("__sp"),
        (
            F.col("__csn") - F.least(zero, F.min("__csn").over(run))
        ).alias("__sn"),
    )

    # DECIMAL-space 6-dp floor: ×10⁶ (exact), floor (exact), integer/1e6
    # (one IEEE division of an exact integer — identical everywhere). A
    # double-space floor here is boundary-hostile: the exact statistic
    # often IS a representable 6-dp value, and the two engines' decimal→
    # double casts differ below the ulp, flipping floor(x·10⁶) by one.
    # The ×10⁶ product must STAY inside precision 38: at decimal(38,9)
    # Spark's multiply overflows and silently ROUNDS the result scale
    # (allowPrecisionLoss), which is how 1345934.998 became 1345935
    # before the floor — downcast to decimal(20,9) first (CUSUM paths
    # are z-scaled: magnitudes are tiny) so p = 20+7+1 = 28 stays exact.
    def out6(dec):
        return (
            F.floor(dec.cast("decimal(20,9)") * F.lit(1_000_000)).cast("long")
            / F.lit(1e6)
        )

    h = F.lit(float(h_threshold)).cast("decimal(28,9)")
    return with_min.select(
        *keys,
        "ts",
        "value",
        out6(F.col("__z")).alias("z"),
        out6(F.col("__sp")).alias("s_pos"),
        out6(F.col("__sn")).alias("s_neg"),
        # decimal comparison: exact on both engines
        ((F.col("__sp") > h) | (F.col("__sn") > h)).alias("alarm"),
    )


def theil_sen_trend(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    quant_dp: int = 9,
) -> DataFrame:
    """Robust trend per key — Theil–Sen slope + the Mann–Kendall test
    statistic → one row per key: (key..., n_points, s_kendall, tau,
    slope). The OLS slope (zipf_fit's machinery) is one outlier away
    from nonsense; Theil–Sen (median of all pairwise slopes) tolerates
    ~29% corruption, and Mann–Kendall's S = Σ_{i<j} sign(v_j − v_i)
    gives the distribution-free monotone-trend verdict (τ = S / C(n,2))
    — the standard pair for "is this source's quality actually
    drifting, robustly?" (Theil 1950 / Sen 1968 / Mann 1945 — public
    knowledge).

    Scale shape: ONE key exchange; the pair frame is a per-key
    self-join on ordinal index i<j — O(per-key series length²), which
    is the operator's honest cost and fine for the MONITORING series it
    exists for (daily/hourly rollups: 365 points = 66k pairs per key;
    pre-bucket with time_bucket_rollup first, exactly like the Holt and
    CUSUM families). Slopes floor-quantize at ``quant_dp`` into
    decimal(20,9); the median is PERCENTILE-DISC LOWER (the value at
    rank ceil(m/2) of the ascending slope sort — deterministic and
    engine-portable, no midpoint interpolation to diverge); S and τ are
    integer/ratio arithmetic — everything hash-matchable."""
    keys = list(key_cols or [])
    scale = float(10 ** quant_dp)
    w = W.partitionBy(*keys).orderBy("ts") if keys else W.orderBy("ts")
    idx = df.select(
        *keys,
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("v"),
    ).withColumn("__i", F.row_number().over(w))
    a, b = idx.alias("a"), idx.alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys] + [
        F.col("a.__i") < F.col("b.__i")
    ]
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{k}").alias(k) for k in keys],
        F.signum(F.col("b.v") - F.col("a.v")).cast("long").alias("__sgn"),
        (
            F.floor(
                (F.col("b.v") - F.col("a.v"))
                / (F.col("b.__i") - F.col("a.__i")).cast("double")
                * F.lit(scale)
            )
            / F.lit(scale)
        ).cast("decimal(20,9)").alias("__slope"),
    )
    # no-keys fallback = ONE series' pair slopes (series-length-bounded
    # by the resample grid, by design)
    pw = (
        W.partitionBy(*keys).orderBy(F.col("__slope").asc())
        if keys
        else W.orderBy(F.col("__slope").asc())
    )
    ranked = pairs.select(
        *keys,
        "__sgn",
        "__slope",
        F.row_number().over(pw).alias("__rk"),
        F.count(F.lit(1)).over(W.partitionBy(*keys)).alias("__m"),
    )
    med_rank = F.ceil(F.col("__m").cast("double") / 2)
    return ranked.groupBy(*keys).agg(
        F.max(F.when(F.col("__rk") == med_rank, F.col("__slope"))).cast(
            "double"
        ).alias("__med"),
        F.sum("__sgn").alias("s_kendall"),
        F.count(F.lit(1)).alias("__npairs"),
    ).select(
        *keys,
        # n from C(n,2) = m: n = (1 + sqrt(1+8m)) / 2 — exact for any
        # true pair frame, avoids a second scan of the base
        F.round((1 + F.sqrt(1 + 8 * F.col("__npairs").cast("double"))) / 2, 0)
        .cast("long")
        .alias("n_points"),
        F.col("s_kendall").cast("long").alias("s_kendall"),
        F.round(
            F.col("s_kendall").cast("double") / F.col("__npairs"), 6
        ).alias("tau"),
        F.round(F.col("__med"), 6).alias("slope"),
    )


def acf(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    max_lag: int = 7,
    quant_dp: int = 9,
) -> DataFrame:
    """Sample autocorrelation function per key → one row per (key, lag)
    for lag = 1..``max_lag``: (key..., lag, n, acf). The seasonality
    DETECTOR in front of seasonal_decompose_additive (which requires the
    period as an input): a weekly cycle shows up as an acf spike at
    lag 7 before anyone tells the pipeline "period=7", and a slowly
    decaying acf is the drift signature CUSUM then localizes.

    Semantics: the standard biased estimator r_k = Σ_{i}(x_i − x̄)
    (x_{i+k} − x̄) / Σ_i(x_i − x̄)² over the ts-ordered series (same
    denominator for every lag — guarantees |r_k| ≤ 1 and a positive
    semidefinite sequence, the textbook choice). Lags longer than a
    key's series simply emit no row.

    Engine-exactness: x̄ is ONE IEEE division of an exact decimal sum by
    the exact count; every cross-product floor-quantizes to 10^-dp
    integer units and sums as exact decimals (the pagerank discipline),
    so r_k hash-matches. Scale shape: ONE key exchange for the per-key
    row_number (monitoring series — pre-bucket first, like the
    Holt/CUSUM/Theil-Sen family), then one equi-join of the
    lag-exploded deviations frame (n·max_lag rows, linear) back onto
    itself on (key, i+k) — no per-key fold, no window wider than the
    series. Ties on ``ts`` break by value, so a non-unique grid still
    indexes deterministically (pre-bucketed rollups are unique)."""
    keys = list(key_cols or [])
    scale = float(10 ** quant_dp)
    order = [F.col("ts"), F.col("v")]
    w = W.partitionBy(*keys).orderBy(*order) if keys else W.orderBy(*order)
    idx = (
        df.select(
            *keys,
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .withColumn("__i", F.row_number().over(w))
    )
    st = idx.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        (
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__m"),
    )
    dev = (
        idx.join(st, keys) if keys else idx.crossJoin(F.broadcast(st))
    ).select(
        *keys, "__i", "__n", (F.col("v") - F.col("__m")).alias("__dv")
    )
    # bounded cache generation (ADVICE r9): released on the next call
    (dev,) = persist_generation("temporal.acf", dev)
    den = dev.groupBy(*keys).agg(
        (
            F.sum(
                F.floor(F.col("__dv") * F.col("__dv") * F.lit(scale)).cast(
                    "decimal(28,0)"
                )
            ).cast("double")
            / F.lit(scale)
        ).alias("__den")
    )
    a = dev.withColumn(
        "lag", F.explode(F.sequence(F.lit(1), F.lit(int(max_lag))))
    ).alias("a")
    b = dev.select(
        *keys, F.col("__i").alias("__j"), F.col("__dv").alias("__db")
    ).alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys] + [
        F.col("a.__i") + F.col("a.lag") == F.col("b.__j")
    ]
    num = (
        a.join(b, cond)
        .groupBy(*[F.col(f"a.{k}").alias(k) for k in keys], F.col("a.lag"))
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("a.__dv") * F.col("b.__db") * F.lit(scale)
                    ).cast("decimal(28,0)")
                ).cast("double")
                / F.lit(scale)
            ).alias("__num"),
            F.max(F.col("a.__n")).alias("__n"),
        )
    )
    out = (num.join(den, keys) if keys else num.crossJoin(F.broadcast(den))).select(
        *keys,
        F.col("lag").cast("bigint").alias("lag"),
        F.col("__n").cast("bigint").alias("n"),
        F.when(
            F.col("__den") > 0, F.round(F.col("__num") / F.col("__den"), 6)
        ).alias("acf"),
    )
    return out


def ccf(
    df: DataFrame,
    ts_col: str,
    x_col: str,
    y_col: str,
    key_cols: list[str] | None = None,
    max_lag: int = 7,
    quant_dp: int = 9,
) -> DataFrame:
    """Sample cross-correlation between two aligned series per key → one
    row per (key, lag) for lag = −``max_lag``..``max_lag``: (key...,
    lag, n, ccf). r_k correlates x_t with y_{t+k}, so a PEAK at a
    positive lag means x LEADS y by k steps — the causality-direction
    probe :func:`acf` can't make (does click volume lead purchase
    volume? does a quality dip lead a dedup-rate spike?). lag 0 is the
    plain correlation of the two series.

    Semantics: r_k = Σ_t (x_t − x̄)(y_{t+k} − ȳ) / √(Σ(x−x̄)²·Σ(y−ȳ)²)
    — the standard biased estimator (shared normalizer across lags,
    |r_k| ≤ 1). Input rows carry BOTH series on one timestamp grid
    (pivot first); NULL in either column drops the row. Lags longer
    than the series emit no row.

    Engine-exactness and scale shape are :func:`acf`'s: means are one
    IEEE division of exact decimal sums, cross-products floor-quantize
    to 10^-dp units and sum as exact decimals, ONE key exchange + one
    lag-exploded equi-join (n·(2·max_lag+1) rows, linear), no fold.
    Ties on ``ts`` break by (x, y) so a non-unique grid still indexes
    deterministically (pivoted rollups are unique)."""
    keys = list(key_cols or [])
    scale = float(10 ** quant_dp)
    order = [F.col("ts"), F.col("x"), F.col("y")]
    w = W.partitionBy(*keys).orderBy(*order) if keys else W.orderBy(*order)
    idx = (
        df.select(
            *keys,
            F.col(ts_col).alias("ts"),
            F.col(x_col).cast("double").alias("x"),
            F.col(y_col).cast("double").alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .withColumn("__i", F.row_number().over(w))
    )
    st = idx.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        (
            F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__mx"),
        (
            F.sum(F.col("y").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__my"),
    )
    dev = (
        idx.join(st, keys) if keys else idx.crossJoin(F.broadcast(st))
    ).select(
        *keys,
        "__i",
        "__n",
        (F.col("x") - F.col("__mx")).alias("__dx"),
        (F.col("y") - F.col("__my")).alias("__dy"),
    )
    # bounded cache generation (ADVICE r9): released on the next call
    (dev,) = persist_generation("temporal.ccf", dev)
    den = dev.groupBy(*keys).agg(
        (
            F.sum(
                F.floor(F.col("__dx") * F.col("__dx") * F.lit(scale)).cast(
                    "decimal(28,0)"
                )
            ).cast("double")
            / F.lit(scale)
        ).alias("__denx"),
        (
            F.sum(
                F.floor(F.col("__dy") * F.col("__dy") * F.lit(scale)).cast(
                    "decimal(28,0)"
                )
            ).cast("double")
            / F.lit(scale)
        ).alias("__deny"),
    )
    a = dev.withColumn(
        "lag",
        F.explode(F.sequence(F.lit(-int(max_lag)), F.lit(int(max_lag)))),
    ).alias("a")
    b = dev.select(
        *keys, F.col("__i").alias("__j"), F.col("__dy").alias("__db")
    ).alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys] + [
        F.col("a.__i") + F.col("a.lag") == F.col("b.__j")
    ]
    num = (
        a.join(b, cond)
        .groupBy(*[F.col(f"a.{k}").alias(k) for k in keys], F.col("a.lag"))
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("a.__dx") * F.col("b.__db") * F.lit(scale)
                    ).cast("decimal(28,0)")
                ).cast("double")
                / F.lit(scale)
            ).alias("__num"),
            F.max(F.col("a.__n")).alias("__n"),
        )
    )
    return (num.join(den, keys) if keys else num.crossJoin(F.broadcast(den))).select(
        *keys,
        F.col("lag").cast("bigint").alias("lag"),
        F.col("__n").cast("bigint").alias("n"),
        F.when(
            F.col("__denx") * F.col("__deny") > 0,
            F.round(
                F.col("__num") / F.sqrt(F.col("__denx") * F.col("__deny")), 6
            ),
        ).alias("ccf"),
    )
