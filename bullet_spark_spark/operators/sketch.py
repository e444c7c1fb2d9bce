"""Mergeable sketch operators (DataSketches HLL via Spark builtins).

bullet-core's approximate operators are Apache DataSketches sketches
serialized as opaque byte blobs and merged across stages
(FilterStreaming.scala:124 ``querier.getData`` partials,
JoinStreaming.scala:126 ``querier.combine(bytes)``) [D]. Spark ships the
same DataSketches HLL family as native aggregates —
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` — so the
engine exposes the blob-merge capability first-class:

- sketches are COLUMNS (binary), computed in one scan with map-side
  partial merge inside Tungsten;
- a persisted sketch table is a re-usable pre-aggregate: any coarser
  grouping is answered by unioning sketches — never by rescanning the
  base table. That is the property that matters at 100 TB: build per
  (day, country, source) once, answer distinct-users for ANY slice of
  those dimensions from kilobytes of state.

Exact counterparts: operators/temporal.distinct_rollup (exact,
pair-dedup reuse) and CountDistinctAgg(approx=False). The HLL relative
error is ~1.04/sqrt(2^lgk) (~1.6% at the default lgk=12).

The QUANTILE counterpart (bullet-core's Distribution operators are
DataSketches quantile sketches merged the same way) is the
``hist_group_sketches`` / ``hist_merge_quantiles`` pair below: mergeable
per-group bucket-count histograms (map columns, sum-mergeable) with
engine-portable linear bucketing, every estimate within one bucket width
of exact.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_DEFAULT_LGK = 12

# Broadcast regime ceiling for the probe-side joins (bloom_probe /
# cms_lookup): the words/counters frame is broadcast-hinted only while its
# row bound (m_bits/64 resp. w) stays under this, else the hint is omitted
# and AQE picks the strategy (shuffled hash / sort-merge). 4 Mi rows of
# (int, long) ≈ 48 MiB of payload — comfortably broadcastable; beyond it a
# forced broadcast of a frame auto-sized to the KEY COUNT (bloom_size ≈
# 9.6 bits/key → ~19 M words per billion keys) is exactly the
# driver/executor OOM class the gate exists to prevent.
SKETCH_BROADCAST_MAX_ROWS = 4 << 20


def _fresh_prefix(df: DataFrame, base: str) -> str:
    """A temp-column prefix guaranteed absent from ``df.columns`` — keeps
    bloom_probe/cms_lookup from silently clobbering caller columns that
    happen to be named like the internals (``__bw0`` …)."""
    cols = set(df.columns)
    prefix = base
    while any(c.startswith(prefix) for c in cols):
        prefix = "_" + prefix
    return prefix


def hll_result_meta(estimate: float, lgk: int = HLL_DEFAULT_LGK) -> dict:
    """bullet-style sketch metadata for an HLL-estimated COUNT DISTINCT.

    bullet attaches a meta section to every sketch-estimated result —
    whether the value was estimated, the sketch family, and the standard-
    deviation error bounds around the estimate [D] (the reference's theta-
    sketch metadata; its Spark harness forwards it untouched). The Spark
    builtins expose only the point estimate, so the envelope is computed
    from the HLL family's asymptotic relative standard error
    rse = 1.04 / sqrt(2^lgk) (~1.625% at the default lgk=12): the
    z-sigma bounds are estimate / (1 ± z·rse) — the same first-order
    interval DataSketches' getLowerBound/getUpperBound linearize to.

    Keys mirror bullet's result meta: ``was_estimated``, ``family``,
    ``lg_k``, ``estimate``, ``relative_std_error`` and per-sigma
    ``bounds`` {"1": {lower, upper}, "2": ..., "3": ...}."""
    rse = 1.04 / math.sqrt(2.0 ** lgk)
    est = float(estimate)
    return {
        "was_estimated": True,
        "family": "HLL",
        "lg_k": lgk,
        "estimate": est,
        "relative_std_error": rse,
        "bounds": {
            str(z): {"lower": est / (1.0 + z * rse), "upper": est / (1.0 - z * rse)}
            for z in (1, 2, 3)
        },
    }


def hll_group_sketches(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lgk: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """One scan → per-group HLL sketch of ``key_col`` (binary column).
    Persist/write this frame as the pre-aggregate; every coarser slice is
    then a cheap ``hll_merge_slices`` over it."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias(sketch_col)
    )


def hll_merge_slices(
    sketches: DataFrame,
    slice_cols: list[str],
    sketch_col: str = "hll",
    out_name: str = "n_distinct_est",
) -> DataFrame:
    """Re-aggregate a sketch table to any subset of its grouping columns:
    union the sketches per slice and estimate. State per group is one
    ~2^lgk-byte blob regardless of cardinality."""
    grouped = (
        sketches.groupBy(*slice_cols)
        if slice_cols
        else sketches.groupBy(F.lit(1).alias("__all"))
    )
    out = grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(out_name)
    )
    return out.drop("__all") if not slice_cols else out


def hll_overlap_matrix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    lgk: int = HLL_DEFAULT_LGK,
) -> DataFrame:
    """Approximate pairwise key-overlap between groups →
    (group_a, group_b, n_a_est, n_b_est, n_union_est, n_overlap_est,
    jaccard_est) for every unordered group pair — the sketch-sized
    stand-in for ``dedup.source_overlap_matrix`` when the exact
    (source, shingle) pair join is too expensive: ONE scan builds a
    per-group HLL of ``key_col``, then every pair is inclusion-exclusion
    over sketches (|A∩B| ≈ |A|+|B|−|A∪B| via the scalar ``hll_union``),
    entirely over a #groups-sized frame. At 100 TB the exact matrix
    shuffles all distinct (group, key) rows; this shuffles one 2^lgk-byte
    blob per group.

    Error: each estimate carries the HLL rse (1.04/√2^lgk, ~1.6% at the
    default), and inclusion-exclusion DIFFERENCES the estimates, so the
    overlap error is relative to the UNION size, not the overlap — small
    overlaps between large sets drown in sketch noise (documented HLL
    limitation; use the exact matrix when overlap ≪ union matters).
    Estimates are clamped at 0 and rounded to 2 dp."""
    sks = df.filter(F.col(key_col).isNotNull()).groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("__sk")
    )
    a = sks.select(
        F.col(group_col).alias("group_a"), F.col("__sk").alias("__ska")
    )
    b = sks.select(
        F.col(group_col).alias("group_b"), F.col("__sk").alias("__skb")
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    n_a = F.hll_sketch_estimate("__ska")
    n_b = F.hll_sketch_estimate("__skb")
    n_u = F.hll_sketch_estimate(F.hll_union(F.col("__ska"), F.col("__skb")))
    n_o = F.greatest(F.lit(0.0), n_a + n_b - n_u)
    return pairs.select(
        "group_a",
        "group_b",
        F.round(n_a, 2).alias("n_a_est"),
        F.round(n_b, 2).alias("n_b_est"),
        F.round(n_u, 2).alias("n_union_est"),
        F.round(n_o, 2).alias("n_overlap_est"),
        F.round(
            F.when(n_u > 0, n_o / n_u).otherwise(F.lit(0.0)), 6
        ).alias("jaccard_est"),
    )


def overlap_matrix_exact(
    df: DataFrame,
    group_col: str,
    key_col: str,
) -> DataFrame:
    """EXACT pairwise key-overlap between groups — the oracle-checkable
    counterpart of ``hll_overlap_matrix`` with the IDENTICAL output
    surface (group_a, group_b, n_a, n_b, n_union, n_overlap, jaccard),
    so estimate-vs-exact is a straight per-pair diff: run both over the
    same (group, key) input and every sketch estimate lands next to its
    truth. Types mirror the HLL row exactly (bigint counts — Spark's
    hll_sketch_estimate returns longs — double overlap/jaccard), so the
    two panels union schema-identically.

    Shape at 100 TB (same discipline as dedup.source_overlap_matrix): one
    distinct over (group, key) is the only corpus-sized shuffle; the pair
    join is keyed by KEY (each join group bounded by #groups, never
    all-pairs over rows); the #groups-sized size table broadcasts back
    twice, and the #groups² pair spine comes from a self-join of that
    bounded table so ZERO-overlap pairs surface too (the HLL matrix emits
    every pair — the exact panel must as well)."""
    gk = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(group_col).alias("g"), F.col(key_col).alias("k"))
        .distinct()
    )
    sizes = gk.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    shared = (
        gk.alias("a")
        .join(
            gk.alias("b"),
            (F.col("a.k") == F.col("b.k")) & (F.col("a.g") < F.col("b.g")),
        )
        .groupBy(F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"))
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    spine = (
        sizes.select(F.col("g").alias("group_a"), F.col("n").alias("n_a"))
        .join(  # bounded: #groups² pair spine of the #groups-row size table
            sizes.select(F.col("g").alias("group_b"), F.col("n").alias("n_b")),
            F.col("group_a") < F.col("group_b"),
        )
    )
    n_o = F.coalesce(F.col("__shared"), F.lit(0))
    n_u = F.col("n_a") + F.col("n_b") - n_o
    return spine.join(shared, ["group_a", "group_b"], "left").select(
        "group_a",
        "group_b",
        F.col("n_a").alias("n_a_est"),
        F.col("n_b").alias("n_b_est"),
        n_u.alias("n_union_est"),
        F.round(n_o.cast("double"), 2).alias("n_overlap_est"),
        F.round(
            F.when(n_u > 0, n_o.cast("double") / n_u).otherwise(F.lit(0.0)), 6
        ).alias("jaccard_est"),
    )


def hist_group_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    width: float,
    sketch_col: str = "hist",
) -> DataFrame:
    """One scan → per-group bucket-count histogram of ``value_col`` as a
    ``map<bigint,bigint>`` column — the QUANTILE counterpart of
    :func:`hll_group_sketches` (bullet-core's Distribution operators are
    DataSketches quantile sketches merged as blobs,
    FilterStreaming.scala:124 / JoinStreaming.scala:126 [D]; our mergeable
    state is bucket counts instead of an opaque blob).

    Bucketing is LINEAR: ``floor(value / width)``. Division and floor are
    exact IEEE-754 operations, so any engine assigns every value to the
    same bucket bit-for-bit — which is what lets an external SQL oracle
    hash-match quantile estimates derived from this sketch (a log/asinh
    bucketing would hit libm differences at bucket edges). Accuracy:
    every estimate is within ``width`` of an exact quantile. NULLs are
    excluded, matching SQL aggregate convention.

    Merge = per-bucket count sum (associative + commutative): any coarser
    slice is answered from the sketch table without rescanning the base —
    kilobytes of state per group at 100 TB."""
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            *group_cols,
            F.floor(F.col(value_col) / F.lit(width)).cast("long").alias("__bk"),
        )
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return counts.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("__bk", "__cnt")))
        ).alias(sketch_col)
    )


def hist_merge_quantiles(
    sketches: DataFrame,
    slice_cols: list[str],
    qs: list[float],
    width: float,
    sketch_col: str = "hist",
    out_name: str = "est",
) -> DataFrame:
    """Re-aggregate a histogram-sketch table to any subset of its grouping
    columns and estimate quantiles ``qs`` per slice: explode the maps,
    sum counts per (slice, bucket), then targeted-rank over the cumulative
    counts (rank ``ceil(q·n)``; estimate = bucket midpoint).

    Returns (slice_cols..., q, <out_name>) — one row per slice × quantile.
    The shuffle is keyed by (slice, bucket); per-slice state is the bucket
    count, never the values. The window sort runs over #buckets rows per
    slice (bounded by value-range/width, independent of row count)."""
    from pyspark.sql.window import Window as W

    exploded = sketches.select(
        *slice_cols, F.explode(F.col(sketch_col)).alias("__bk", "__cnt")
    )
    merged = exploded.groupBy(*slice_cols, "__bk").agg(
        F.sum("__cnt").alias("__cnt")
    )
    part = W.partitionBy(*slice_cols) if slice_cols else W.partitionBy(F.lit(1))
    cum = merged.select(
        *slice_cols,
        "__bk",
        F.sum("__cnt").over(part.orderBy("__bk")).alias("__cum"),
        F.sum("__cnt").over(part).alias("__total"),
    )
    qdf = cum.sparkSession.createDataFrame([(float(q),) for q in qs], ["q"])
    hit = cum.crossJoin(F.broadcast(qdf)).filter(  # bounded: literal quantile list
        F.col("__cum") >= F.ceil(F.col("q") * F.col("__total"))
    )
    return hit.groupBy(*slice_cols, "q").agg(
        ((F.min("__bk") + 0.5) * F.lit(width)).alias(out_name)
    )


def hist_merge_property_check(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    width: float,
) -> bool:
    """True iff merging per-group sketches equals sketching the whole frame
    — the mergeability invariant tests pin (sum-per-bucket is associative,
    so this must hold exactly)."""
    whole = hist_group_sketches(df, [], value_col, width).collect()[0]["hist"]
    parts = hist_group_sketches(df, group_cols, value_col, width)
    remerged = (
        parts.select(F.explode("hist").alias("bk", "cnt"))
        .groupBy("bk")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    return dict(whole) == {r["bk"]: r["cnt"] for r in remerged}


def hll_distinct_rollup(
    df: DataFrame,
    ts_col: str,
    levels: list[str],
    key_col: str,
    lgk: int = 12,
    out_name: str = "n_distinct_est",
) -> DataFrame:
    """Sketch counterpart of temporal.distinct_rollup: per-bucket HLL at
    the finest resolution (one scan of the base table), coarser levels
    union the finer level's sketches — the state that flows between levels
    is num_buckets × 2^lgk bytes, not the key sets. Exactness traded for
    mergeability, per bullet's own posture [D].

    Returns (level, bucket_start, <out_name>), finest first.
    """
    fine = df.groupBy(
        F.date_trunc(levels[0], F.col(ts_col)).alias("bucket_start")
    ).agg(F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("__s"))

    def estimate(frame: DataFrame, level: str) -> DataFrame:
        return frame.select(
            F.lit(level).alias("level"),
            "bucket_start",
            F.hll_sketch_estimate(F.col("__s")).alias(out_name),
        )

    out = estimate(fine, levels[0])
    prev = fine
    for lvl in levels[1:]:
        prev = prev.groupBy(
            F.date_trunc(lvl, F.col("bucket_start")).alias("bucket_start")
        ).agg(F.hll_union_agg(F.col("__s")).alias("__s"))
        out = out.unionByName(estimate(prev, lvl))
    return out


def freq_group_sketches(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    capacity: int = 32,
    sketch_col: str = "freq",
) -> DataFrame:
    """Mergeable FREQUENT-ITEMS sketch per group — the TopK counterpart of
    the HLL/histogram pre-aggregates (bullet-core's TOP K is a DataSketches
    frequent-items sketch merged as blobs [D]; our mergeable state is the
    top-``capacity`` counter map plus a certified remainder bound).

    Per group: exact (key, count) aggregation, keep the ``capacity``
    heaviest keys as a ``map<string,long>``; ``rest_weight`` (total dropped
    count) and ``rest_max`` (heaviest dropped count) make the truncation
    honest downstream. For any key and any later merge of sketches:

        kept_sum(key)  ≤  true_count(key)  ≤  kept_sum(key) + Σ rest_max_g

    summed over merged groups where the key was dropped — the
    Misra-Gries-style deterministic bound ``freq_merge_topk`` reports.
    Groups with ≤ capacity distinct keys are EXACT (rest_max = 0), so a
    sketch table built with capacity ≥ per-group cardinality degrades to
    exact top-k; heavier-tailed groups trade tail keys for fixed state —
    capacity·(key+8B) per group at 100 TB, never the key universe.

    Ties at the capacity boundary break by key string (deterministic).
    NULL keys are excluded (map keys cannot be null — same convention as
    hist_group_sketches)."""
    from pyspark.sql.window import Window as W

    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(*group_cols, F.col(key_col).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    part = W.partitionBy(*group_cols) if group_cols else W.partitionBy(F.lit(1))
    ranked = counts.withColumn(
        "__rn", F.row_number().over(part.orderBy(F.col("__c").desc(), F.col("__k")))
    )
    kept = F.map_from_entries(
        F.array_sort(F.collect_list(F.when(F.col("__rn") <= capacity, F.struct("__k", "__c"))))
    )
    rest = F.when(F.col("__rn") > capacity, F.col("__c"))
    return ranked.groupBy(*group_cols).agg(
        kept.alias(sketch_col),
        F.coalesce(F.sum(rest), F.lit(0)).alias("rest_weight"),
        F.coalesce(F.max(rest), F.lit(0)).alias("rest_max"),
    )


def freq_merge_topk(
    sketches: DataFrame,
    slice_cols: list[str],
    k: int = 10,
    sketch_col: str = "freq",
) -> DataFrame:
    """Re-aggregate a frequent-items sketch table to any subset of its
    grouping columns: sum kept counts per key, rank, return the top ``k``
    per slice with the deterministic error bound.

    Returns (slice_cols..., key, est, max_err, rank): ``est ≤ true ≤ est +
    max_err``; ``max_err`` = Σ rest_max over the merged sketches (0 ⇒ the
    slice's top-k is exact). State flowing through the merge is
    #groups × capacity entries — never the base table."""
    from pyspark.sql.window import Window as W

    exploded = sketches.select(
        *slice_cols, F.explode(F.col(sketch_col)).alias("key", "cnt")
    )
    merged = exploded.groupBy(*slice_cols, "key").agg(F.sum("cnt").alias("est"))
    errs = sketches.groupBy(*slice_cols).agg(F.sum("rest_max").alias("max_err"))
    part = W.partitionBy(*slice_cols) if slice_cols else W.partitionBy(F.lit(1))
    ranked = merged.withColumn(
        "rank", F.row_number().over(part.orderBy(F.col("est").desc(), F.col("key")))
    ).filter(F.col("rank") <= k)
    if slice_cols:
        return ranked.join(errs, slice_cols)
    return ranked.crossJoin(F.broadcast(errs))  # bounded: global agg, 1 row


_live_rollup_fine: DataFrame | None = None


def _persist_rollup_fine(counts: DataFrame) -> DataFrame:
    """Persist the finest-level bucket-count frame, releasing the previous
    rollup's (grouped plans get fresh expression ids per call, so the
    CacheManager never dedupes them — without the release a long-lived
    driver calling the rollup in a loop leaks one InMemoryRelation per
    call). The eager count materializes the cache so the level branches
    plan against real InMemoryRelation stats."""
    global _live_rollup_fine
    if _live_rollup_fine is not None:
        _live_rollup_fine.unpersist()
    counts = counts.persist()
    _live_rollup_fine = counts
    counts.count()
    return counts


def hist_quantile_rollup(
    df: DataFrame,
    ts_col: str,
    levels: list[str],
    value_col: str,
    width: float,
    qs: list[float],
) -> DataFrame:
    """Quantile counterpart of :func:`hll_distinct_rollup`: per-bucket
    histogram sketches at the finest time resolution (one scan of the base
    table); every coarser level re-merges the finer level's bucket counts —
    the state flowing between levels is #buckets × (8+8) bytes per time
    bucket, never the values. Returns (level, bucket_start, q, est),
    finest first; every estimate within ``width`` of exact."""
    fine = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.date_trunc(levels[0], F.col(ts_col)).alias("bucket_start"),
            F.floor(F.col(value_col) / F.lit(width)).cast("long").alias("__bk"),
        )
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    # materialize the finest-level counts: the finest estimate AND every
    # coarser level read this frame, and without a persist each union
    # branch re-derives it from the base scan — defeating the no-rescan
    # property the mergeable sketch exists for (pinned by plan contract).
    # The frame is result-sized: #time-buckets × #value-buckets counters.
    fine = _persist_rollup_fine(fine)

    def estimate(counts: DataFrame, level: str) -> DataFrame:
        sk_tbl = counts.groupBy("bucket_start").agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("__bk", "__cnt")))
            ).alias("hist")
        )
        out = hist_merge_quantiles(sk_tbl, ["bucket_start"], qs, width)
        return out.select(F.lit(level).alias("level"), "bucket_start", "q", "est")

    out = estimate(fine, levels[0])
    prev = fine
    for lvl in levels[1:]:
        prev = prev.groupBy(
            F.date_trunc(lvl, F.col("bucket_start")).alias("bucket_start"), "__bk"
        ).agg(F.sum("__cnt").alias("__cnt"))
        out = out.unionByName(estimate(prev, lvl))
    return out


def streaming_windowed_hist(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    value_col: str,
    width: float,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """STREAMING quantile state: per (event-time window, bucket) counts —
    a standard streaming aggregation Catalyst merges incrementally
    (update mode), with watermark-evicted state. Bucket counts are the
    mergeable quantile sketch of hist_group_sketches, so the stream's
    state per window is #buckets counters, never the values — this is how
    windowed Distribution queries stay bounded on an unbounded stream.

    Emit (window_start, bucket, cnt) rows; pair with
    ``hist_counts_to_quantiles`` in the sink to turn any window's counts
    into quantile estimates (within ``width`` of exact)."""
    from bullet_spark_spark.sources.streaming import ensure_event_time

    base = ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark_delay)
    return (
        base.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("__w"),
            F.floor(F.col(value_col) / F.lit(width)).cast("long").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("__w.start").alias("window_start"), "bucket", "cnt")
    )


def hist_counts_to_quantiles(
    counts: DataFrame, qs: list[float], width: float
) -> DataFrame:
    """(window_start, bucket, cnt) → (window_start, q, est): the batch-side
    finalize of streaming_windowed_hist (targeted rank over cumulative
    counts, same estimator as hist_merge_quantiles). Run it in
    foreachBatch on the update stream, or once over the drained state."""
    from pyspark.sql.window import Window as W

    part = W.partitionBy("window_start")
    cum = counts.select(
        "window_start",
        "bucket",
        F.sum("cnt").over(part.orderBy("bucket")).alias("__cum"),
        F.sum("cnt").over(part).alias("__total"),
    )
    qdf = counts.sparkSession.createDataFrame([(float(q),) for q in qs], ["q"])
    hit = cum.crossJoin(F.broadcast(qdf)).filter(  # bounded: literal quantile list
        F.col("__cum") >= F.ceil(F.col("q") * F.col("__total"))
    )
    return hit.groupBy("window_start", "q").agg(
        ((F.min("bucket") + 0.5) * F.lit(width)).alias("est")
    )


# ---------------------------------------------------------------------------
# Theta (bottom-k / KMV) COUNT DISTINCT — estimator parity with bullet-core
# ---------------------------------------------------------------------------

THETA_DEFAULT_K = 4096


def theta_result_meta(estimate: float, k: int = THETA_DEFAULT_K) -> dict:
    """bullet-style sketch metadata for a Theta-estimated COUNT DISTINCT.

    bullet-core's approximate COUNT DISTINCT beyond its exact threshold is
    an Apache DataSketches THETA sketch serialized/merged as a byte blob
    (FilterStreaming.scala:124 partials, JoinStreaming.scala:126 combine
    [D]); the repo's default substitute is Spark's native HLL family
    (hll_result_meta above) with correct-but-different error behavior.
    This is the Theta-family envelope: for a bottom-k (KMV) Theta sketch
    the relative standard error is 1/sqrt(k - 2) (~1.56% at k=4096 —
    DataSketches' published Theta accuracy), and the z-sigma bounds
    linearize the same way. ``family`` reports "Theta" so result metadata
    matches what a bullet-core deployment emits.

    ``k`` must be ≥ 16 (DataSketches' own minimum nominal entries): below
    that the 3-sigma denominator 1 − 3/sqrt(k−2) crosses zero (k ≤ 11)
    and the "upper bound" would come out negative/infinite."""
    if k < 16:
        raise ValueError(
            f"theta_result_meta: k={k} below the minimum 16 "
            "(DataSketches floor; z-sigma bounds degenerate for small k)"
        )
    rse = 1.0 / math.sqrt(float(k - 2))
    est = float(estimate)
    return {
        "was_estimated": True,
        "family": "Theta",
        "k": k,
        "estimate": est,
        "relative_std_error": rse,
        "bounds": {
            str(z): {"lower": est / (1.0 + z * rse), "upper": est / (1.0 - z * rse)}
            for z in (1, 2, 3)
        },
    }


def theta_group_sketches(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = THETA_DEFAULT_K,
    sketch_col: str = "theta",
    merge_fanin: int = 64,
) -> DataFrame:
    """One scan → per-group bottom-k Theta sketch state of ``key_col``: the
    k smallest distinct xxhash64 values, as a sorted ``array<bigint>``
    column — the KMV special case of the Theta-sketch family (Beyer et al.
    2007 "On Synopses for Distinct-Value Estimation"; Apache DataSketches'
    Theta generalizes exactly this bottom-k state). Estimator parity with
    bullet-core's theta blobs, implemented engine-portably (no JVM-side
    DataSketches binding needed; if the ``datasketches`` wheel is present
    a compact-blob variant could swap in behind the same frame shape).

    Two-level bounded plan (the UDAF-free mergeable layout):

    1. map-side: per (input partition × group) bottom-k over the hashed
       keys inside ``mapInPandas`` — numpy unique + partition, O(k) state
       per group per partition, nothing unbounded;
    2. reduce: per group, the partials merge with pure codegen set algebra
       (flatten → array_distinct → array_sort → slice k) as a SALTED TREE:
       a first level merges each group's partials within ``merge_fanin``
       salt buckets, the second merges the ≤ ``merge_fanin`` survivors —
       without it one row per group would hold #partitions × k longs
       (≈3 GB at 100k input partitions, k=4096); with it the worst row is
       max(#partitions/fanin, fanin) × k. The union is a set operation, so
       the salt assignment cannot change the result.

    The sketch table is a persistable pre-aggregate exactly like
    ``hll_group_sketches``: any coarser slice is answered by
    ``theta_merge_slices`` from kilobytes of state, never by rescanning
    the base table.
    """
    import numpy as np
    import pandas as pd

    # COUNT DISTINCT semantics exclude NULL keys (xxhash64(NULL) would
    # otherwise contribute the seed as a phantom distinct value)
    hashed = df.filter(F.col(key_col).isNotNull()).select(
        *group_cols, F.xxhash64(F.col(key_col)).alias("__h")
    )
    part_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    ) + f", {sketch_col} array<bigint>"

    def partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = (
                pdf.groupby(group_cols, sort=False, dropna=False)["__h"]
                .apply(
                    lambda s: np.sort(np.unique(s.to_numpy(dtype=np.int64)))[:k]
                    .tolist()
                )
                .reset_index(name=sketch_col)
            )
            yield out

    def _merge(frame: DataFrame, keys: list) -> DataFrame:
        return frame.groupBy(*keys).agg(
            F.slice(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list(sketch_col)))
                ),
                1,
                k,
            ).alias(sketch_col)
        )

    partials = hashed.mapInPandas(partial, schema=part_schema).withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(merge_fanin))
    )
    level1 = _merge(partials, [*group_cols, "__salt"])
    return _merge(level1, list(group_cols))


def _theta_estimate_col(sketch: F.Column | str, k: int) -> F.Column:
    """(k-1)/theta estimate from a sorted bottom-k hash array; exact size
    when the sketch never saturated (fewer than k distinct keys seen).
    Hashes are signed 64-bit; theta maps the kth smallest onto (0, 1) via
    (h + 2^63 + 1) / 2^64."""
    s = F.col(sketch) if isinstance(sketch, str) else sketch
    n = F.size(s)
    kth = F.element_at(s, k).cast("double")
    theta = (kth + F.lit(float(2**63) + 1.0)) / F.lit(float(2**64))
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / theta
    )


def theta_merge_slices(
    sketches: DataFrame,
    slice_cols: list[str],
    k: int = THETA_DEFAULT_K,
    sketch_col: str = "theta",
    out_name: str = "n_distinct_est",
    merge_fanin: int = 64,
) -> DataFrame:
    """Re-aggregate a Theta sketch table to any subset of its grouping
    columns: union the bottom-k states per slice (flatten → distinct →
    sort → slice — set union then re-truncate, the Theta union rule) and
    estimate. Mirror of ``hll_merge_slices``. Merges as the same salted
    two-level tree as ``theta_group_sketches`` — a slice covering millions
    of fine groups must not flatten them all into one row."""
    salted = sketches.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(merge_fanin))
    )

    def _merge(frame: DataFrame, keys: list) -> DataFrame:
        grouped = frame.groupBy(*keys) if keys else frame.groupBy(F.lit(1).alias("__all"))
        return grouped.agg(
            F.slice(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list(sketch_col)))
                ),
                1,
                k,
            ).alias(sketch_col)
        )

    level1 = _merge(salted, [*slice_cols, "__salt"])
    merged = _merge(level1, list(slice_cols))
    out = merged.select(
        *(slice_cols if slice_cols else []),
        F.round(_theta_estimate_col(sketch_col, k), 6).alias(out_name),
    )
    return out


def theta_intersection_estimate(
    sketch_a: F.Column | str,
    sketch_b: F.Column | str,
    k: int = THETA_DEFAULT_K,
) -> F.Column:
    """Estimated |A ∩ B| from two bottom-k Theta states built with the
    same k — the operation the Theta family exists for (DataSketches'
    headline advantage over HLL, whose only route to an intersection is
    inclusion-exclusion differencing with error relative to the UNION):
    take θ = min(θ_A, θ_B), count the COMMON hashes below the θ cutoff,
    estimate count/θ. Error is relative to the intersection-sample size,
    so small overlaps between large sets stay resolvable — the exact
    regime ``hll_overlap_matrix`` documents as its weakness.

    Unsaturated sides (fewer than k distinct keys) have θ = 1 and
    contribute no cutoff; two unsaturated sketches give the EXACT
    intersection count. Pure codegen set algebra over the two k-long
    arrays — the per-element lambda only compares against an O(1)
    cutoff column (the interpreted-HOF budget rule)."""
    sa = F.col(sketch_a) if isinstance(sketch_a, str) else sketch_a
    sb = F.col(sketch_b) if isinstance(sketch_b, str) else sketch_b
    # kth-smallest hash = the θ cutoff, only when the sketch saturated
    cut_a = F.when(F.size(sa) >= k, F.element_at(sa, k))
    cut_b = F.when(F.size(sb) >= k, F.element_at(sb, k))
    cutoff = F.least(cut_a, cut_b)  # least skips NULLs; NULL ⇒ both θ=1
    inter = F.array_intersect(sa, sb)
    below = F.when(cutoff.isNull(), F.size(inter)).otherwise(
        F.size(F.filter(inter, lambda h: h < cutoff))
    )
    theta = F.when(
        cutoff.isNull(), F.lit(1.0)
    ).otherwise(
        (cutoff.cast("double") + F.lit(float(2**63) + 1.0))
        / F.lit(float(2**64))
    )
    return below.cast("double") / theta


def theta_overlap_matrix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = THETA_DEFAULT_K,
) -> DataFrame:
    """Approximate pairwise key-overlap between groups via DIRECT Theta
    intersection → (group_a, group_b, n_a_est, n_b_est, n_overlap_est,
    jaccard_est): one bottom-k state per group (one scan), every pair
    estimated over the #groups-sized sketch frame. The companion to
    ``hll_overlap_matrix`` for the small-overlap-between-large-sets
    regime where inclusion-exclusion drowns in union noise; state is
    k longs per group instead of 2^lgk bytes. Jaccard uses the union
    estimate from the merged bottom-k state (the Theta union rule)."""
    sks = theta_group_sketches(df, [group_col], key_col, k=k)
    a = sks.select(
        F.col(group_col).alias("group_a"), F.col("theta").alias("__ta")
    )
    b = sks.select(
        F.col(group_col).alias("group_b"), F.col("theta").alias("__tb")
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    union_state = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("__ta"), F.col("__tb")))),
        1,
        k,
    )
    n_o = theta_intersection_estimate(F.col("__ta"), F.col("__tb"), k)
    n_u = _theta_estimate_col(union_state, k)
    return pairs.select(
        "group_a",
        "group_b",
        F.round(_theta_estimate_col("__ta", k), 2).alias("n_a_est"),
        F.round(_theta_estimate_col("__tb", k), 2).alias("n_b_est"),
        F.round(n_o, 2).alias("n_overlap_est"),
        F.round(
            F.when(n_u > 0, n_o / n_u).otherwise(F.lit(0.0)), 6
        ).alias("jaccard_est"),
    )


# ---------------------------------------------------------------------------
# Bloom filter: distributed build / probe / merge for semi-join pruning
# ---------------------------------------------------------------------------

BLOOM_DEFAULT_M = 1 << 20  # bits (128 KiB of filter state)
BLOOM_DEFAULT_K = 5

# single-bit masks as one 64-long literal array: mask for bit b is
# element b+1. Bit 63 must be the SIGNED minimum (1<<63 overflows long);
# bitwise AND/OR on two's complement longs is unaffected by the sign.
_MASKS64 = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def bloom_fpr(n_keys: int, m_bits: int = BLOOM_DEFAULT_M, k: int = BLOOM_DEFAULT_K) -> float:
    """Expected false-positive rate (1 − e^(−kn/m))^k for ``n_keys``
    inserted keys — the standard Bloom bound (Bloom 1970)."""
    if n_keys <= 0:
        return 0.0
    return (1.0 - math.exp(-float(k) * n_keys / float(m_bits))) ** k


def bloom_size(n_keys: int, target_fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``target_fpr`` at ``n_keys`` keys:
    m = ⌈−n·ln p / ln²2⌉ rounded up to a multiple of 64, k = round(m/n·ln2)
    — the textbook optimum (~9.6 bits/key and k=7 at 1%)."""
    n = max(int(n_keys), 1)
    m = int(math.ceil(-n * math.log(target_fpr) / (math.log(2.0) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2.0)))
    return m, k


def _bloom_pos(key: F.Column, i: int, m_bits: int, seed: int) -> F.Column:
    """i-th bit position for a key: pmod(xxhash64(key, seed, i), m) —
    k independent hash functions from one xxhash64 by mixing the probe
    index into the hashed tuple (the same per-seed trick minhash uses)."""
    return F.pmod(F.xxhash64(key, F.lit(seed), F.lit(i)), F.lit(m_bits))


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_DEFAULT_M,
    k: int = BLOOM_DEFAULT_K,
    seed: int = 0,
) -> DataFrame:
    """Distributed Bloom-filter build → a SPARSE bitmap frame
    (word int, bits long) with one row per set 64-bit word, ≤ m/64 rows
    total (16 Ki rows / 128 KiB at the default m) regardless of input
    size. The reference's sketch posture applied to membership: like the
    HLL/Theta tables above, the words frame is a persistable, mergeable
    pre-aggregate — never collected to the driver.

    Plan: k positions per key explode inside the scan stage, the word/
    mask projection stays in codegen, and ONE map-side-combinable
    ``bit_or`` aggregation reduces to the words frame — state per reducer
    is bounded by the filter size, not the key count. NULL keys are
    skipped (a semi-join never matches NULL; hashing it would pin every
    NULL to one phantom position).

    Spark's AQE injects runtime bloom joins within one query; this
    explicit build is for CROSS-query pruning — build once from the
    selective side, persist, probe any number of later scans
    (``bloom_probe`` / ``bloom_prune_join``)."""
    masks = F.lit(_MASKS64)
    key = F.col(key_col)
    pos_arr = F.array(*[_bloom_pos(key, i, m_bits, seed) for i in range(k)])
    return (
        df.filter(key.isNotNull())
        .select(F.explode(pos_arr).alias("__pos"))
        .select(
            F.shiftright(F.col("__pos"), 6).cast("int").alias("word"),
            F.element_at(
                masks, (F.col("__pos").bitwiseAND(F.lit(63)) + 1).cast("int")
            ).alias("__mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two bloom word frames built with the SAME (m, k, seed):
    bit_or per word — the filter of the unioned key sets, exactly
    (Bloom filters are lossless under union). Mergeable like every
    sketch in this module: per-shard filters roll up to a corpus filter
    without touching the corpus."""
    return (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = BLOOM_DEFAULT_M,
    k: int = BLOOM_DEFAULT_K,
    seed: int = 0,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Membership test against a ``bloom_build`` words frame → ``df``
    plus a boolean ``out_col`` (false ⇒ DEFINITELY absent; true ⇒ present
    or a false positive at the ``bloom_fpr`` rate). NULL keys test false.

    Scale shape — the entire point of the operator: the PROBE SIDE NEVER
    SHUFFLES in the broadcast regime. Each of the k bit tests is a
    broadcast-hash left join of the ≤ m/64-row words frame onto the scan
    (one BroadcastExchange, reused k times), and the bit arithmetic is
    plain codegen — so filtering a 100 TB fact scan down to the rows that
    might match a selective key set costs one pass over the scan and zero
    exchanges of it, where a left_semi join would shuffle both sides or
    need the whole key set broadcast.

    Broadcast regime bound: the hint is applied only while
    ``m_bits/64 ≤ SKETCH_BROADCAST_MAX_ROWS`` (4 Mi words = 256 Mi filter
    bits ≈ 28 M keys at 1% FPR). Above that — e.g. a bloom_size-d filter
    for 1 B keys is ~150 M words — forcing the broadcast would OOM the
    driver, so the hint is omitted and AQE picks the join strategy; the
    semantics are identical, only the exchange shape changes."""
    key = F.col(key_col)
    masks = F.lit(_MASKS64)
    hint = (lambda s: F.broadcast(s)) if (m_bits >> 6) <= SKETCH_BROADCAST_MAX_ROWS else (lambda s: s)
    p = _fresh_prefix(df, "__b")
    out = df
    tests = []
    drop: list[str] = []
    for i in range(k):
        pos = _bloom_pos(key, i, m_bits, seed)
        out = out.withColumn(f"{p}w{i}", F.shiftright(pos, 6).cast("int"))
        out = out.withColumn(
            f"{p}m{i}",
            F.element_at(masks, (pos.bitwiseAND(F.lit(63)) + 1).cast("int")),
        )
        side = bloom.select(
            F.col("word").alias(f"{p}w{i}"), F.col("bits").alias(f"{p}b{i}")
        )
        out = out.join(hint(side), f"{p}w{i}", "left")
        tests.append(
            F.coalesce(F.col(f"{p}b{i}"), F.lit(0))
            .bitwiseAND(F.col(f"{p}m{i}"))
            != 0
        )
        drop += [f"{p}w{i}", f"{p}m{i}", f"{p}b{i}"]
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    return out.withColumn(
        out_col, F.when(key.isNull(), F.lit(False)).otherwise(cond)
    ).drop(*drop)


def bloom_prune_join(
    big: DataFrame,
    keys_df: DataFrame,
    on: str,
    m_bits: int | None = None,
    k: int | None = None,
    target_fpr: float = 0.01,
    seed: int = 0,
    exact: bool = False,
) -> DataFrame:
    """Semi-join reduction: rows of ``big`` whose ``on`` key is (maybe)
    present in ``keys_df`` — build a Bloom filter on the selective side,
    probe the big scan, filter. With ``exact=True`` a real left_semi join
    against the (bloom-shrunk) key set follows, removing false positives:
    the result then EQUALS ``big.join(keys, on, "left_semi")``, but the
    expensive join's left input is already pruned to ~|match| + fpr·|big|
    rows instead of |big|.

    Filter parameters auto-size from the distinct key count (one bounded
    scalar over the selective side) for ``target_fpr`` unless given."""
    if m_bits is None or k is None:
        n = keys_df.select(on).distinct().count()  # bounded: one scalar
        m_auto, k_auto = bloom_size(n, target_fpr)
        m_bits = m_bits if m_bits is not None else m_auto
        k = k if k is not None else k_auto
    bloom = bloom_build(keys_df, on, m_bits, k, seed)
    pruned = (
        bloom_probe(big, on, bloom, m_bits, k, seed, out_col="__maybe")
        .filter(F.col("__maybe"))
        .drop("__maybe")
    )
    if exact:
        pruned = pruned.join(keys_df.select(on).distinct(), on, "left_semi")
    return pruned


# ---------------------------------------------------------------------------
# Count-Min sketch: point-frequency estimates under fixed memory
# ---------------------------------------------------------------------------

CMS_DEFAULT_W = 2048  # counters per hash row
CMS_DEFAULT_D = 5  # hash rows


def cms_error(w: int = CMS_DEFAULT_W, d: int = CMS_DEFAULT_D) -> dict:
    """The Count-Min guarantee (Cormode & Muthukrishnan 2005) for a w×d
    sketch: with probability ≥ 1−δ (δ = e^−d),
    true ≤ estimate ≤ true + ε·N with ε = e/w, N = total inserted
    weight. Underestimation is impossible."""
    return {"epsilon": math.e / float(w), "delta": math.exp(-float(d))}


def _cms_pos(key: F.Column, i: int, w: int, seed: int, portable: bool) -> F.Column:
    """Row-i cell position. Default: pmod(xxhash64(key, seed, i), w) — the
    fast engine hash. ``portable=True``: the first 32 md5 bits of
    ``"i:" || key`` (conv hex→long, mod w) — byte-identical in any SQL
    engine with md5() (``CAST('0x'||substr(md5(..),1,8) AS BIGINT)`` in
    DuckDB), the same cross-engine trick ``minhash_signatures_md5`` uses;
    ``seed`` is ignored in portable mode (the probe index is the salt)."""
    if portable:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(w)).cast("int")
    return F.pmod(F.xxhash64(key, F.lit(seed), F.lit(i)), F.lit(w)).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    w: int = CMS_DEFAULT_W,
    d: int = CMS_DEFAULT_D,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Distributed Count-Min sketch build → a SPARSE counters frame
    (row int, col int, cnt long), ≤ d·w rows total (10 Ki at the
    defaults) regardless of key cardinality — the point-frequency
    counterpart of ``freq_group_sketches``: the frequent-items sketch
    tracks only the heavy hitters it kept, Count-Min answers
    "how often did THIS key occur" for ANY key, overestimating by at
    most ε·N (``cms_error``) and never underestimating.

    Same posture as ``bloom_build``: d positions per key explode inside
    the scan stage, ONE map-side-combinable sum reduces to the counters
    frame, state bounded by the sketch size, nothing collected. NULL
    keys are skipped; ``weight_col`` (default: count 1 per row) admits
    weighted frequencies (bytes, tokens) under the same bound.
    ``portable=True`` switches to the md5 cell hash (``_cms_pos``) so the
    whole sketch — and therefore every estimate — is reproducible by an
    engine-independent SQL oracle."""
    key = F.col(key_col)
    wgt = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_pos(key, i, w, seed, portable).alias("col"),
            )
            for i in range(d)
        ]
    )
    return (
        df.filter(key.isNotNull())
        .select(F.explode(cells).alias("__c"), wgt.alias("__w"))
        .groupBy(F.col("__c.row").alias("row"), F.col("__c.col").alias("col"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two counters frames built with the SAME (w, d, seed):
    per-cell sum — Count-Min sketches merge by matrix addition, exactly
    (the estimate over the merged sketch equals the estimate over the
    concatenated input). Per-shard sketches roll up to a corpus sketch
    without touching the corpus."""
    return (
        a.unionByName(b).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )


def cms_join_size_estimate(
    cms_a: DataFrame,
    cms_b: DataFrame,
    out_name: str = "join_rows_est",
) -> DataFrame:
    """Estimated INNER-JOIN cardinality |A ⋈ B| from the two sides' CMS
    counters (built with the SAME (w, d, seed) on the join key): the
    true join size is Σ_key fa(key)·fb(key), and the per-row counter
    inner product Σ_col a·b never undercounts it — take the min over the
    d rows (Cormode & Muthukrishnan 2005 §4.2: overestimate ≤ ε·Na·Nb
    with probability 1−δ).

    The pre-flight a shuffle planner wants at 100 TB: decide broadcast
    vs sort-merge vs salting from two sketch-sized frames — one inner
    join of ≤ d·w rows each, one agg — without scanning either side
    again (absent cells are 0 and contribute nothing, so the sparse
    inner join is exact). Returns one row: (out_name bigint)."""
    prods = cms_a.alias("a").join(
        cms_b.alias("b"), ["row", "col"]
    ).select("row", (F.col("a.cnt") * F.col("b.cnt")).alias("__p"))
    per_row = prods.groupBy("row").agg(F.sum("__p").alias("__ip"))
    return per_row.agg(F.min("__ip").alias(out_name))


def cms_lookup(
    df: DataFrame,
    key_col: str,
    cms: DataFrame,
    w: int = CMS_DEFAULT_W,
    d: int = CMS_DEFAULT_D,
    seed: int = 0,
    out_col: str = "freq_est",
    portable: bool = False,
) -> DataFrame:
    """Point-frequency estimate per row of ``df`` → ``df`` plus
    ``out_col`` = min over the d counters the key hashes to (a cell
    absent from the sparse frame is 0 — the key was definitely never
    inserted on that row). Like ``bloom_probe``, the LOOKUP SIDE NEVER
    SHUFFLES in the broadcast regime: each counter read is a
    broadcast-hash left join of a ≤ w-row slice of the counters frame,
    and the min is plain codegen. The hint is gated the same way
    (``w ≤ SKETCH_BROADCAST_MAX_ROWS``, else AQE chooses). ``portable``
    must match the build-side flag — mixed hashes read garbage cells."""
    key = F.col(key_col)
    hint = (lambda s: F.broadcast(s)) if w <= SKETCH_BROADCAST_MAX_ROWS else (lambda s: s)
    p = _fresh_prefix(df, "__c")
    out = df
    ests = []
    drop: list[str] = []
    for i in range(d):
        pos = _cms_pos(key, i, w, seed, portable)
        out = out.withColumn(f"{p}c{i}", pos)
        side = cms.filter(F.col("row") == i).select(
            F.col("col").alias(f"{p}c{i}"), F.col("cnt").alias(f"{p}v{i}")
        )
        out = out.join(hint(side), f"{p}c{i}", "left")
        ests.append(F.coalesce(F.col(f"{p}v{i}"), F.lit(0)))
        drop += [f"{p}c{i}", f"{p}v{i}"]
    return out.withColumn(
        out_col, F.when(key.isNull(), F.lit(None)).otherwise(F.least(*ests))
    ).drop(*drop)
