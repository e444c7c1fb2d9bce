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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
