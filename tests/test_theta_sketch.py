"""Theta (bottom-k/KMV) COUNT DISTINCT — estimator parity with
bullet-core's DataSketches theta blobs (FilterStreaming.scala:124,
JoinStreaming.scala:126), implemented engine-portably.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import sketch as sk


def test_theta_exact_below_k(spark, tables):
    """A sketch that never saturates reports the exact distinct count —
    the same exact-below-threshold contract bullet-core's theta path has."""
    est = sk.theta_merge_slices(
        sk.theta_group_sketches(tables["events"], ["event_type"], "user_id", k=4096),
        ["event_type"],
        k=4096,
    )
    exact = tables["events"].groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")
    )
    got = {r.event_type: r.n_distinct_est for r in est.collect()}
    want = {r.event_type: float(r.n) for r in exact.collect()}
    assert got == want


def test_theta_estimate_within_bounds_when_saturated(spark):
    """k=256 over 20k distinct keys: the (k-1)/theta estimate lands within
    the 3-sigma Theta envelope (rse = 1/sqrt(k-2) ≈ 6.3%)."""
    n = 20_000
    df = spark.range(n).select((F.col("id") * 7919 + 13).alias("key"))
    est = sk.theta_merge_slices(
        sk.theta_group_sketches(df.withColumn("g", F.lit(1)), ["g"], "key", k=256),
        ["g"],
        k=256,
    ).collect()[0]["n_distinct_est"]
    rse = 1.0 / (254.0**0.5)
    assert n / (1 + 3 * rse) <= est <= n / (1 - 3 * rse)


def test_theta_union_equals_direct(spark, tables):
    """Theta union rule: merging fine-grained sketches to a coarser slice
    yields the IDENTICAL state as sketching the coarse slice directly
    (bottom-k of a union == truncated union of bottom-ks) — the
    pre-aggregate-reuse property that matters at 100 TB."""
    ev = tables["events"]
    fine = sk.theta_group_sketches(ev, ["event_type", "user_id"], "event_id", k=64)
    via_merge = {
        r.event_type: r.n_distinct_est
        for r in sk.theta_merge_slices(fine, ["event_type"], k=64).collect()
    }
    direct = {
        r.event_type: r.n_distinct_est
        for r in sk.theta_merge_slices(
            sk.theta_group_sketches(ev, ["event_type"], "event_id", k=64),
            ["event_type"],
            k=64,
        ).collect()
    }
    assert via_merge == direct


def test_theta_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, None), (1, None)], "g int, key string"
    )
    est = sk.theta_merge_slices(
        sk.theta_group_sketches(df, ["g"], "key"), ["g"]
    ).collect()[0]["n_distinct_est"]
    assert est == 2.0


def test_theta_global_slice(spark, tables):
    """slice_cols=[] → one global estimate row (GROUP ALL shape)."""
    fine = sk.theta_group_sketches(tables["events"], ["event_type"], "user_id")
    rows = sk.theta_merge_slices(fine, []).collect()
    exact = tables["events"].select("user_id").distinct().count()
    assert len(rows) == 1 and rows[0]["n_distinct_est"] == float(exact)


def test_theta_meta_family():
    """bullet result-meta parity: family must say Theta (the estimator the
    reference deploys), with the KMV error envelope."""
    meta = sk.theta_result_meta(1000.0, k=4096)
    assert meta["family"] == "Theta"
    assert meta["was_estimated"] is True
    assert meta["relative_std_error"] == pytest.approx(1.0 / (4094.0**0.5))
    assert meta["bounds"]["2"]["lower"] < 1000.0 < meta["bounds"]["2"]["upper"]
    assert meta["bounds"]["1"]["upper"] < meta["bounds"]["3"]["upper"]


def test_theta_intersection_exact_below_k(spark):
    """Two unsaturated sketches intersect EXACTLY (theta = 1 on both
    sides), including the disjoint case."""
    a = spark.range(0, 500).select(F.lit("A").alias("g"), F.col("id"))
    b = spark.range(300, 900).select(F.lit("B").alias("g"), F.col("id"))
    c = spark.range(5_000, 5_100).select(F.lit("C").alias("g"), F.col("id"))
    out = {
        (r.group_a, r.group_b): r
        for r in sk.theta_overlap_matrix(
            a.unionByName(b).unionByName(c), "g", "id", k=4096
        ).collect()
    }
    assert out[("A", "B")].n_overlap_est == 200.0
    assert out[("A", "C")].n_overlap_est == 0.0
    assert out[("B", "C")].n_overlap_est == 0.0
    assert abs(out[("A", "B")].jaccard_est - 200.0 / 900.0) < 1e-6


def test_theta_intersection_small_overlap_large_sets(spark):
    """The regime HLL inclusion-exclusion cannot resolve: overlap of 400
    between two 40k-key sets (1% of union). Saturated k=1024 sketches
    estimate it within 5x the per-set rse of the OVERLAP itself — not of
    the union — because the intersection is sampled directly."""
    a = spark.range(0, 40_000).select(F.lit("A").alias("g"), F.col("id"))
    b = spark.range(39_600, 79_600).select(F.lit("B").alias("g"), F.col("id"))
    k = 1024
    out = sk.theta_overlap_matrix(a.unionByName(b), "g", "id", k=k).collect()[0]
    true_overlap = 400.0
    # direct-sample error: the intersection keeps ~k * overlap/union
    # points; allow a generous envelope around the expectation
    assert out.n_overlap_est >= 0
    assert abs(out.n_overlap_est - true_overlap) <= 0.75 * true_overlap, out
    # sanity: per-set estimates within the 3-sigma theta envelope
    rse = 1.0 / (k - 2) ** 0.5
    assert abs(out.n_a_est - 40_000) <= 3 * rse * 40_000
    assert abs(out.n_b_est - 40_000) <= 3 * rse * 40_000
