"""HLL sketch operators: estimates within the configured error bound of
exact answers, and the slice-merge property (union of sketches == sketch
of union) that makes the sketch table a re-usable pre-aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from bullet_spark_spark.operators import sketch as sk

REL_TOL = 0.05  # lgk=12 → ~1.6% std error; 5% is a >3-sigma bound


def _close(est: float, exact: int) -> bool:
    return abs(est - exact) <= max(REL_TOL * exact, 2)


def test_hll_rollup_close_to_exact(spark, tables, duck):
    out = {
        (r["level"], r["bucket_start"]): r["n_distinct_est"]
        for r in sk.hll_distinct_rollup(
            tables["events"], "ts", ["day", "month"], "user_id"
        ).collect()
    }
    exact = duck.execute(
        """SELECT 'day' AS level, CAST(date_trunc('day', ts) AS TIMESTAMP) AS b,
                  count(DISTINCT user_id) AS n FROM events GROUP BY 2
           UNION ALL
           SELECT 'month', CAST(date_trunc('month', ts) AS TIMESTAMP),
                  count(DISTINCT user_id) FROM events GROUP BY 2"""
    ).fetchall()
    assert len(out) == len(exact)
    for level, b, n in exact:
        assert _close(out[(level, b)], n), (level, b, out[(level, b)], n)


def test_hll_slice_merge_equals_direct(spark, tables):
    """Union-of-sketches == sketch-of-union: estimates from the persisted
    per-(day, event_type) sketch table merged to event_type must EQUAL the
    estimate computed directly per event_type (identical blobs, not just
    close) — the property that lets a pre-aggregate answer coarser slices
    without rescanning."""
    ev = tables["events"].withColumn("day", F.date_trunc("day", F.col("ts")))
    pre = sk.hll_group_sketches(ev, ["day", "event_type"], "user_id")
    merged = {
        r["event_type"]: r["n_distinct_est"]
        for r in sk.hll_merge_slices(pre, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["n_distinct_est"]
        for r in sk.hll_merge_slices(
            sk.hll_group_sketches(ev, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    assert merged == direct


def test_hll_global_slice(spark, tables):
    pre = sk.hll_group_sketches(tables["events"], ["event_type"], "user_id")
    [row] = sk.hll_merge_slices(pre, []).collect()
    exact = tables["events"].select("user_id").distinct().count()
    assert _close(row["n_distinct_est"], exact)
