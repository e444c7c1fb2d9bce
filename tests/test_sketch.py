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


# -- mergeable quantile (bucket-histogram) sketches -------------------------

WIDTH = 0.5  # events.value spans ~[0, 100]


def test_hist_merge_invariant(spark, tables):
    """Sum-per-bucket merge is associative: merging per-event_type sketches
    must reproduce the whole-table sketch EXACTLY (not approximately)."""
    assert sk.hist_merge_property_check(tables["events"], ["event_type"], "value", WIDTH)


def test_hist_quantiles_within_width(spark, tables, duck):
    """Every sketch-derived quantile lies within one bucket width of the
    exact quantile, per slice and globally."""
    pre = sk.hist_group_sketches(
        tables["events"], ["event_type", "user_id"], "value", WIDTH
    )
    qs = [0.1, 0.5, 0.9]
    got = {
        (r["event_type"], r["q"]): r["est"]
        for r in sk.hist_merge_quantiles(pre, ["event_type"], qs, WIDTH).collect()
    }
    for et, q, exact in duck.execute(
        """SELECT event_type, CAST(0.1 AS DOUBLE) AS q, quantile_disc(value, 0.1) FROM events GROUP BY 1
           UNION ALL
           SELECT event_type, CAST(0.5 AS DOUBLE), quantile_disc(value, 0.5) FROM events GROUP BY 1
           UNION ALL
           SELECT event_type, CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9) FROM events GROUP BY 1"""
    ).fetchall():
        assert abs(got[(et, q)] - exact) <= WIDTH, (et, q, got[(et, q)], exact)

    [gl] = sk.hist_merge_quantiles(pre, [], [0.5], WIDTH).collect()
    [(exact_med,)] = duck.execute(
        "SELECT quantile_disc(value, 0.5) FROM events"
    ).fetchall()
    assert abs(gl["est"] - exact_med) <= WIDTH


def test_hist_sketch_excludes_nulls(spark):
    df = spark.createDataFrame(
        [(1, None), (1, 2.0), (1, 4.0), (2, None)], ["g", "v"]
    )
    rows = sk.hist_group_sketches(df, ["g"], "v", 1.0).collect()
    by_g = {r["g"]: r["hist"] for r in rows}
    assert sum(by_g[1].values()) == 2
    assert 2 not in by_g  # all-NULL group vanishes, like SQL aggregates


# -- mergeable frequent-items (top-k) sketches ------------------------------


def test_freq_sketch_exact_regime_equals_exact_topk(spark, tables):
    """capacity ≥ per-group cardinality ⇒ rest_max = 0 everywhere and the
    merged top-k IS the exact top-k (the degradation-to-exact contract)."""
    pre = sk.freq_group_sketches(tables["events"], ["event_type"], "user_id", capacity=10_000)
    assert pre.agg(F.max("rest_max")).collect()[0][0] == 0
    got = sk.freq_merge_topk(pre, [], k=5).orderBy("rank").collect()
    exact = (
        tables["events"]
        .groupBy(F.col("user_id").cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "key")
        .limit(5)
        .collect()
    )
    assert [(r["key"], r["est"]) for r in got] == [(r["key"], r["cnt"]) for r in exact]
    assert all(r["max_err"] == 0 for r in got)


def test_freq_sketch_bound_holds_under_truncation(spark, tables):
    """With a tight capacity, every reported estimate satisfies
    est ≤ true ≤ est + max_err against exact ground truth."""
    pre = sk.freq_group_sketches(tables["events"], ["event_type"], "user_id", capacity=8)
    got = sk.freq_merge_topk(pre, [], k=10).collect()
    truth = {
        r["key"]: r["cnt"]
        for r in tables["events"]
        .groupBy(F.col("user_id").cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert len(got) == 10
    for r in got:
        true = truth[r["key"]]
        assert r["est"] <= true <= r["est"] + r["max_err"], (r, true)


def test_freq_sketch_slice_merge(spark, tables):
    """Merging per-(event_type, day) sketches to event_type keeps the bound
    per slice; exact regime per slice when capacity is generous."""
    ev = tables["events"].withColumn("day", F.to_date("ts"))
    pre = sk.freq_group_sketches(ev, ["event_type", "day"], "user_id", capacity=4)
    out = sk.freq_merge_topk(pre, ["event_type"], k=3)
    rows = out.collect()
    assert {r["event_type"] for r in rows} == {
        r["event_type"] for r in tables["events"].select("event_type").distinct().collect()
    }
    truth = {
        (r["event_type"], str(r["user_id"])): r["cnt"]
        for r in tables["events"].groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in rows:
        true = truth[(r["event_type"], r["key"])]
        assert r["est"] <= true <= r["est"] + r["max_err"], (r, true)


def test_hist_quantile_rollup_within_width(spark, tables, duck):
    """Day->month rollup quantiles from re-merged bucket counts stay within
    one bucket width of exact at every level."""
    out = {
        (r["level"], r["bucket_start"], r["q"]): r["est"]
        for r in sk.hist_quantile_rollup(
            tables["events"], "ts", ["day", "month"], "value", WIDTH, [0.5]
        ).collect()
    }
    exact = duck.execute(
        """SELECT 'day' AS level, CAST(date_trunc('day', ts) AS TIMESTAMP) AS b,
                  quantile_disc(value, 0.5) AS m FROM events GROUP BY 2
           UNION ALL
           SELECT 'month', CAST(date_trunc('month', ts) AS TIMESTAMP),
                  quantile_disc(value, 0.5) FROM events GROUP BY 2"""
    ).fetchall()
    assert len(out) == len(exact)
    for level, b, m in exact:
        assert abs(out[(level, b, 0.5)] - m) <= WIDTH, (level, b)


def test_streaming_windowed_quantiles_parity(spark, tables, duck, tmp_path):
    """Streaming == batch for windowed quantile state: drain events through
    a real update-mode streaming aggregation of (window, bucket) counts,
    take each key's LAST emission, finalize to quantiles — must stay
    within one bucket width of DuckDB's exact per-window medians."""
    from bullet_spark_spark.operators.sketch import (
        hist_counts_to_quantiles,
        streaming_windowed_hist,
    )
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.sinks import MemorySink

    stream = file_drip(spark, tables["events"], str(tmp_path), chunks=4)
    # file_drip scatters rows across chunks with total event-time disorder,
    # so the watermark must cover the whole span or real rows get evicted
    counts = streaming_windowed_hist(
        stream, "ts", "1 day", "value", WIDTH, watermark_delay="90 days"
    )
    sink = MemorySink()
    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final = {}
    for batch in sink.batches:
        for w, bucket, cnt in batch:
            final[(w, bucket)] = cnt  # update mode: last emission wins
    drained = spark.createDataFrame(
        [(w, b, c) for (w, b), c in final.items()],
        "window_start timestamp, bucket long, cnt long",
    )
    got = {
        r["window_start"]: r["est"]
        for r in hist_counts_to_quantiles(drained, [0.5], WIDTH).collect()
    }
    # same rank convention as the estimator: the value at rank ceil(q*n)
    exact = duck.execute(
        """SELECT w, min(value) FROM (
             SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w, value,
                    row_number() OVER (PARTITION BY date_trunc('day', ts) ORDER BY value) AS rn,
                    count(*) OVER (PARTITION BY date_trunc('day', ts)) AS n
             FROM events)
           WHERE rn >= ceil(0.5 * n) GROUP BY w"""
    ).fetchall()
    assert len(got) == len(exact)
    for w, m in exact:
        assert abs(got[w] - m) <= WIDTH / 2 + 1e-9, (w, got[w], m)
