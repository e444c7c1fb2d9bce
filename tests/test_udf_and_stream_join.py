"""UDF surface (vectorized-only policy) + stream-static enrichment join."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bullet_spark_spark.functions.udf import grouped_agg_udf, grouped_transform, scalar_udf
from bullet_spark_spark.sources.streaming import file_drip
from bullet_spark_spark.streaming.sinks import MemorySink


def test_scalar_pandas_udf(spark, tables):
    @scalar_udf("double")
    def clipped(v: pd.Series) -> pd.Series:
        return v.clip(20, 80)

    rows = tables["events"].limit(50).select(clipped(F.col("value")).alias("c")).collect()
    assert all(20.0 <= r["c"] <= 80.0 for r in rows)


def test_grouped_agg_udf(spark, tables):
    @grouped_agg_udf("double")
    def p90(v: pd.Series) -> float:
        return float(v.quantile(0.9))

    got = {
        r["event_type"]: r["p90"]
        for r in tables["events"].groupBy("event_type").agg(p90(F.col("value")).alias("p90")).collect()
    }
    import numpy as np

    pdf = tables["events"].select("event_type", "value").toPandas()
    for et, grp in pdf.groupby("event_type"):
        assert abs(got[et] - float(grp["value"].quantile(0.9))) < 1e-9


def test_grouped_transform_zscore(spark, tables):
    def zscore(g: pd.DataFrame) -> pd.DataFrame:
        std = g["value"].std(ddof=0) or 1.0
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                "event_type": g["event_type"],
                "z": (g["value"] - g["value"].mean()) / std,
            }
        )

    out = grouped_transform(
        tables["events"], ["event_type"], zscore, "event_id long, event_type string, z double"
    )
    stats = out.groupBy("event_type").agg(
        F.round(F.avg("z"), 6).alias("mu"), F.count(F.lit(1)).alias("n")
    ).collect()
    for r in stats:
        assert abs(r["mu"]) < 1e-6  # per-group zscores center at 0
    assert out.count() == tables["events"].count()


def test_stream_static_enrichment_join(spark, tables, tmp_path):
    """Streaming fact ⋈ static dimension (broadcast): the production
    enrichment shape — no state store involved, dim joined per micro-batch."""
    dim = (
        tables["events"].select("user_id").distinct()
        .withColumn("segment", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )
    stream = file_drip(spark, tables["events"].select("event_id", "user_id", "value"), str(tmp_path), chunks=3)
    enriched = stream.join(F.broadcast(dim), "user_id")
    agg = enriched.groupBy("segment").agg(F.count(F.lit(1)).alias("cnt"))
    sink = MemorySink()
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for batch in sink.batches:
        for seg, cnt in batch:
            final[seg] = cnt
    expected = {
        r["segment"]: r["n"]
        for r in tables["events"]
        .join(dim, "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == expected


def test_stream_stream_interval_join(spark, tables, tmp_path):
    """Watermarked stream-stream interval join (clicks ⇄ purchases per user
    within 10 minutes) reconciles with the equivalent batch join."""
    from bullet_spark_spark.sources.streaming import (
        ensure_event_time,
        stream_stream_interval_join,
    )

    ev = tables["events"].select("event_id", "user_id", "event_type", "ts")
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    buys_b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), "user_id", F.col("ts").alias("buy_ts")
    )
    clicks = file_drip(spark, clicks_b, str(tmp_path / "c"), chunks=3)
    buys = file_drip(spark, buys_b, str(tmp_path / "b"), chunks=3)

    # file_drip chunks are hash-partitioned, NOT time-ordered: with the
    # default 10-minute watermark, rows older than an already-advanced
    # watermark drop nondeterministically depending on which chunk a
    # batch happens to process first (surfaced as a rare full-suite
    # flake). A watermark wider than the fixture's whole time span makes
    # every interleaving lossless; production tunes it to real disorder.
    joined = stream_stream_interval_join(
        clicks, buys, "user_id", "click_ts", "buy_ts",
        max_delay="10 minutes", watermark="40 days",
    ).select("click_id", "buy_id")
    sink = MemorySink()
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    # availableNow terminates on completion; under a loaded host 180 s was
    # not always enough and a silent timeout read a half-filled sink
    assert q.awaitTermination(600), "interval-join stream did not finish"
    got = sorted((r[0], r[1]) for batch in sink.batches for r in batch)

    cb = ensure_event_time(clicks_b, "click_ts")
    bb = ensure_event_time(buys_b, "buy_ts")
    expected = sorted(
        (r["click_id"], r["buy_id"])
        for r in cb.join(bb, "user_id")
        .filter(
            (F.col("buy_ts") >= F.col("click_ts"))
            & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 minutes"))
        )
        .select("click_id", "buy_id")
        .collect()
    )
    assert len(expected) > 0
    assert got == expected
