"""Stream-stream join + streaming dedup (streaming/joins.py): drained
parity with the batch equivalents, watermark wiring, state-bounding
contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from bullet_spark_spark.sources.streaming import file_drip
from bullet_spark_spark.streaming.joins import dedup_stream, stream_stream_join


def _drain(out, name, ck):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.select(
        *[
            F.to_timestamp(c).alias(c) if c == "ts" or c == "rts" else F.col(c)
            for c in df.columns
        ]
    )


def test_stream_stream_join_drain_equals_batch(spark, tmp_path):
    clicks = [
        (u, f"2024-01-01 00:{m:02d}:00", f"c{u}{m}")
        for u in (1, 2, 3)
        for m in (0, 10, 20, 30)
    ]
    buys = [
        (u, f"2024-01-01 00:{m:02d}:30", f"b{u}{m}")
        for u in (1, 2)
        for m in (0, 10, 40)
    ]
    l = _ts(spark, clicks, "uid long, ts string, click_id string")
    r = _ts(
        spark, buys, "uid long, rts string, buy_id string"
    ).withColumnRenamed("rts", "ts2").select(
        "uid", F.col("ts2").alias("rts"), "buy_id"
    )
    ls = file_drip(spark, l, str(tmp_path / "l"), chunks=3)
    rs = file_drip(spark, r, str(tmp_path / "r"), chunks=2)
    # watermark must cover the fixture's cross-batch DISORDER (file_drip
    # chunks arrive in arbitrary order over a 40-min span) — with the
    # default 2·lag a later batch's older rows are correctly evicted as
    # late, which is watermark semantics, not a join bug
    out = stream_stream_join(
        ls, rs, ["uid"], "ts", "rts", max_lag_sec=60, watermark_sec=3600
    )
    _drain(out, "ssj", str(tmp_path / "ck"))
    got = {
        (x["click_id"], x["buy_id"])
        for x in spark.sql("SELECT click_id, buy_id FROM ssj").collect()
    }
    want = {
        (c[2], b[2])
        for c in clicks
        for b in buys
        if c[0] == b[0]
        and abs(
            (int(c[1][14:16]) * 60) - (int(b[1][14:16]) * 60 + 30)
        ) <= 60
    }
    assert got == want and got  # non-empty parity


def test_stream_stream_join_requires_range_for_state_bound(spark, tmp_path):
    # the compiled plan must carry the watermark: assert eventTime columns
    l = _ts(spark, [(1, "2024-01-01 00:00:00", "c")],
            "uid long, ts string, click_id string")
    ls = file_drip(spark, l, str(tmp_path / "l2"), chunks=1)
    rs = file_drip(
        spark,
        l.select("uid", F.col("ts").alias("rts"), F.col("click_id").alias("b")),
        str(tmp_path / "r2"),
        chunks=1,
    )
    out = stream_stream_join(ls, rs, ["uid"], "ts", "rts", max_lag_sec=30)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
    assert plan.count("EventTimeWatermark") == 2  # both sides watermarked


def test_dedup_stream_drain_equals_batch_distinct(spark, tmp_path):
    rows = [(i % 7, f"2024-01-01 00:00:{i % 50:02d}", i) for i in range(100)]
    df = _ts(spark, rows, "k long, ts string, seq long")
    stream = file_drip(spark, df, str(tmp_path / "in"), chunks=4)
    out = dedup_stream(stream, ["k"])
    _drain(out, "dedup_drain", str(tmp_path / "ck"))
    got = spark.sql("SELECT k FROM dedup_drain").collect()
    assert sorted(r["k"] for r in got) == list(range(7))  # one row per key


def test_dedup_stream_watermark_variant_bounds_state(spark, tmp_path):
    rows = [(i % 5, f"2024-01-01 00:{i // 5:02d}:00", i) for i in range(50)]
    df = _ts(spark, rows, "k long, ts string, seq long")
    stream = file_drip(spark, df, str(tmp_path / "in"), chunks=2)
    out = dedup_stream(stream, ["k"], ts_col="ts", watermark_sec=3600)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
    _drain(out, "dedup_wm", str(tmp_path / "ck"))
    got = spark.sql("SELECT k, count(*) c FROM dedup_wm GROUP BY k").collect()
    # horizon covers the whole fixture: exactly one survivor per key
    assert sorted(r["k"] for r in got) == list(range(5))
    assert all(r["c"] == 1 for r in got)
