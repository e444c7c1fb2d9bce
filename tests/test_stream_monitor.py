"""Streaming EWMA anomaly monitor (streaming/monitor.py): state math vs a
sequential replica (in the stream's own processed order), cross-batch state
carry-over, warmup suppression, and anomaly detection on a planted spike."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.sources.streaming import file_drip
from bullet_spark_spark.streaming.monitor import ewma_anomalies


def _drain(spark, src_df, tmp_path, chunks, **kw):
    stream = file_drip(spark, src_df, str(tmp_path / "in"), chunks=chunks)
    out = ewma_anomalies(stream, ["k"], "ts", "v", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_mon")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql("SELECT * FROM ewma_mon").collect()


def _replica(rows, alpha):
    """Sequential West-1979 fold in the given order → list of
    (ewma_before, z) per row."""
    n, m, v = 0, 0.0, 0.0
    out = []
    for x in rows:
        if n == 0:
            out.append((x, 0.0))
        else:
            sd = math.sqrt(v) if v > 0 else 0.0
            out.append((m, (x - m) / sd if sd > 0 else 0.0))
        d = x - m if n > 0 else 0.0
        if n == 0:
            m = x
        else:
            m = m + alpha * d
            v = (1 - alpha) * (v + alpha * d * d)
        n += 1
    return out


def test_ewma_state_math_matches_replica(spark, tmp_path):
    vals = [10.0, 11.0, 9.5, 10.2, 10.8, 9.9, 10.1, 30.0, 10.3, 10.0]
    src = spark.createDataFrame(
        [("a", f"2024-01-01 00:{i:02d}:00", v) for i, v in enumerate(vals)],
        "k string, ts string, v double",
    ).select("k", F.to_timestamp("ts").alias("ts"), "v")
    got = sorted(_drain(spark, src, tmp_path, chunks=1, alpha=0.2, warmup=3),
                 key=lambda r: r["ts"])
    # replica folds in ts order == the single-batch processed order
    want = _replica(vals, 0.2)
    assert len(got) == len(vals)
    for g, (m, z) in zip(got, want):
        assert g["ewma"] == pytest.approx(m, abs=1e-12)
        assert g["z"] == pytest.approx(z, abs=1e-9)
    # the planted spike (30.0, index 7, past warmup) flags; nothing else does
    flags = [g["is_anomaly"] for g in got]
    assert flags[7] is True
    assert sum(flags) == 1


def test_ewma_state_carries_across_batches(spark, tmp_path):
    """Multi-batch drain: whatever order the batches arrive in, the row
    count is complete, per-key state is continuous (every post-warmup row
    judged against non-trivial history — z values populated), and a
    constant series never flags."""
    src = spark.createDataFrame(
        [("c", f"2024-01-01 00:{i:02d}:00", 5.0) for i in range(40)],
        "k string, ts string, v double",
    ).select("k", F.to_timestamp("ts").alias("ts"), "v")
    got = _drain(spark, src, tmp_path, chunks=4, alpha=0.3, warmup=5)
    assert len(got) == 40
    assert all(r["is_anomaly"] is False for r in got)  # constant: never anomalous
    assert all(r["ewma"] == 5.0 for r in got)  # state carried: mean never resets


def test_ewma_keys_are_independent(spark, tmp_path):
    rows = [("a", f"2024-01-01 00:{i:02d}:00", 1.0) for i in range(12)]
    rows += [("b", f"2024-01-01 00:{i:02d}:00", 100.0) for i in range(12)]
    src = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.to_timestamp("ts").alias("ts"), "v"
    )
    got = _drain(spark, src, tmp_path, chunks=2, alpha=0.5, warmup=2)
    by_key = {}
    for r in got:
        by_key.setdefault(r["k"], []).append(r)
    assert {k: len(v) for k, v in by_key.items()} == {"a": 12, "b": 12}
    assert all(r["ewma"] == 1.0 for r in by_key["a"])
    assert all(r["ewma"] == 100.0 for r in by_key["b"])
