"""Streaming EWMA anomaly monitor (streaming/monitor.py): state math vs a
sequential replica (in the stream's own processed order), cross-batch state
carry-over, warmup suppression, and anomaly detection on a planted spike."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.sources.streaming import file_drip
from bullet_spark_spark.streaming.monitor import cusum_monitor, ewma_anomalies


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


# ---------------------------------------------------------------------------
# cusum_monitor (r9)
# ---------------------------------------------------------------------------

def _ordered_cusum_drip(spark, rows, data_dir, chunks):
    """ts-contiguous chunks with increasing mtimes -> FileStreamSource
    (maxFilesPerTrigger=1) replays them in ts order; file_drip's
    round-robin repartition scatters rows across chunks, which is wrong
    for an order-sensitive recurrence test."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(data_dir, exist_ok=True)
    per = -(-len(rows) // chunks)
    t0 = time.time() - 10 * chunks
    for c in range(chunks):
        part = rows[c * per : (c + 1) * per]
        if not part:
            continue
        path = os.path.join(data_dir, f"chunk_{c}.parquet")
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([r[0] for r in part], pa.string()),
                    "ts": pa.array([r[1] for r in part]),
                    "v": pa.array([r[2] for r in part], pa.float64()),
                }
            ),
            path,
        )
        os.utime(path, (t0 + 10 * c, t0 + 10 * c))
    return (
        spark.readStream.schema("k string, ts timestamp, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(data_dir)
    )


def _drain_cusum(spark, rows, tmp_path, chunks, name, **kw):
    stream = _ordered_cusum_drip(spark, rows, str(tmp_path / "in"), chunks)
    out = cusum_monitor(stream, ["k"], "ts", "v", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(
        spark.sql(f"SELECT * FROM {name}").collect(), key=lambda r: r["ts"]
    )


def _cusum_replica(vals, mean, std, k=0.5, h=4.0):
    sp = sn = 0.0
    out = []
    for x in vals:
        z = (x - mean) / (std if std > 0 else 1.0)
        sp = max(0.0, sp + z - k)
        sn = max(0.0, sn - z - k)
        out.append((z, sp, sn, sp > h or sn > h))
    return out


def test_cusum_monitor_matches_replica_and_carries_state(spark, tmp_path):
    """Frozen-baseline streaming CUSUM: the drained path must equal the
    sequential recurrence, and splitting the SAME rows across three
    micro-batches must not change a single value (state carry-over)."""
    import datetime

    vals = [10.0, 10.5, 9.5, 10.2, 14.0, 14.5, 15.0, 14.2, 14.8, 15.1]
    rows = [
        ("a", datetime.datetime(2024, 1, 1, 0, i, 0), v)
        for i, v in enumerate(vals)
    ]
    kw = dict(mean=10.0, std=1.0, k_slack=0.5, h_threshold=4.0)
    one = _drain_cusum(spark, rows, tmp_path / "one", 1, "cusum_one", **kw)
    drip = _drain_cusum(spark, rows, tmp_path / "drip", 3, "cusum_drip", **kw)
    ref = _cusum_replica(vals, 10.0, 1.0)
    for got in (one, drip):
        assert len(got) == len(vals)
        for r, (z, sp, sn, alarm) in zip(got, ref):
            assert abs(r["z"] - z) < 1e-12
            assert abs(r["s_pos"] - sp) < 1e-12
            assert abs(r["s_neg"] - sn) < 1e-12
            assert r["alarm"] == alarm
    # the sustained +4-sigma shift alarms; the stable prefix does not
    assert not one[2]["alarm"] and one[-1]["alarm"]


def test_cusum_monitor_per_key_baselines(spark, tmp_path):
    """Per-key frozen baselines: key 'b' has a higher pinned mean, so the
    same values alarm for 'a' but not for 'b'."""
    import datetime

    rows = []
    for i in range(8):
        rows.append(("a", datetime.datetime(2024, 1, 1, 0, i, 0), 20.0))
        rows.append(("b", datetime.datetime(2024, 1, 1, 0, i, 0), 20.0))
    got = _drain_cusum(
        spark, rows, tmp_path, 1, "cusum_keys",
        mean=10.0, std=1.0, k_slack=0.5, h_threshold=4.0,
        baselines={("b",): (20.0, 1.0)},
    )
    a = [r for r in got if r["k"] == "a"]
    b = [r for r in got if r["k"] == "b"]
    assert any(r["alarm"] for r in a)       # 10 sigma above its baseline
    assert all(not r["alarm"] for r in b)   # on-baseline


# ---------------------------------------------------------------------------
# Space-Saving heavy-hitters monitor
# ---------------------------------------------------------------------------

def _drain_hh(spark, src_df, tmp_path, chunks, name, **kw):
    from bullet_spark_spark.streaming.monitor import heavy_hitters_monitor

    stream = file_drip(spark, src_df, str(tmp_path / "in"), chunks=chunks)
    out = heavy_hitters_monitor(stream, "k", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _final_snapshot(rows):
    """Keep each shard's last (max n_seen) summary."""
    latest = {}
    for r in rows:
        if r["shard"] not in latest or r["n_seen"] > latest[r["shard"]]:
            latest[r["shard"]] = r["n_seen"]
    return {
        (r["shard"], r["key"]): (r["est"], r["err"])
        for r in rows
        if r["n_seen"] == latest[r["shard"]]
    }


def test_heavy_hitters_exact_regime_drip_parity(spark, tmp_path):
    # m exceeds the distinct-key count: Space-Saving degenerates to exact
    # counting, so est == true, err == 0, and drip == one-shot
    truth = {f"k{i:02d}": i + 1 for i in range(10)}
    rows = [(k,) for k, c in truth.items() for _ in range(c)]
    src = spark.createDataFrame(rows, "k string")
    drip = _final_snapshot(
        _drain_hh(spark, src, tmp_path / "d", 3, "hh_drip", m=64, n_shards=4)
    )
    once = _final_snapshot(
        _drain_hh(spark, src, tmp_path / "o", 1, "hh_once", m=64, n_shards=4)
    )
    assert drip == once
    got = {k: est for (_, k), (est, err) in drip.items() if err == 0}
    assert got == truth
    assert all(err == 0 for _, err in drip.values())


def test_heavy_hitters_guarantees_under_eviction(spark, tmp_path):
    import random

    rng = random.Random(17)
    truth = {"heavy": 200, "warm": 60}
    for i in range(40):
        truth[f"tail{i:02d}"] = rng.randint(1, 5)
    rows = [(k,) for k, c in truth.items() for _ in range(c)]
    rng.shuffle(rows)
    src = spark.createDataFrame(rows, "k string")
    snap = _final_snapshot(
        _drain_hh(spark, src, tmp_path, 3, "hh_evict", m=8, n_shards=1)
    )
    n = sum(truth.values())
    # bounded state: never more than m counters in the snapshot
    assert 0 < len(snap) <= 8
    for (_, k), (est, err) in snap.items():
        # Metwally guarantees: est >= true >= est - err
        assert est >= truth[k] >= est - err, (k, est, err, truth[k])
    # every key above the n/m frequency floor is guaranteed tracked
    tracked = {k for (_, k) in snap}
    for k, c in truth.items():
        if c > n / 8:
            assert k in tracked, (k, c)
    assert "heavy" in tracked and "warm" in tracked


# ---------------------------------------------------------------------------
# KMV distinct-count monitor
# ---------------------------------------------------------------------------

def _drain_kmv(spark, src_df, tmp_path, chunks, name, **kw):
    from bullet_spark_spark.streaming.monitor import distinct_monitor

    stream = file_drip(spark, src_df, str(tmp_path / "in"), chunks=chunks)
    out = distinct_monitor(stream, "g", "v", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _kmv_final(rows):
    latest = {}
    for r in rows:
        if r["key"] not in latest or r["n_seen"] > latest[r["key"]][0]:
            latest[r["key"]] = (r["n_seen"], r["est_distinct"], r["is_exact"])
    return {k: (e, x) for k, (_, e, x) in latest.items()}


def test_kmv_exact_regime_and_drip_parity(spark, tmp_path):
    rows = [("a", f"v{i % 40}") for i in range(200)]
    rows += [("b", f"w{i % 7}") for i in range(50)]
    src = spark.createDataFrame(rows, "g string, v string")
    drip = _kmv_final(_drain_kmv(spark, src, tmp_path / "d", 3, "kmv_d", k=256))
    once = _kmv_final(_drain_kmv(spark, src, tmp_path / "o", 1, "kmv_o", k=256))
    assert drip == once
    assert drip["a"] == (40.0, True) and drip["b"] == (7.0, True)


def test_kmv_estimate_regime_bounds_and_order_independence(spark, tmp_path):
    import math

    n_distinct, k = 5000, 64
    rows = [("a", f"tok{i}") for i in range(n_distinct)]
    src = spark.createDataFrame(rows, "g string, v string")
    drip = _kmv_final(_drain_kmv(spark, src, tmp_path / "d", 4, "kmv_e", k=k))
    once = _kmv_final(_drain_kmv(spark, src, tmp_path / "o", 1, "kmv_e1", k=k))
    # bottom-k union is a semilattice: drip == one-shot even when evicting
    assert drip == once
    est, is_exact = drip["a"]
    assert is_exact is False
    rse = 1.0 / math.sqrt(k - 2)
    assert abs(est - n_distinct) <= 5 * rse * n_distinct, est
