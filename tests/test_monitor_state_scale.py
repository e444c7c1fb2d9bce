"""Bounded-state proof for the streaming monitors under RocksDB (VERDICT
r9 task 5): the Space-Saving heavy-hitter and bottom-k KMV distinct
monitors hold STATE whose size PLATEAUS across epochs even as the stream's
distinct-key vocabulary keeps growing — the property that makes them safe
on an open-vocabulary 100 TB stream where naive per-key counting grows
without bound.

Methodology: a long drip (24 single-file micro-batches, ~20 fresh keys
each) through the monitor with the RocksDB state-store provider +
changelog checkpointing (the production posture, P12), then the Spark 4
state-store READER time-travels the checkpoint to batch N and batch 2N and
measures the LIVE state directly — row count and serialized value bytes.
The fuzzy-store compaction-plateau test (test_streaming_fuzzy.py) pins the
same discipline for the parquet-backed fuzzy key store; this pins it for
the applyInPandasWithState stores."""

from __future__ import annotations

import json
import os

from bullet_spark_spark.session import ROCKSDB_PROVIDER
from bullet_spark_spark.sources.streaming import file_drip
from bullet_spark_spark.streaming.monitor import (
    distinct_monitor,
    heavy_hitters_monitor,
    merged_sample,
    sample_monitor,
)

_ROCKS_CONFS = {
    "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def _drain_rocksdb(spark, src, tmp_path, build, query_name):
    """Drip ``src`` through ``build(stream)`` one file per micro-batch
    under RocksDB state; return the checkpoint dir + committed batch ids."""
    prior = {}
    for k, v in _ROCKS_CONFS.items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
        spark.conf.set(k, v)
    try:
        stream = file_drip(
            spark, src, str(tmp_path / "in"), chunks=24, max_files_per_trigger=1
        )
        ck = str(tmp_path / "ck")
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    batches = sorted(
        int(f) for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    assert len(batches) >= 20, f"expected a long drip, got {batches}"
    # proof the state went through RocksDB, not a silent HDFSBacked fallback
    changelogs = [
        f
        for root, _, fs in os.walk(os.path.join(ck, "state"))
        for f in fs
        if f.endswith(".changelog") or f.endswith(".zip")
    ]
    assert changelogs, "no RocksDB changelog/snapshot artifacts in checkpoint"
    return ck, batches


def _state_at(spark, ck, batch_id):
    """Live state rows at a committed batch via the state-store reader."""
    return (
        spark.read.format("statestore")
        .option("batchId", batch_id)
        .load(ck)
        .collect()
    )


def test_heavy_hitters_state_plateaus_under_rocksdb(spark, tmp_path):
    """24 epochs x 20 FRESH keys each (480 distinct total): the Space-
    Saving store must hold exactly m counters per shard at epoch N and at
    epoch 2N — byte size within noise, counter count identical — while
    the vocabulary doubles between the two checkpoints."""
    m, n_shards = 8, 2
    rows = [(f"k{i}_{j}",) for i in range(24) for j in range(20)]
    src = spark.createDataFrame(rows, "key string")
    ck, batches = _drain_rocksdb(
        spark,
        src,
        tmp_path,
        lambda s: heavy_hitters_monitor(s, "key", m=m, n_shards=n_shards),
        "hh_plateau",
    )
    mid, last = batches[len(batches) // 2], batches[-1]
    sizes = {}
    for b in (mid, last):
        state = _state_at(spark, ck, b)
        assert len(state) == n_shards  # one state row per shard, forever
        n_counters, n_bytes = 0, 0
        for r in state:
            summary = r["value"]["groupState"]["summary"]
            n_counters += len(json.loads(summary)["k"])
            n_bytes += len(summary)
        sizes[b] = (n_counters, n_bytes)
    # the store size at epoch N == epoch 2N in counters (exactly m per
    # shard — Metwally's invariant), and within 15% in serialized bytes
    # (counts grow a digit, keys don't)
    assert sizes[mid][0] == sizes[last][0] == m * n_shards, sizes
    assert sizes[last][1] <= sizes[mid][1] * 1.15, sizes


def test_distinct_monitor_state_plateaus_under_rocksdb(spark, tmp_path):
    """Same drip for the bottom-k KMV store: state per group is ≤ k
    63-bit hashes at epoch N and epoch 2N (identical k once saturated,
    bytes within noise) while distinct values double; the estimate at
    the final epoch stays inside 5 rse of the 480 truth."""
    k = 64
    rows = [("g", f"v{i}_{j}") for i in range(24) for j in range(20)]
    src = spark.createDataFrame(rows, "key string, val string")
    ck, batches = _drain_rocksdb(
        spark,
        src,
        tmp_path,
        lambda s: distinct_monitor(s, "key", "val", k=k),
        "kmv_plateau",
    )
    mid, last = batches[len(batches) // 2], batches[-1]
    sizes = {}
    for b in (mid, last):
        state = _state_at(spark, ck, b)
        assert len(state) == 1  # one group
        hashes = json.loads(state[0]["value"]["groupState"]["hashes"])
        sizes[b] = (len(hashes), len(state[0]["value"]["groupState"]["hashes"]))
    assert sizes[mid][0] == sizes[last][0] == k, sizes
    assert sizes[last][1] <= sizes[mid][1] * 1.15, sizes
    # estimator sanity at the final state: (k-1)/theta within 5/sqrt(k-2)
    final = spark.sql(
        "SELECT est_distinct FROM kmv_plateau ORDER BY n_seen DESC LIMIT 1"
    ).first()["est_distinct"]
    rse = 1.0 / (k - 2) ** 0.5
    assert abs(final - 480) / 480 <= 5 * rse, final


def test_sample_monitor_state_plateaus_under_rocksdb(spark, tmp_path):
    """Same drip for the bottom-k SAMPLE store (r11 sharded global mode):
    state per shard is EXACTLY <= k (priority, key) pairs at epoch N and
    at epoch 2N — pair count identical once saturated, bytes within
    noise — while the distinct-key vocabulary doubles between the two
    checkpoints. Closes the bounded-state proof over the full monitor
    quartet (EWMA scalars are trivially bounded; Space-Saving, KMV and
    THIS are proven from the live RocksDB store, not the output)."""
    k, n_shards = 8, 2
    rows = [(f"s{i}_{j}",) for i in range(24) for j in range(20)]
    src = spark.createDataFrame(rows, "key string")
    ck, batches = _drain_rocksdb(
        spark,
        src,
        tmp_path,
        lambda s: sample_monitor(s, "key", k=k, n_shards=n_shards),
        "sample_plateau",
    )
    mid, last = batches[len(batches) // 2], batches[-1]
    sizes = {}
    for b in (mid, last):
        state = _state_at(spark, ck, b)
        assert len(state) == n_shards  # one state row per shard, forever
        n_pairs, n_bytes = 0, 0
        for r in state:
            items = json.loads(r["value"]["groupState"]["items"])
            assert len(items) <= k
            # invariant: pairs sorted ascending by (priority, key) — the
            # bottom-k of everything the shard absorbed
            assert items == sorted(items)
            n_pairs += len(items)
            n_bytes += len(r["value"]["groupState"]["items"])
        sizes[b] = (n_pairs, n_bytes)
    assert sizes[mid][0] == sizes[last][0] == k * n_shards, sizes
    assert sizes[last][1] <= sizes[mid][1] * 1.15, sizes
    # drain-merge sanity on the same run: the merged global sample equals
    # the batch bottom-k over all 480 keys (semilattice exactness)
    import hashlib

    want = sorted(
        (hashlib.md5(f"{kk}:0".encode()).hexdigest(), kk)
        for (kk,) in rows
    )[:k]
    got = merged_sample(spark.table("sample_plateau"), k=k).collect()
    assert [(r["priority"], r["key"]) for r in got] == want
    assert all(int(r["n_seen"]) == 480 for r in got)


def test_sample_payload_state_plateaus_under_rocksdb(spark, tmp_path):
    """Payload mode (r11-late): the bottom-k sample carrying a VALUE per
    sampled key still plateaus — state per shard is EXACTLY <= k
    [priority, key, payload] TRIPLES at epoch N and epoch 2N while the
    vocabulary doubles, and every stored triple keeps a non-null payload
    (the quantile estimate never dilutes). Extends the store-level proof
    to the panel's newest member, streaming_quantile_drain's state."""
    k, n_shards = 8, 2
    rows = [(f"s{i}_{j}", float(i * 100 + j)) for i in range(24) for j in range(20)]
    src = spark.createDataFrame(rows, "key string, value double")
    ck, batches = _drain_rocksdb(
        spark,
        src,
        tmp_path,
        lambda s: sample_monitor(
            s, "key", k=k, n_shards=n_shards, payload_col="value"
        ),
        "sample_payload_plateau",
    )
    mid, last = batches[len(batches) // 2], batches[-1]
    sizes = {}
    for b in (mid, last):
        state = _state_at(spark, ck, b)
        assert len(state) == n_shards
        n_triples, n_bytes = 0, 0
        for r in state:
            items = json.loads(r["value"]["groupState"]["items"])
            assert len(items) <= k
            assert items == sorted(items)
            # every kept entry is a triple with a parseable payload
            assert all(len(t) == 3 and t[2] is not None for t in items)
            assert all(float(t[2]) >= 0.0 for t in items)
            n_triples += len(items)
            n_bytes += len(r["value"]["groupState"]["items"])
        sizes[b] = (n_triples, n_bytes)
    assert sizes[mid][0] == sizes[last][0] == k * n_shards, sizes
    assert sizes[last][1] <= sizes[mid][1] * 1.15, sizes
    # drained quantile sanity: merged sample carries the payloads, and
    # the payloads equal the batch truth for the sampled keys
    import hashlib

    by_key = {kk: v for kk, v in rows}
    got = merged_sample(
        spark.table("sample_payload_plateau"), k=k
    ).collect()
    want = sorted(
        (hashlib.md5(f"{kk}:0".encode()).hexdigest(), kk) for kk in by_key
    )[:k]
    assert [(r["priority"], r["key"]) for r in got] == want
    assert all(float(r["payload"]) == by_key[r["key"]] for r in got)


def test_stream_stream_join_state_evicts_under_watermark(spark, tmp_path):
    """Watermark EVICTION proof for the stream-stream interval join, from
    the STORE (the monitor-plateau discipline applied to Spark's own
    stateful operator): an in-order replay with a short watermark keeps
    the join's buffered-row state at "rate x horizon", NOT "all rows so
    far" — the property the operator's docstring claims
    (temporal.stream_stream_interval_join) and streaming_join_drain
    cannot exercise (its max_delay spans the whole fixture). Asserted
    by time-traveling the checkpoint: buffered rows at the last batch
    are no more than at the midpoint (plateau) and a small fraction of
    the rows absorbed by then."""
    import datetime as _dt

    from bullet_spark_spark.operators.temporal import stream_stream_interval_join
    from bullet_spark_spark.sources.streaming import file_drip_ordered

    base = _dt.datetime(2024, 1, 1)
    n = 240
    lrows = [
        (f"u{i % 5}", i, base + _dt.timedelta(minutes=i)) for i in range(n)
    ]
    rrows = [
        (f"u{i % 5}", 10_000 + i, base + _dt.timedelta(minutes=i, seconds=-30))
        for i in range(n)
    ]
    left = spark.createDataFrame(lrows, "k string, lid long, lts timestamp")
    right = spark.createDataFrame(rrows, "k string, rid long, rts timestamp")
    prior = {}
    for kk, v in _ROCKS_CONFS.items():
        try:
            prior[kk] = spark.conf.get(kk)
        except Exception:
            prior[kk] = None
        spark.conf.set(kk, v)
    try:
        ls = file_drip_ordered(
            spark, left, str(tmp_path / "l"), "lts", chunks=24
        )
        rs = file_drip_ordered(
            spark, right, str(tmp_path / "r"), "rts", chunks=24
        )
        out = stream_stream_interval_join(
            ls, rs, ["k"], "lts", "rts",
            max_delay="2 minutes", lookback_sec=60,
        )
        ck = str(tmp_path / "ck")
        q = (
            out.writeStream.format("memory")
            .queryName("ssj_evict")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        for kk, v in prior.items():
            if v is None:
                spark.conf.unset(kk)
            else:
                spark.conf.set(kk, v)
    batches = sorted(
        int(f) for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    assert len(batches) >= 20, batches
    # matches flowed: each right row 30 s before the same-indexed left
    # row shares its key (lag 30 s <= 60 s lookback)
    n_out = spark.table("ssj_evict").count()
    assert n_out > n // 2, n_out

    def _buffered(batch_id, side):
        return (
            spark.read.format("statestore")
            .option("batchId", batch_id)
            .option("joinSide", side)
            .load(ck)
            .count()
        )

    mid, last = batches[len(batches) // 2], batches[-2]
    mid_rows = _buffered(mid, "left") + _buffered(mid, "right")
    last_rows = _buffered(last, "left") + _buffered(last, "right")
    # plateau: late-epoch state is no bigger than mid-epoch state (within
    # one chunk of slack), and far below "every row so far" (~2N rows by
    # the last batch without eviction)
    per_chunk = 2 * n // 24
    assert last_rows <= mid_rows + per_chunk, (mid_rows, last_rows)
    assert last_rows <= 2 * n // 4, (last_rows, 2 * n)
