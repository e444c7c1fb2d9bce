"""streaming_fuzzy_ingest: drip ≡ greedy-batch parity for the fuzzy-dedup
intake (the record-linkage analogue of the minhash/span ingest parity
contracts)."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from bullet_spark_spark.operators import dedup as dd


def _ordered_drip(spark, chunks, data_dir):
    """One parquet file per chunk, strictly increasing mtimes →
    FileStreamSource (maxFilesPerTrigger=1) replays chunks in order."""
    os.makedirs(data_dir, exist_ok=True)
    t0 = time.time() - 10 * len(chunks)
    for i, chunk in enumerate(chunks):
        path = os.path.join(data_dir, f"chunk_{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([r[0] for r in chunk], pa.int64()),
                    "k": pa.array([r[1] for r in chunk], pa.string()),
                }
            ),
            path,
        )
        os.utime(path, (t0 + 10 * i, t0 + 10 * i))
    return (
        spark.readStream.schema("id long, k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(data_dir)
    )


def _greedy_reference(rows, max_dist=2, key_width=24):
    """First-occurrence-wins sequential dedup over padded keys — the
    semantics the streaming intake implements (id order = arrival order)."""
    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = min(
                    dp[j] + 1,
                    dp[j - 1] + 1,
                    prev + (a[i - 1] != b[j - 1]),
                )
                prev, dp[j] = dp[j], cur
        return dp[n]

    kept = []
    for rid, key in sorted(rows):
        pk = key[:key_width].ljust(key_width)
        if all(lev(pk, kk) > max_dist for _, kk in kept):
            kept.append((rid, pk))
    return {rid for rid, _ in kept}


DOCS = [
    (0, "the quick brown fox jumps over"),
    (1, "the quick brawn fox jumps over"),   # 1 sub of 0 -> dropped
    (2, "a completely different sentence"),
    (3, "entirely unrelated text content"),
    (4, "the quick green wolf jumps over"),  # ≥3 edits inside the key -> kept
    (5, "a completely different sentence"),  # exact dup of 2 via store
    (6, "entirely unrelatid text contint"),  # 2 subs of 3 -> dropped
    (7, "brand new never seen before text"),
]


def test_streaming_fuzzy_drip_equals_greedy_batch(spark, tmp_path):
    chunks = [DOCS[0:3], DOCS[3:5], DOCS[5:8]]
    stream = _ordered_drip(spark, chunks, str(tmp_path / "in"))
    q = dd.streaming_fuzzy_ingest(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        id_col="id",
        key_col="k",
        max_dist=2,
        key_width=24,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(180)

    streamed = {
        r["id"]
        for r in spark.read.option("basePath", str(tmp_path / "out"))
        .parquet(str(tmp_path / "out"))
        .collect()
    }
    assert streamed == _greedy_reference(DOCS)
    # the planted semantics, explicitly:
    assert 0 in streamed and 1 not in streamed      # within-batch near-dup
    assert 5 not in streamed                        # exact dup via the store
    assert 6 not in streamed                        # near-dup via the store
    assert {2, 3, 4, 7} <= streamed                 # distinct/kept


def test_streaming_fuzzy_store_holds_survivor_keys(spark, tmp_path):
    chunks = [DOCS[0:4], DOCS[4:8]]
    stream = _ordered_drip(spark, chunks, str(tmp_path / "in"))
    q = dd.streaming_fuzzy_ingest(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        id_col="id",
        key_col="k",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(180)
    store = spark.read.option(
        "basePath", str(tmp_path / "state" / "fuzzy_keys")
    ).parquet(str(tmp_path / "state" / "fuzzy_keys"))
    ids = {r["id"] for r in store.collect()}
    assert ids == _greedy_reference(DOCS)
    # keys stored padded to the canonical width
    assert all(len(r["__k"]) == 24 for r in store.collect())


def test_streaming_fuzzy_checkpoint_resume(spark, tmp_path):
    """Drain the first files, STOP, drop more files, restart with the SAME
    checkpoint: the store carries accepted history across restarts, the
    resumed query dedups new arrivals against it, and nothing replays."""
    d = str(tmp_path / "in")
    chunks1 = [DOCS[0:3]]
    _ordered_drip(spark, chunks1, d)

    def run():
        stream = (
            spark.readStream.schema("id long, k string")
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        q = dd.streaming_fuzzy_ingest(
            stream,
            str(tmp_path / "state"),
            str(tmp_path / "out"),
            id_col="id",
            key_col="k",
            checkpoint_dir=str(tmp_path / "ck"),
        )
        q.awaitTermination(180)

    run()  # first drain: docs 0-2
    out1 = {
        r["id"]
        for r in spark.read.option("basePath", str(tmp_path / "out"))
        .parquet(str(tmp_path / "out"))
        .collect()
    }
    assert out1 == {0, 2}  # 1 is a within-batch near-dup of 0

    # second wave lands AFTER the first drain finished
    import os
    import time

    path = os.path.join(d, "chunk_late.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array([r[0] for r in DOCS[3:8]], pa.int64()),
                "k": pa.array([r[1] for r in DOCS[3:8]], pa.string()),
            }
        ),
        path,
    )
    os.utime(path, (time.time(), time.time()))

    run()  # resume from the same checkpoint
    out2 = {
        r["id"]
        for r in spark.read.option("basePath", str(tmp_path / "out"))
        .parquet(str(tmp_path / "out"))
        .collect()
    }
    assert out2 == _greedy_reference(DOCS)  # 5 (store dup) and 6 dropped
    assert 5 not in out2 and 6 not in out2


def test_greedy_pair_drops_chain_semantics(spark):
    """X<Y<Z with close(X,Y), close(Y,Z), NOT close(X,Z): greedy keeps
    {X, Z} — Y's deletion un-condemns Z. Pairwise dropping would delete
    both Y and Z (the reviewed over-deletion bug)."""
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    drops = {r["id"] for r in dd._greedy_pair_drops(pairs).collect()}
    assert drops == {1}


def test_greedy_pair_drops_pre_dropped_cannot_condemn(spark):
    """If X is pre-dropped (history), it must not condemn Y; Y kept then
    condemns Z."""
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    pre = spark.createDataFrame([(0,)], "id long")
    drops = {r["id"] for r in dd._greedy_pair_drops(pairs, pre_dropped=pre).collect()}
    assert drops == {0, 2}  # 0 pre-dropped, 1 kept, 2 condemned by 1


def test_greedy_pair_drops_canonicalizes_unordered_pairs(spark):
    """r9 advisory: a caller passing symmetric/unordered pairs must get
    the canonical greedy drop set, not mutual condemnation. (0,1) given
    BOTH ways plus a reversed (2,1) and a self-pair (3,3) must resolve
    identically to the canonical [(0,1),(1,2)] chain: drop {1} only."""
    pairs = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 1), (3, 3)], "id_a long, id_b long"
    )
    drops = {r["id"] for r in dd._greedy_pair_drops(pairs).collect()}
    assert drops == {1}


def test_greedy_pair_drops_four_chain(spark):
    # 0-1-2-3 path: greedy keeps {0, 2}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "id_a long, id_b long"
    )
    drops = {r["id"] for r in dd._greedy_pair_drops(pairs).collect()}
    assert drops == {1, 3}


def test_streaming_fuzzy_within_batch_chain(spark, tmp_path):
    """A transitive chain INSIDE one micro-batch: X~Y, Y~Z, X!~Z — greedy
    keeps X and Z (the naive pairwise rule would also drop Z)."""
    x = "aaaaaaaabbbbbbbbcccccccc"
    y = "aaaaaaaabbbbbbbbccccccZZ"   # 2 subs from x (last segment)
    z = "aaaaaaaabbbbbbZZccccccZZ"   # 2 subs from y, 4 subs from x
    chain = [(0, x), (1, y), (2, z)]
    stream = _ordered_drip(spark, [chain], str(tmp_path / "in"))
    q = dd.streaming_fuzzy_ingest(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        id_col="id",
        key_col="k",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(180)
    kept = {
        r["id"]
        for r in spark.read.option("basePath", str(tmp_path / "out"))
        .parquet(str(tmp_path / "out"))
        .collect()
    }
    assert kept == _greedy_reference(chain) == {0, 2}


def test_streaming_fuzzy_history_condemned_cannot_condemn(spark, tmp_path):
    """H (batch 1) ~ X (batch 2) ~ Y (batch 2), H !~ Y: X drops via the
    store, so X must NOT condemn Y — greedy keeps {H, Y}."""
    h = "aaaaaaaabbbbbbbbcccccccc"
    x = "aaaaaaaabbbbbbbbccccccZZ"   # 2 subs from h
    y = "aaaaaaaabbbbbbZZccccccZZ"   # 2 subs from x, 4 from h
    stream = _ordered_drip(
        spark, [[(0, h)], [(1, x), (2, y)]], str(tmp_path / "in")
    )
    q = dd.streaming_fuzzy_ingest(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        id_col="id",
        key_col="k",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(180)
    kept = {
        r["id"]
        for r in spark.read.option("basePath", str(tmp_path / "out"))
        .parquet(str(tmp_path / "out"))
        .collect()
    }
    assert kept == _greedy_reference([(0, h), (1, x), (2, y)]) == {0, 2}


def test_streaming_fuzzy_store_compaction_plateaus(spark, tmp_path):
    """r9 verdict task 5: the fuzzy KEY store stays a BOUNDED partition
    set across many epochs — the minhash store's compaction discipline
    applied to fuzzy keys. 18 single-row epochs with compact_every=4
    must fold closed epochs into the consolidated epoch=-1 partition
    (never one dir per micro-batch), and dedup against COMPACTED history
    must still hold: a late 1-edit variant of the first-epoch doc drops
    even after that epoch's partition was folded away."""
    import hashlib

    def _key(i):  # 24-char keys, pairwise distant
        return hashlib.md5(f"doc{i}".encode()).hexdigest()[:24]

    rows = [(i, _key(i)) for i in range(17)]
    late_dup = (17, _key(0)[:-1] + "Z")  # 1 sub of doc 0 (epoch 0)
    chunks = [[r] for r in rows] + [[late_dup]]  # 18 epochs, 1 row each
    stream = _ordered_drip(spark, chunks, str(tmp_path / "in"))
    q = dd.streaming_fuzzy_ingest(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        id_col="id",
        key_col="k",
        checkpoint_dir=str(tmp_path / "ck"),
        compact_every=4,
    )
    q.awaitTermination(300)

    kept = {
        r["id"]
        for r in spark.read.option("basePath", str(tmp_path / "out"))
        .parquet(str(tmp_path / "out"))
        .collect()
    }
    assert kept == _greedy_reference(rows + [late_dup]) == set(range(17))

    key_store = str(tmp_path / "state" / "fuzzy_keys")
    # store content survives compaction byte-for-byte: exactly the
    # survivors' keys
    keys = spark.read.option("basePath", key_store).parquet(key_store)
    assert {r["id"] for r in keys.collect()} == set(range(17))
    # and the partition count PLATEAUS: ≤ compact_every open epochs +
    # consolidated epoch=-1 + the in-flight epoch — NOT 18 dirs
    epoch_dirs = [d for d in os.listdir(key_store) if d.startswith("epoch=")]
    assert len(epoch_dirs) <= 4 + 2, epoch_dirs
    assert "epoch=-1" in epoch_dirs
