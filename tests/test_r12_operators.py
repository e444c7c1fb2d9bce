"""Round-11-late additions (r12 queue): payload-carrying deterministic
streaming sample → bounded-state streaming quantiles.

The capability gap this closes: the monitor panel (EWMA, CUSUM,
Space-Saving, KMV, bottom-k sample) had no QUANTILE monitor. Rather than
a merge-order-sensitive sketch (GK/KLL — correct but not
oracle-checkable, their state depends on batch slicing), the quantile
estimate rides the existing deterministic bottom-k sample: carry one
payload value per sampled key through the state, and the percentiles of
the drained k-sample are a bounded-state quantile estimate that ANY
engine reproduces bit-for-bit (the sampled key set is the md5 bottom-k;
the payload per key is min(payload-string) — both semilattices, so drip
≡ one-shot exactly and DuckDB can replay the whole thing).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _drain(spark, tmp_path, src, build, name, chunks=6):
    from bullet_spark_spark.sources.streaming import file_drip

    stream = file_drip(spark, src, str(tmp_path / "in"), chunks=chunks)
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


@pytest.mark.parametrize("n_shards", [1, 4])
def test_sample_monitor_payload_drip_equals_batch(spark, tmp_path, n_shards):
    """Drained payloads == batch min(payload-string) per sampled key, for
    any batch slicing — including keys that arrive MULTIPLE times with
    different payloads (the min-payload semilattice resolves them
    deterministically, unlike first/last-write which is order-dependent)."""
    from bullet_spark_spark.streaming.monitor import merged_sample, sample_monitor

    rows = [(f"user{i}", f"v{j}_{i}") for i in range(60) for j in range(3)]
    src = spark.createDataFrame(rows, "key string, val string")
    stream_out = _drain(
        spark,
        tmp_path,
        src,
        lambda s: sample_monitor(
            s, "key", k=16, n_shards=n_shards, payload_col="val"
        ),
        f"payload_mon_s{n_shards}",
    )
    got = merged_sample(stream_out, k=16).collect()
    # batch truth: bottom-16 keys by md5(key || ':0'), min payload string
    by_key = {}
    for kk, v in rows:
        by_key[kk] = min(v, by_key.get(kk, v))
    want = sorted(
        (hashlib.md5(f"{kk}:0".encode()).hexdigest(), kk) for kk in by_key
    )[:16]
    assert [(r["priority"], r["key"]) for r in got] == want
    assert all(r["payload"] == by_key[r["key"]] for r in got)
    assert all(int(r["n_seen"]) == len(rows) for r in got)


def test_sample_monitor_payload_double_roundtrip_exact(spark, tmp_path):
    """Doubles survive the state's string round-trip EXACTLY (Spark's
    double→string is the shortest round-trippable representation), so
    quantiles computed from drained payloads equal quantiles computed
    from the batch sample's native doubles — the parity the DuckDB
    oracle of streaming_quantile_drain relies on."""
    from bullet_spark_spark.operators.sampling import sample_hash
    from bullet_spark_spark.streaming.monitor import merged_sample, sample_monitor

    rows = [(f"e{i}", (i * 7919 % 997) / 7.0 + 0.001 * i) for i in range(300)]
    src = spark.createDataFrame(rows, "key string, value double")
    out = _drain(
        spark,
        tmp_path,
        src,
        lambda s: sample_monitor(s, "key", k=64, payload_col="value"),
        "payload_quant",
    )
    merged = merged_sample(out, k=64)
    got = merged.select(
        F.percentile(F.col("payload").cast("double"), 0.5).alias("p50"),
        F.percentile(F.col("payload").cast("double"), 0.9).alias("p90"),
        F.count("*").alias("n"),
    ).first()
    want = (
        src.orderBy(sample_hash(F.col("key")).asc(), F.col("key").asc())
        .limit(64)
        .select(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.9).alias("p90"),
        )
        .first()
    )
    assert int(got["n"]) == 64
    assert got["p50"] == want["p50"]  # bit-exact, not approx
    assert got["p90"] == want["p90"]


def test_sample_monitor_no_payload_schema_back_compat(spark, tmp_path):
    """Without payload_col the output carries a null payload column and
    the state stays [priority, key] PAIRS (no state bloat for existing
    checkpoints/tests)."""
    from bullet_spark_spark.streaming.monitor import merged_sample, sample_monitor

    rows = [(f"k{i}",) for i in range(40)]
    src = spark.createDataFrame(rows, "key string")
    out = _drain(
        spark,
        tmp_path,
        src,
        lambda s: sample_monitor(s, "key", k=8, n_shards=2),
        "nopayload_mon",
        chunks=3,
    )
    merged = merged_sample(out, k=8).collect()
    assert len(merged) == 8
    assert all(r["payload"] is None for r in merged)


def test_sample_monitor_null_payload_rows_counted_not_sampled(spark, tmp_path):
    """Null payloads: the row still counts toward n_seen, but the key
    only takes a sample slot once a non-null payload arrives (quantiles
    over nulls are meaningless; dropping them matches SQL aggregate
    semantics)."""
    from bullet_spark_spark.streaming.monitor import merged_sample, sample_monitor

    rows = [(f"k{i}", float(i) if i % 2 == 0 else None) for i in range(30)]
    src = spark.createDataFrame(rows, "key string, value double")
    out = _drain(
        spark,
        tmp_path,
        src,
        lambda s: sample_monitor(s, "key", k=50, payload_col="value"),
        "nullpayload_mon",
        chunks=2,
    )
    merged = merged_sample(out, k=50).collect()
    assert {r["key"] for r in merged} == {f"k{i}" for i in range(0, 30, 2)}
    assert all(r["payload"] is not None for r in merged)
    assert all(int(r["n_seen"]) == 30 for r in merged)


# ---------------------------------------------------------------------------
# fixed-round label propagation (community detection)
# ---------------------------------------------------------------------------

def test_lpa_separates_planted_cliques(spark):
    """Two 4-cliques joined by one bridge edge: 3 synchronous rounds with
    min-label ties assign each clique one label and do not merge them
    across the bridge."""
    from bullet_spark_spark.operators import graph as gr

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(
        c1 + c2 + [(3, 10)], "src long, dst long"
    )
    got = {
        r["node"]: r["label"]
        for r in gr.label_propagation(edges, rounds=3).collect()
    }
    labels1 = {got[n] for n in range(4)}
    labels2 = {got[n] for n in range(10, 14)}
    assert len(labels1) == 1 and len(labels2) == 1
    assert labels1 != labels2


def test_lpa_min_label_tie_break_deterministic(spark):
    """A path a-b-c: b's neighbors {a, c} tie at count 1 each round —
    the min label must win, every run (the determinism that buys the
    full oracle)."""
    from bullet_spark_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    for _ in range(2):
        got = {
            r["node"]: r["label"]
            for r in gr.label_propagation(edges, rounds=1).collect()
        }
        # round 1: node 2 sees {1, 3} -> tie -> 1; nodes 1 and 3 see {2}
        assert got == {1: 2, 2: 1, 3: 2}


def test_lpa_matches_unrolled_duckdb(spark):
    """Engine differential on a random-ish deterministic graph: the Spark
    loop and the unrolled-CTE oracle agree row-for-row at rounds=3."""
    import duckdb

    from bullet_spark_spark.operators import graph as gr

    rows = [((i * 7) % 23, (i * 11 + 3) % 23) for i in range(60)]
    rows = [(a, b) for a, b in rows if a != b]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(
        (r["node"], r["label"])
        for r in gr.label_propagation(edges, rounds=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES %s) AS t(src, dst)"
        % ", ".join(f"({a}, {b})" for a, b in rows)
    )
    sql = gr.oracle_lpa_sql(
        "edges AS (SELECT src, dst FROM e)",
        rounds=3,
        select="SELECT node, label FROM l3 ORDER BY node",
    )
    want = sorted((int(a), int(b)) for a, b in con.execute(sql).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# WebDataset tar shards
# ---------------------------------------------------------------------------

def test_tar_compose_readable_by_stdlib_tarfile(spark):
    """Spark-composed shards are REAL tar: Python's stdlib tarfile reads
    back every member name and payload byte-for-byte (checksums and all
    — tarfile raises on a bad header checksum)."""
    import io
    import tarfile

    from bullet_spark_spark.operators import webdataset as wds

    rows = [(i, f"payload {i} " + "x" * (i * 7 % 600)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    members = df.select(
        F.lit(0).alias("g"),
        wds.tar_member_col(
            F.concat(F.col("doc_id").cast("string"), F.lit(".txt")),
            F.col("text"),
        ).alias("member"),
    )
    blob = bytes(wds.pack_tar(members, "g").first()["tar_file"])
    got = {}
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        for m in tf.getmembers():
            got[m.name] = tf.extractfile(m).read().decode()
    assert got == {f"{i}.txt": t for i, t in rows}


def test_parse_tar_reads_stdlib_tarfile_output(spark):
    """The reverse differential: an archive built by stdlib tarfile
    (different mtimes, uid/gid, trailing padding) parses back exactly —
    the parser honors the FORMAT, not just its own composer."""
    import io
    import tarfile

    from bullet_spark_spark.operators import webdataset as wds

    buf = io.BytesIO()
    want = {f"k{i}.bin": bytes([i]) * (i * 13 % 700 + 1) for i in range(8)}
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in want.items():
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 1700000000 + len(data)
            tf.addfile(info, io.BytesIO(data))
    df = spark.createDataFrame([(buf.getvalue(),)], "tar_file binary")
    rows = wds.parse_tar(df, "tar_file").collect()
    assert all(r["tar_error"] is None for r in rows)
    assert {r["tar_name"]: bytes(r["payload"]) for r in rows} == want


def test_parse_tar_checksum_mismatch_dead_letters(spark):
    """A corrupted header byte surfaces as a tar_error row, not a crash
    or a silent wrong payload."""
    import io
    import tarfile

    from bullet_spark_spark.operators import webdataset as wds

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name="a.txt")
        info.size = 5
        tf.addfile(info, io.BytesIO(b"hello"))
    blob = bytearray(buf.getvalue())
    blob[0] ^= 0xFF  # corrupt the first name byte -> checksum mismatch
    df = spark.createDataFrame([(bytes(blob),)], "tar_file binary")
    rows = wds.parse_tar(df, "tar_file").collect()
    assert len(rows) == 1
    assert rows[0]["tar_error"] is not None
    assert "checksum" in rows[0]["tar_error"]


def test_wds_samples_groups_modalities(spark):
    """{key}.txt + {key}.json members regroup into one row per key with
    one payload column per extension."""
    from bullet_spark_spark.operators import webdataset as wds

    df = spark.createDataFrame(
        [(i, f"text {i}", '{"lang": "en"}') for i in range(5)],
        "doc_id long, text string, meta string",
    )
    members = df.select(
        (F.col("doc_id") % 2).alias("g"),
        wds.tar_member_col(
            F.concat(F.col("doc_id").cast("string"), F.lit(".txt")),
            F.col("text"),
        ).alias("member"),
    ).unionByName(
        df.select(
            (F.col("doc_id") % 2).alias("g"),
            wds.tar_member_col(
                F.concat(F.col("doc_id").cast("string"), F.lit(".json")),
                F.col("meta"),
            ).alias("member"),
        )
    )
    shards = wds.pack_tar(members, "g")
    parsed = wds.parse_tar(shards, "tar_file")
    samples = wds.wds_samples(parsed, ["txt", "json"]).collect()
    assert len(samples) == 5
    for r in samples:
        assert bytes(r["txt_payload"]).decode() == f"text {r['key']}"
        assert bytes(r["json_payload"]).decode() == '{"lang": "en"}'


# ---------------------------------------------------------------------------
# distributed exact bucketing (ntile parity without the one-task sort)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_rows,n_buckets", [(1000, 64), (37, 64), (9973, 32)])
def test_assign_buckets_exact_matches_ntile(spark, n_rows, n_buckets):
    """The distributed global-rank path is bit-identical to true NTILE
    over the same tie-broken order — including N < n (every row its own
    bucket) and the uneven-fill remainder rule."""
    from pyspark.sql.window import Window as W

    from bullet_spark_spark.operators import layout as lay

    rows = [((i * 48271) % 2147483647, i) for i in range(n_rows)]
    df = spark.createDataFrame(rows, "k long, tb long")
    got = lay.assign_buckets_exact(df, ["k", "tb"], n_buckets).select(
        "k", "tb", "bucket"
    )
    want = df.withColumn(
        "bucket", F.ntile(n_buckets).over(W.orderBy("k", "tb"))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_assign_buckets_exact_repeated_calls_stay_consistent(spark):
    """Two bucketings of the same source in one plan (the
    zorder-vs-linear read-amp report shape) do not disturb each other —
    the regression the shared persist slot caused: releasing the first
    materialization re-samples range boundaries and corrupts offsets."""
    from pyspark.sql.window import Window as W

    from bullet_spark_spark.operators import layout as lay

    rows = [((i * 37) % 1009, (i * 101) % 997, i) for i in range(3000)]
    df = spark.createDataFrame(rows, "a long, b long, tb long")
    za = lay.assign_buckets_exact(df, ["a", "tb"], 16, out_col="ba")
    zb = lay.assign_buckets_exact(df, ["b", "tb"], 16, out_col="bb")
    # consume interleaved: build both, then collect both
    got_a = {(r["tb"]): r["ba"] for r in za.collect()}
    got_b = {(r["tb"]): r["bb"] for r in zb.collect()}
    want_a = {
        r["tb"]: r["ba"]
        for r in df.withColumn(
            "ba", F.ntile(16).over(W.orderBy("a", "tb"))
        ).collect()
    }
    want_b = {
        r["tb"]: r["bb"]
        for r in df.withColumn(
            "bb", F.ntile(16).over(W.orderBy("b", "tb"))
        ).collect()
    }
    assert got_a == want_a
    assert got_b == want_b


def test_tar_member_name_over_100_bytes_raises(spark):
    """A >100-char member name must fail loudly — rpad would truncate it
    into a DIFFERENT valid-checksum member name (silent key corruption)."""
    from bullet_spark_spark.operators import webdataset as wds

    df = spark.createDataFrame([("k" * 101, "x")], "name string, text string")
    bad = df.select(
        wds.tar_member_col(F.col("name"), F.col("text")).alias("m")
    )
    with pytest.raises(Exception, match="100 bytes"):
        bad.collect()


def test_parse_tar_blob_property_vs_stdlib(spark):
    """Property differential on the PURE parser (no Spark per example):
    archives composed by stdlib tarfile from adversarial payloads —
    empty members, 'ustar' magic INSIDE payloads, header-boundary sizes
    (511/512/513), NULs and high bytes — parse back name- and
    byte-exact."""
    import io
    import tarfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bullet_spark_spark.operators.webdataset import _parse_tar_blob

    payload = st.one_of(
        st.binary(min_size=0, max_size=40),
        st.sampled_from(
            [
                b"",
                b"ustar\x0000",                 # magic bytes inside a payload
                b"\x00" * 512,                  # a zero block as DATA
                b"x" * 511, b"x" * 512, b"x" * 513,
                b"WARC/1.0\r\n\r\n",
            ]
        ),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(payload, min_size=1, max_size=6))
    def check(payloads):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for i, data in enumerate(payloads):
                info = tarfile.TarInfo(name=f"m{i}.bin")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        got = _parse_tar_blob(buf.getvalue())
        assert [(n, p, e) for n, p, e in got] == [
            (f"m{i}.bin", data, None) for i, data in enumerate(payloads)
        ]

    check()


# ---------------------------------------------------------------------------
# join size estimation
# ---------------------------------------------------------------------------

def test_join_size_estimate_laws(spark):
    """exact == brute-force join count; every bucketed estimate >= exact
    (collisions only add cross terms); higher resolution is no worse;
    and with buckets >> keys the estimate IS exact."""
    from bullet_spark_spark.operators import relational as rel

    lrows = [(f"u{i % 17}",) for i in range(300)]
    rrows = [(f"u{i % 13}",) for i in range(200)]
    left = spark.createDataFrame(lrows, "k string")
    right = spark.createDataFrame(rrows, "k string")
    got = rel.join_size_estimate(
        left, right, "k", bucket_counts=(4, 64, 4096)
    ).first()
    brute = left.join(right, "k").count()
    assert got["exact_size"] == brute
    assert got["est_4"] >= got["est_64"] >= got["est_4096"] >= brute
    assert got["est_4096"] == brute  # 4096 buckets, 17 keys: no collisions
    assert got["n_left"] == 300 and got["n_right"] == 200


# ---------------------------------------------------------------------------
# r11 optimization round: the broadcast-gate FALLBACK branches (the
# shuffle path a >2M-node/edge graph takes) must produce bit-identical
# results to the broadcast path the fixtures exercise by default.
# ---------------------------------------------------------------------------

def test_lpa_shuffle_path_matches_broadcast_path(spark):
    from bullet_spark_spark.operators import graph as gr

    rows = [((i * 7) % 23, (i * 11 + 3) % 23) for i in range(60)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in rows if a != b], "src long, dst long"
    )
    bc = sorted(
        (r["node"], r["label"])
        for r in gr.label_propagation(edges, rounds=3).collect()
    )
    sh = sorted(
        (r["node"], r["label"])
        for r in gr.label_propagation(
            edges, rounds=3, broadcast_nodes_below=0
        ).collect()
    )
    assert bc == sh


def test_kcore_shuffle_path_matches_broadcast_path(spark):
    from bullet_spark_spark.operators import graph as gr

    rows = [((i * 5) % 19, (i * 13 + 2) % 19) for i in range(70)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in rows if a != b], "src long, dst long"
    )
    bc = sorted(
        (r["node"], r["core_degree"])
        for r in gr.kcore(edges, k=3).collect()
    )
    sh = sorted(
        (r["node"], r["core_degree"])
        for r in gr.kcore(edges, k=3, broadcast_edges_below=0).collect()
    )
    assert bc == sh
