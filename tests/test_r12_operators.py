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
