"""Round-10 additions: b-bit minhash, A/B power panel, interval-overlap
join, k-core decomposition, streaming deterministic sample."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import dedup as dd
from bullet_spark_spark.operators import distribution as dist
from bullet_spark_spark.operators import graph as gr
from bullet_spark_spark.operators import temporal as tmp


# ---------------------------------------------------------------------------
# b-bit minhash
# ---------------------------------------------------------------------------

def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base + " tonight"),            # near-dup of 0
        (2, "completely different words about spark catalyst optimizer plans"),
        (3, base.replace("quick", "slow")),  # near-dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bbit_minhash_finds_planted_neardups(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in dd.bbit_minhash_pairs_md5(
            _docs(spark), "doc_id", "text", threshold=0.3
        ).collect()
    }
    assert (0, 1) in pairs and (0, 3) in pairs
    # bias-corrected estimate sits near the true Jaccard for the near-dups
    for p in ((0, 1), (0, 3)):
        assert float(pairs[p]["est_jaccard_bbit"]) >= 0.3
    # the unrelated doc never pairs with anything
    assert not any(2 in p for p in pairs)


def test_bbit_estimator_is_bias_corrected(spark):
    # identical docs: every b-bit component matches -> C = 1 -> est = 1
    rows = [(0, "same text here twice over"), (1, "same text here twice over")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dd.bbit_minhash_pairs_md5(df, "doc_id", "text", threshold=0.5).collect()
    assert len(out) == 1
    assert int(out[0]["c_match"]) == 32
    assert float(out[0]["est_jaccard_bbit"]) == 1.0


def test_bbit_requires_b4(spark):
    with pytest.raises(ValueError, match="b must be 4"):
        dd.bbit_minhash_pairs_md5(_docs(spark), "doc_id", "text", b=2)


def test_bbit_matches_duckdb_last_nibble(spark):
    """The engine's b-bit component (substring(md5, 32, 1)) equals
    DuckDB's substr(md5, 32, 1) byte-for-byte."""
    import duckdb

    got = spark.sql(
        "SELECT substring(md5('0:the quick brown'), 32, 1) AS c"
    ).first()["c"]
    want = duckdb.sql(
        "SELECT substr(md5('0:the quick brown'), 32, 1) AS c"
    ).fetchone()[0]
    assert got == want


# ---------------------------------------------------------------------------
# A/B power panel
# ---------------------------------------------------------------------------

def test_ab_power_panel_math(spark):
    rows = [("a", float(v)) for v in (10, 12, 11, 13, 9, 11)] + [
        ("b", float(v)) for v in (10, 10, 11, 9, 10, 10)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = dist.ab_power_panel(df, "v", "g", "a", "b").collect()[0]
    va = 2.0  # sample variance of a
    vb = 0.4
    se = math.sqrt(va / 6 + vb / 6)
    assert r["n_a"] == r["n_b"] == 6
    assert r["effect"] == pytest.approx(11.0 - 10.0, abs=1e-6)
    assert r["se"] == pytest.approx(se, abs=1e-5)
    assert r["mde_abs"] == pytest.approx((1.959964 + 0.841621) * se, abs=1e-5)
    assert r["mde_rel"] == pytest.approx(r["mde_abs"] / 10.0, abs=1e-5)
    # observed effect 1.0 < mde ~1.77 -> underpowered
    assert r["powered"] is False


def test_ab_power_detects_powered_effect(spark):
    rows = [("a", 100.0 + (i % 3) * 0.1) for i in range(200)] + [
        ("b", 90.0 + (i % 3) * 0.1) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = dist.ab_power_panel(df, "v", "g", "a", "b").collect()[0]
    assert r["powered"] is True
    assert abs(r["effect"] - 10.0) < 1e-6


def test_ab_power_degenerate_groups_null(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")
    r = dist.ab_power_panel(df, "v", "g", "a", "b").collect()[0]
    assert r["mde_abs"] is None and r["powered"] is None


# ---------------------------------------------------------------------------
# interval-overlap join
# ---------------------------------------------------------------------------

def _brute_overlap(ls, rs):
    return {
        (l[0], r[0])
        for l in ls
        for r in rs
        if l[1] < r[2] and r[1] < l[2]
    }


def test_interval_overlap_matches_brute_force(spark):
    ls = [(i, float(i * 3), float(i * 3 + 5)) for i in range(40)]
    rs = [(j, float(j * 7 + 1), float(j * 7 + 4)) for j in range(25)]
    l = spark.createDataFrame(ls, "lid long, llo double, lhi double")
    r = spark.createDataFrame(rs, "rid long, rlo double, rhi double")
    for width in (1.0, 3.0, 10.0):
        got = {
            (x["lid"], x["rid"])
            for x in tmp.interval_overlap_join(
                l, r, "llo", "lhi", "rlo", "rhi", bucket_width=width
            ).collect()
        }
        assert got == _brute_overlap(ls, rs), f"width={width}"
    # broadcast path agrees too
    got_b = {
        (x["lid"], x["rid"])
        for x in tmp.interval_overlap_join(
            l, r, "llo", "lhi", "rlo", "rhi", bucket_width=1.0,
            broadcast_right=True,
        ).collect()
    }
    assert got_b == _brute_overlap(ls, rs)


def test_interval_overlap_no_duplicate_pairs(spark):
    # one long interval overlapping one other across MANY shared buckets
    l = spark.createDataFrame([(1, 0.0, 100.0)], "lid long, llo double, lhi double")
    r = spark.createDataFrame([(2, 50.0, 60.0)], "rid long, rlo double, rhi double")
    out = tmp.interval_overlap_join(
        l, r, "llo", "lhi", "rlo", "rhi", bucket_width=5.0
    ).collect()
    assert len(out) == 1  # first-shared-bucket rule, no post-join distinct


def test_interval_overlap_auto_width_matches_brute_force(spark):
    """r11: bucket_width=None derives the median interval length
    in-engine; pairs are width-independent, so auto == brute force."""
    ls = [(i, float(i * 3), float(i * 3 + 5)) for i in range(40)]
    rs = [(j, float(j * 7 + 1), float(j * 7 + 4)) for j in range(25)]
    l = spark.createDataFrame(ls, "lid long, llo double, lhi double")
    r = spark.createDataFrame(rs, "rid long, rlo double, rhi double")
    got = {
        (x["lid"], x["rid"])
        for x in tmp.interval_overlap_join(
            l, r, "llo", "lhi", "rlo", "rhi"
        ).collect()
    }
    assert got == _brute_overlap(ls, rs)


def test_interval_overlap_long_tail_split_pins_explode(spark):
    """r11 explode cap: ONE year-long outage among second-scale sessions
    must not multiply rows — the long interval routes through the
    broadcast theta path, and the bucket-side explode stays ~2 rows per
    short interval. Result still equals brute force."""
    # 300 one-second sessions + one ~year-long (3e7 s) outage on the left
    ls = [(i, float(i * 10), float(i * 10 + 1)) for i in range(300)]
    ls.append((999, 0.0, 3.0e7))
    rs = [(j, float(j * 13), float(j * 13 + 2)) for j in range(200)]
    l = spark.createDataFrame(ls, "lid long, llo double, lhi double")
    r = spark.createDataFrame(rs, "rid long, rlo double, rhi double")
    out = tmp.interval_overlap_join(
        l, r, "llo", "lhi", "rlo", "rhi", bucket_width=1.0,
        max_buckets_per_row=64,
    )
    got = {(x["lid"], x["rid"]) for x in out.collect()}
    assert got == _brute_overlap(ls, rs)
    # pin the explode factor: only intervals <= cap*w enter the bucket
    # path, so its total explode is bounded by ~2 rows per short session —
    # the year-long row (3e7 buckets at w=1) never reaches a generate node
    exploded_rows = (
        l.filter((F.col("lhi") - F.col("llo")) <= 64 * 1.0)
        .withColumn(
            "__n",
            F.floor(F.col("lhi") / F.lit(1.0)) - F.floor(F.col("llo") / F.lit(1.0)) + 1,
        )
        .agg(F.sum("__n"))
        .first()[0]
    )
    assert exploded_rows <= 300 * 2  # short sessions only, ~2 buckets each
    # same fixture, same answer at a different cap (split boundary moves)
    got2 = {
        (x["lid"], x["rid"])
        for x in tmp.interval_overlap_join(
            l, r, "llo", "lhi", "rlo", "rhi", bucket_width=1.0,
            max_buckets_per_row=1000,
        ).collect()
    }
    assert got2 == got


def test_interval_overlap_half_open_and_degenerate(spark):
    l = spark.createDataFrame(
        [(1, 0.0, 5.0), (2, 7.0, 7.0)], "lid long, llo double, lhi double"
    )
    r = spark.createDataFrame([(9, 5.0, 8.0)], "rid long, rlo double, rhi double")
    out = tmp.interval_overlap_join(
        l, r, "llo", "lhi", "rlo", "rhi", bucket_width=2.0
    ).collect()
    # [0,5) does not overlap [5,8) (half-open); the degenerate [7,7) matches nothing
    assert out == []


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------

def test_kcore_peels_tendrils(spark):
    # a 4-clique (3-core) with a pendant chain hanging off it
    clique = ["c0", "c1", "c2", "c3"]
    edges = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
    edges += [("c0", "p1"), ("p1", "p2"), ("p2", "p3")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["core_degree"] for r in gr.kcore(df, k=3).collect()}
    assert set(got) == set(clique)
    assert all(d == 3 for d in got.values())
    # k=1 keeps everything; k=4 empties (no 4-core exists)
    assert len(gr.kcore(df, k=1).collect()) == 7
    assert gr.kcore(df, k=4).collect() == []


def test_kcore_self_verifying_law(spark):
    # random-ish deterministic graph: every returned node must hold >= k
    # neighbors WITHIN the returned set (the defining invariant)
    edges = [
        (f"n{i}", f"n{(i * 7 + j) % 30}") for i in range(30) for j in (1, 2, 3)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    k = 3
    core = {r["node"] for r in gr.kcore(df, k=k).collect()}
    adj: dict[str, set] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    for n in core:
        assert len(adj[n] & core) >= k, n
    # maximality: greedy re-peel of the complement finds nothing addable
    outside = set(adj) - core
    assert all(len(adj[n] & core) < k or len(adj[n] & (core | {n})) < k
               or n in core for n in outside)


def test_kcore_cascade_requires_iterations(spark):
    # chain into a triangle: peeling the chain end cascades node by node —
    # a single-pass degree filter would wrongly keep chain interiors
    edges = [("t0", "t1"), ("t1", "t2"), ("t2", "t0"),
             ("t0", "a"), ("a", "b"), ("b", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"] for r in gr.kcore(df, k=2).collect()}
    assert got == {"t0", "t1", "t2"}


# ---------------------------------------------------------------------------
# streaming deterministic sample
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_shards", [1, 4])
def test_sample_monitor_drip_equals_batch(spark, tmp_path, n_shards):
    """Fully drained streaming sample == batch sample_exact_n (the
    semilattice property), regardless of batch slicing — at S=1 (the
    single-group plan) AND S>1 (r11 sharded global mode + k-truncating
    merged_sample drain; exactness is the same semilattice law)."""
    from bullet_spark_spark.operators.sampling import sample_hash
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.monitor import merged_sample, sample_monitor

    rows = [(f"user{i}",) for i in range(200)]
    src = spark.createDataFrame(rows, "key string")
    want = [
        r["key"]
        for r in src.orderBy(sample_hash(F.col("key")).asc(), F.col("key").asc())
        .limit(16)
        .collect()
    ]
    stream = file_drip(spark, src, str(tmp_path / "in"), chunks=8)
    out = sample_monitor(stream, "key", k=16, n_shards=n_shards)
    name = f"sample_mon_s{n_shards}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    merged = merged_sample(spark.table(name), k=16).collect()
    assert [r["key"] for r in merged] == sorted(
        want,
        key=lambda kk: __import__("hashlib").md5(f"{kk}:0".encode()).hexdigest(),
    )
    assert set(r["key"] for r in merged) == set(want)
    assert all(int(r["n_seen"]) == 200 for r in merged)


def test_sample_monitor_state_is_bounded(spark, tmp_path):
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.monitor import merged_sample, sample_monitor

    rows = [(f"k{i}",) for i in range(500)]
    src = spark.createDataFrame(rows, "key string")
    stream = file_drip(spark, src, str(tmp_path / "in"), chunks=4)
    out = sample_monitor(stream, "key", k=8)  # default sharded global mode
    q = (
        out.writeStream.format("memory")
        .queryName("sample_bounded")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # every snapshot (one per shard per batch-with-rows) holds <= k pairs
    per_snap = spark.sql(
        "SELECT group, n_seen, count(*) AS c FROM sample_bounded "
        "GROUP BY group, n_seen"
    ).collect()
    assert per_snap and all(int(r["c"]) <= 8 for r in per_snap)
    # shards partition the stream: latest per-shard counts sum to the total
    merged = merged_sample(spark.table("sample_bounded"), k=8).collect()
    assert len(merged) == 8 and all(int(r["n_seen"]) == 500 for r in merged)


# ---------------------------------------------------------------------------
# Kruskal-Wallis
# ---------------------------------------------------------------------------

def _kw_replica(groups):
    """Sequential tie-corrected H over {g: [values]}."""
    pooled = sorted(v for vs in groups.values() for v in vs)
    n = len(pooled)
    # average rank per value (1-based)
    from collections import Counter

    cnt = Counter(pooled)
    ranks, start = {}, 1
    for v in sorted(cnt):
        t = cnt[v]
        ranks[v] = start + (t - 1) / 2.0
        start += t
    s = sum(
        (sum(ranks[v] for v in vs) ** 2) / len(vs) for vs in groups.values()
    )
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    ties = sum(t**3 - t for t in cnt.values())
    c = 1 - ties / (n**3 - n)
    return h, c, h / c


def test_kruskal_wallis_matches_replica(spark):
    groups = {
        "a": [1.0, 2.0, 3.0, 4.0, 2.0],
        "b": [2.0, 4.0, 6.0, 8.0, 10.0],
        "c": [5.0, 5.0, 7.0, 9.0, 11.0, 13.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = dist.kruskal_wallis(df, "v", "g", crit_95=5.991465).collect()[0]
    h, c, hc = _kw_replica(groups)
    assert r["n_total"] == 16 and r["n_groups"] == 3
    assert r["h_stat"] == pytest.approx(h, abs=1e-5)
    assert r["tie_correction"] == pytest.approx(c, abs=1e-6)
    assert r["h_corrected"] == pytest.approx(hc, abs=1e-5)
    assert r["reject_95"] == (hc > 5.991465)


def test_kruskal_wallis_identical_groups_h_near_zero(spark):
    rows = [(g, float(v)) for g in ("a", "b", "c") for v in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = dist.kruskal_wallis(df, "v", "g").collect()[0]
    assert abs(r["h_stat"]) < 1e-6  # identical distributions -> H ~ 0


# ---------------------------------------------------------------------------
# largest-remainder apportionment
# ---------------------------------------------------------------------------

def test_apportion_sums_exactly_and_orders_remainders(spark):
    from bullet_spark_spark.operators import sampling as smp

    rows = [("a", 10.0), ("b", 25.0), ("c", 33.0), ("d", 32.0)]
    df = spark.createDataFrame(rows, "g string, w double")
    got = {r["g"]: r for r in smp.apportion_largest_remainder(
        df, ["g"], "w", 10).collect()}
    # quotas: 1.0, 2.5, 3.3, 3.2 -> floors 1,2,3,3 = 9; leftover 1 seat
    # goes to the largest remainder (b, .5)
    assert {g: r["alloc_n"] for g, r in got.items()} == {
        "a": 1, "b": 3, "c": 3, "d": 3
    }
    assert sum(r["alloc_n"] for r in got.values()) == 10


def test_apportion_tiebreak_and_zero_weights(spark):
    from bullet_spark_spark.operators import sampling as smp

    rows = [("x", 1.0), ("y", 1.0), ("z", 0.0), ("w", -2.0)]
    df = spark.createDataFrame(rows, "g string, w double")
    got = {r["g"]: r["alloc_n"] for r in smp.apportion_largest_remainder(
        df, ["g"], "w", 3).collect()}
    # zero/negative weights excluded; quotas 1.5/1.5 tie -> group-key order
    assert got == {"x": 2, "y": 1}
    import pytest as _pt

    with _pt.raises(ValueError):
        smp.apportion_largest_remainder(df, ["g"], "w", -1)


# ---------------------------------------------------------------------------
# per-group exact quantiles
# ---------------------------------------------------------------------------

def test_group_quantiles_match_numpy_linear(spark):
    import numpy as np

    data = {
        "a": [1.0, 3.0, 2.0, 8.0, 5.0, 13.0, 21.0],
        "b": [10.0, 20.0, 30.0, 40.0],
        "c": [7.0],
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    probs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = {
        (r["g"], r["prob"]): r["value"]
        for r in dist.group_quantiles(df, ["g"], "v", probs).collect()
    }
    for g, vs in data.items():
        for p in probs:
            want = float(np.quantile(vs, p, method="linear"))
            assert got[(g, p)] == pytest.approx(want, abs=1e-6), (g, p)


def test_group_quantiles_nulls_drop(spark):
    rows = [("a", 1.0), ("a", None), ("a", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["prob"]: r["value"]
           for r in dist.group_quantiles(df, ["g"], "v", [0.5]).collect()}
    assert got[0.5] == 2.0


# ---------------------------------------------------------------------------
# linear-interpolation resampling
# ---------------------------------------------------------------------------

def test_resample_interpolate_linear_gaps(spark):
    rows = [
        ("k", "2024-01-01 00:00:00", 10.0),
        ("k", "2024-01-01 00:03:00", 40.0),   # 2 missing minutes between
        ("k", "2024-01-01 00:04:00", 0.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.to_timestamp("ts").alias("ts"), "v"
    )
    got = {
        r["bucket_ts"].minute: (r["value"], r["is_interp"])
        for r in tmp.resample_interpolate(df, "k", "ts", "v", 60).collect()
    }
    assert got[0] == (10.0, False)
    assert got[1] == (20.0, True)   # 10 + (40-10)*1/3
    assert got[2] == (30.0, True)
    assert got[3] == (40.0, False)
    assert got[4] == (0.0, False)


def test_resample_interpolate_null_observation_interpolated_over(spark):
    rows = [
        ("k", "2024-01-01 00:00:00", 0.0),
        ("k", "2024-01-01 00:01:00", None),  # real row, null gauge read
        ("k", "2024-01-01 00:02:00", 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.to_timestamp("ts").alias("ts"), "v"
    )
    got = {
        r["bucket_ts"].minute: (r["value"], r["is_interp"])
        for r in tmp.resample_interpolate(df, "k", "ts", "v", 60).collect()
    }
    assert got[1] == (4.0, True)  # interpolated, not held at 0
