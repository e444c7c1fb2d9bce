"""Round-11-late operators: BFS k-hop distances, blocked record linkage,
time-ordered drip + streaming session drain, CDC chunk dedup."""

from pyspark.sql import functions as F

from bullet_spark_spark.operators import graph as gr


def _bfs(spark, edge_pairs, sources, max_hops):
    edges = spark.createDataFrame(edge_pairs, "src string, dst string")
    srcs = spark.createDataFrame([(s,) for s in sources], "node string")
    out = gr.bfs_distances(edges, srcs, max_hops=max_hops)
    return {r["node"]: r["dist"] for r in out.collect()}


def test_bfs_path_graph_min_distance(spark):
    # a -> b -> c -> d plus a shortcut a -> c: c settles at dist 1, not 2
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]
    got = _bfs(spark, edges, ["a"], max_hops=3)
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_multi_source_takes_nearest_seed(spark):
    edges = [("a", "b"), ("b", "c"), ("z", "c")]
    got = _bfs(spark, edges, ["a", "z"], max_hops=3)
    # c is 2 hops from a but 1 hop from z
    assert got == {"a": 0, "z": 0, "b": 1, "c": 1}


def test_bfs_early_exit_and_hop_cap(spark):
    # 6-node path, cap at 2 hops: d/e/f unreached
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    got = _bfs(spark, edges, ["a"], max_hops=2)
    assert got == {"a": 0, "b": 1, "c": 2}
    # disconnected seed: frontier empties on hop 1, loop exits early
    got2 = _bfs(spark, edges, ["lonely"], max_hops=10)
    assert got2 == {"lonely": 0}


def test_bfs_source_outside_graph_still_dist0(spark):
    edges = [("a", "b")]
    got = _bfs(spark, edges, ["a", "ghost"], max_hops=1)
    assert got == {"a": 0, "ghost": 0, "b": 1}


def test_bfs_cycle_terminates(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    got = _bfs(spark, edges, ["a"], max_hops=5)
    assert got == {"a": 0, "b": 1, "c": 2}


def test_bfs_matches_recursive_oracle(spark, duck):
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(40)]
    edges = sorted({(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)})
    edges = [(s, d) for s, d in edges if s != d]
    vals = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    sql = gr.oracle_bfs_sql(
        f"edges(src, dst) AS (VALUES {vals})",
        "srcs(node) AS (VALUES ('n0'), ('n1'))",
        max_hops=4,
        select="SELECT node, dist FROM dists ORDER BY node",
    )
    want = dict(duck.execute(sql).fetchall())
    got = _bfs(spark, edges, ["n0", "n1"], max_hops=4)
    assert got == want


from bullet_spark_spark.operators import relational as rel


def _linkage_rows(spark, recs, **kw):
    df = spark.createDataFrame(recs, "rid long, txt string, grp string, ln long")
    out = rel.record_linkage(
        df, id_col="rid", text_col="txt", block_cols=["grp"],
        length_col="ln", **kw,
    )
    return {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}


def test_linkage_finds_planted_near_dup(spark):
    recs = [
        (1, "alpha beta gamma delta epsilon", "en", 30),
        (2, "alpha beta gamma delta epsilom", "en", 30),   # 1 sub
        (3, "totally different text here", "en", 27),
        (4, "alpha beta gamma delta epsilon", "fr", 30),   # other block
    ]
    got = _linkage_rows(spark, recs, prefix_len=48, block_width=6,
                        max_dist=3, length_band=5)
    assert got == {(1, 2): 1}


def test_linkage_second_window_catches_early_edit(spark):
    # an edit INSIDE the first 6-char window breaks pass-1 blocking;
    # the disjoint second window still pairs them
    recs = [
        (1, "abcdefghijklmnop", "en", 16),
        (2, "Xbcdefghijklmnop", "en", 16),
    ]
    got = _linkage_rows(spark, recs, prefix_len=48, block_width=6,
                        max_dist=2, length_band=4)
    assert got == {(1, 2): 1}


def test_linkage_length_band_blocks_pair(spark):
    recs = [
        (1, "abcdefghijkl", "en", 10),
        (2, "abcdefghijkl", "en", 500),  # same text, wild length metadata
    ]
    got = _linkage_rows(spark, recs, prefix_len=48, block_width=6,
                        max_dist=2, length_band=4)
    assert got == {}


def test_linkage_max_block_drops_hot_block(spark):
    # 12 identical records in one block; cap 5 drops the whole block
    recs = [(i, "same same same", "en", 14) for i in range(12)]
    recs.append((100, "zq unique text", "en", 14))
    got = _linkage_rows(spark, recs, prefix_len=48, block_width=6,
                        max_dist=2, length_band=4, max_block=5)
    assert got == {}
    got2 = _linkage_rows(spark, recs, prefix_len=48, block_width=6,
                         max_dist=2, length_band=4)
    assert len(got2) == 12 * 11 // 2


def test_linkage_bounded_levenshtein_matches_plain(spark, duck):
    recs = [
        (i, t, "en", len(t))
        for i, t in enumerate(
            ["the quick brown fox", "the quick brown fix", "the quick brwn fox",
             "a quick brown fox", "the quack brown fax", "unrelated string xyz"]
        )
    ]
    got = _linkage_rows(spark, recs, prefix_len=48, block_width=6,
                        max_dist=4, length_band=10)
    import itertools
    want = {}
    norm = {i: t.lower()[:48] for i, t, _, _ in recs}
    for a, b in itertools.combinations(sorted(norm), 2):
        na, nb = norm[a], norm[b]
        blocked = na[:6] == nb[:6] or na[6:12] == nb[6:12]
        if not blocked or abs(len(recs[a][1]) - len(recs[b][1])) > 10:
            continue
        d = duck.execute("SELECT levenshtein(?, ?)", [na, nb]).fetchone()[0]
        if d <= 4:
            want[(a, b)] = d
    assert got == want


def test_file_drip_ordered_chunks_are_time_ordered(spark, tmp_path):
    import os
    from datetime import datetime, timedelta

    import duckdb as _duck

    from bullet_spark_spark.sources.streaming import file_drip_ordered

    t0 = datetime(2024, 1, 1)
    rows = [(i, t0 + timedelta(minutes=7 * i)) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    file_drip_ordered(spark, df, str(tmp_path), "ts", chunks=4)
    data = os.path.join(str(tmp_path), "data")
    files = sorted(os.listdir(data))
    assert files == [f"chunk_{i:04d}.parquet" for i in range(4)]
    mtimes = [os.path.getmtime(os.path.join(data, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 4
    con = _duck.connect()
    prev_max = None
    for f in files:
        lo, hi = con.execute(
            f"SELECT min(ts), max(ts) FROM '{data}/{f}'"
        ).fetchone()
        if prev_max is not None:
            assert lo >= prev_max  # chunk k+1 never precedes chunk k
        prev_max = hi


def test_streaming_session_drain_matches_batch(spark, tmp_path):
    from datetime import datetime, timedelta

    from bullet_spark_spark.sources.streaming import file_drip_ordered

    t0 = datetime(2024, 1, 1)
    rows = []
    # user 1: two sessions (gap 45 min), user 2: one long merged session
    for m in (0, 10, 20, 65, 70):
        rows.append((1, t0 + timedelta(minutes=m)))
    for m in (0, 25, 50, 75):
        rows.append((2, t0 + timedelta(minutes=m)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    from pyspark.sql import functions as F2

    sent = [
        spark.createDataFrame(
            [(-1, t0 + timedelta(days=d))], "user_id long, ts timestamp"
        )
        for d in (100, 200)
    ]
    stream = file_drip_ordered(
        spark, df, str(tmp_path), "ts", chunks=3, extra_chunks=tuple(sent)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy("user_id", F2.session_window("ts", "30 minutes").alias("w"))
        .agg(F2.count(F2.lit(1)).alias("cnt"), F2.min("ts").alias("start"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("__sess_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["start"]): r["cnt"]
        for r in spark.sql(
            "SELECT user_id, start, cnt FROM __sess_t WHERE user_id >= 0"
        ).collect()
    }
    batch = (
        df.groupBy("user_id", F2.session_window("ts", "30 minutes").alias("w"))
        .agg(F2.count(F2.lit(1)).alias("cnt"), F2.min("ts").alias("start"))
    )
    want = {(r["user_id"], r["start"]): r["cnt"] for r in batch.collect()}
    assert got == want
    assert got[(1, t0)] == 3 and got[(1, t0 + timedelta(minutes=65))] == 2
    assert got[(2, t0)] == 4


from bullet_spark_spark.operators.dedup import (
    _GEAR,
    _cdc_cuts,
    _cdc_mask,
    cdc_chunks,
)


def test_cdc_vectorized_hash_matches_sequential_reference():
    import numpy as np

    raw = bytes(np.random.RandomState(11).randint(0, 256, 700, dtype=np.uint8))
    g = np.array(_GEAR, dtype=np.uint64)[np.frombuffer(raw, dtype=np.uint8)]
    h = g.copy()
    old = np.seterr(over="ignore")
    try:
        for k in range(1, 64):
            h[k:] += g[:-k] << np.uint64(k)
    finally:
        np.seterr(**old)
    hs, seq = 0, []
    for b in raw:
        hs = ((hs << 1) + _GEAR[b]) & 0xFFFFFFFFFFFFFFFF
        seq.append(hs)
    assert (h == np.array(seq, dtype=np.uint64)).all()


def test_cdc_cuts_enforce_min_and_force_max():
    # candidate too close to previous cut is skipped; no candidate in a
    # max_size span forces a cut at start + max_size - 1
    cuts = _cdc_cuts(1000, [5, 30, 33, 700], min_size=16, max_size=100)
    assert cuts[0] == 30           # 5 skipped (< min), 30 taken
    assert cuts[1] == 130          # 33 < 30+16 skipped, none < 30+100: forced
    assert all(b - a >= 16 for a, b in zip(cuts, cuts[1:]))
    assert all(b - a <= 100 for a, b in zip(cuts, cuts[1:]))


def test_cdc_chunks_lossless_and_deterministic(spark):
    docs = [
        (1, "spark catalyst tungsten " * 30),
        (2, ""),                       # empty doc: zero chunks
        (3, "short"),                  # below min_size: one chunk
    ]
    df = spark.createDataFrame(docs, "id long, t string")
    out = cdc_chunks(df, "id", "t").collect()
    assert not [r for r in out if r.id == 2]
    one = [r for r in out if r.id == 3]
    assert len(one) == 1 and one[0].chunk_len == 5
    c1 = sorted((r.chunk_pos, r.chunk_len, r.chunk_hash) for r in out if r.id == 1)
    assert sum(l for _, l, _ in c1) == len(docs[0][1].encode())
    # contiguous cover
    end = 0
    for pos, ln, _ in c1:
        assert pos == end
        end += ln
    out2 = sorted(
        (r.chunk_pos, r.chunk_len, r.chunk_hash)
        for r in cdc_chunks(df, "id", "t").collect()
        if r.id == 1
    )
    assert out2 == c1


def test_cdc_resynchronizes_after_insertion(spark):
    base = "the quick brown fox jumps over the lazy dog " * 25
    df = spark.createDataFrame(
        [(1, base), (2, "INSERTED-PREFIX! " + base)], "id long, t string"
    )
    out = cdc_chunks(df, "id", "t").collect()
    h1 = {r.chunk_hash for r in out if r.id == 1}
    h2 = {r.chunk_hash for r in out if r.id == 2}
    # fixed-size chunking would share ~0 blocks after a prefix shift;
    # CDC re-synchronizes, so most chunks survive
    assert len(h1 & h2) / len(h1) >= 0.5


def test_cdc_mask_is_spread_high():
    m = _cdc_mask(6)
    assert bin(m).count("1") == 6
    assert m & 0xFFF == 0  # no low bits: boundary context stays wide


def test_bucketed_join_is_shuffle_free(spark, tables, tmp_path_factory):
    from bullet_spark_spark.operators import layout as lay

    base = str(tmp_path_factory.mktemp("bucketed"))
    lay.write_bucketed(
        tables["orders"].select("o_orderkey", "o_orderpriority"),
        "t_bkt_orders", "o_orderkey", 4, f"{base}/o",
    )
    lay.write_bucketed(
        tables["lineitem"]
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_bkt_lineitem", "o_orderkey", 4, f"{base}/l",
    )
    j = lay.bucketed_join(spark, "t_bkt_orders", "t_bkt_lineitem", "o_orderkey")
    lay.assert_no_join_exchange(j)  # the co-location contract
    # and the values are the plain join's values
    want = (
        tables["orders"]
        .select("o_orderkey", "o_orderpriority")
        .join(
            tables["lineitem"].select(
                F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
            ),
            "o_orderkey",
        )
        .count()
    )
    assert j.count() == want
    # a non-bucket-key aggregation after the join still shuffles (sanity:
    # the no-exchange assert is about the JOIN, not the whole query)
    agg = j.groupBy("o_orderpriority").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_cdc_chunks_multibyte_utf8_lossless(spark):
    # chunk_pos/chunk_len are BYTE offsets; multibyte chars may split
    # across chunks but the byte-level cover must stay exact
    text = ("héllo wörld — 数据去重分块测试 🚀 " * 40)
    df = spark.createDataFrame([(1, text)], "id long, t string")
    out = sorted(
        (r.chunk_pos, r.chunk_len, r.chunk_hash)
        for r in cdc_chunks(df, "id", "t").collect()
    )
    raw = text.encode("utf-8")
    assert sum(l for _, l, _ in out) == len(raw)
    import hashlib as _h

    end = 0
    for pos, ln, hx in out:
        assert pos == end
        assert _h.md5(raw[pos : pos + ln]).hexdigest() == hx
        end += ln
    assert end == len(raw)


def test_dedup_rate_estimate_group_level_sampling(spark):
    from bullet_spark_spark.operators.dedup import dedup_rate_estimate

    # 40 docs: 10 contents x 4 exact copies -> dup rate 0.75 exactly;
    # group-level sampling keeps copies together, so WHATEVER subset of
    # contents lands in-sample, the estimated rate is 0.75 or null
    docs = [(i, f"content number {i % 10}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = dedup_rate_estimate(df, "doc_id", "text").collect()[0]
    assert row["exact_dup_rate"] == 0.75
    assert row["n_sample_docs"] % 4 == 0  # whole groups only
    if row["n_sample_docs"]:
        assert row["est_dup_rate"] == 0.75
        assert row["abs_err"] == 0.0


def test_dedup_rate_estimate_unique_corpus(spark):
    from bullet_spark_spark.operators.dedup import dedup_rate_estimate

    docs = [(i, f"totally unique text {i}") for i in range(64)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = dedup_rate_estimate(df, "doc_id", "text").collect()[0]
    assert row["exact_dup_rate"] == 0.0
    if row["n_sample_docs"]:
        assert row["est_dup_rate"] == 0.0


def test_attribution_three_models(spark):
    from datetime import datetime, timedelta

    import bullet_spark_spark.operators.behavior as bh

    t0 = datetime(2024, 1, 1)
    # user 1: touches on channels A(t0), B(t0+1h), conversion at t0+2h
    #   -> first=A, last=B, linear 0.5 each
    # user 2: single touch C then conversion -> all models give C
    # user 3: touch outside lookback -> unattributed, drops out
    touches = spark.createDataFrame(
        [
            (1, 101, t0, "A"),
            (1, 102, t0 + timedelta(hours=1), "B"),
            (2, 201, t0, "C"),
            (3, 301, t0 - timedelta(days=10), "A"),
        ],
        "user_id long, touch_id long, touch_ts timestamp, channel string",
    )
    convs = spark.createDataFrame(
        [
            (1, 901, t0 + timedelta(hours=2), 10.0),
            (2, 902, t0 + timedelta(hours=3), 20.0),
            (3, 903, t0, 30.0),
        ],
        "user_id long, conv_id long, conv_ts timestamp, value double",
    )
    out = {
        r["channel"]: r
        for r in bh.attribution(
            touches, convs, "user_id", "channel",
            value_col="value", lookback_sec=86400,
        ).collect()
    }
    assert set(out) == {"A", "B", "C"}
    assert out["A"]["first_touch_convs"] == 1 and out["A"]["last_touch_convs"] == 0
    assert out["B"]["first_touch_convs"] == 0 and out["B"]["last_touch_convs"] == 1
    assert out["A"]["linear_credit"] == 0.5 and out["B"]["linear_credit"] == 0.5
    assert out["B"]["last_touch_value"] == 10.0
    assert out["C"]["first_touch_convs"] == 1 and out["C"]["last_touch_convs"] == 1
    assert out["C"]["linear_credit"] == 1.0 and out["C"]["last_touch_value"] == 20.0


def test_attribution_tie_broken_by_touch_id(spark):
    from datetime import datetime

    import bullet_spark_spark.operators.behavior as bh

    t0 = datetime(2024, 1, 1)
    touches = spark.createDataFrame(
        [(1, 5, t0, "X"), (1, 6, t0, "Y")],
        "user_id long, touch_id long, touch_ts timestamp, channel string",
    )
    convs = spark.createDataFrame(
        [(1, 9, t0, 1.0)],
        "user_id long, conv_id long, conv_ts timestamp, value double",
    )
    out = {
        r["channel"]: r
        for r in bh.attribution(
            touches, convs, "user_id", "channel", value_col="value"
        ).collect()
    }
    assert out["X"]["first_touch_convs"] == 1  # lower touch_id wins asc
    assert out["Y"]["last_touch_convs"] == 1   # higher touch_id wins desc


def test_merge_upsert_all_four_branches(spark):
    import bullet_spark_spark.operators.relational as rel2

    tgt = spark.createDataFrame(
        [(1, 10.0, "keep"), (2, 20.0, "update-me"), (3, 30.0, "delete-me")],
        "k long, v double, tag string",
    )
    src = spark.createDataFrame(
        [(2, 5.0), (3, 99.0), (4, 40.0)], "k long, delta double"
    )
    out = {
        r["k"]: (r["v"], r["tag"])
        for r in rel2.merge_upsert(
            tgt, src, ["k"],
            update_cols={"v": F.col("t.v") + F.col("s.delta"),
                         "tag": F.col("t.tag")},
            insert_cols={"v": F.col("s.delta"), "tag": F.lit("new")},
            delete_cond=F.col("s.delta") > 50,
        ).collect()
    }
    assert out == {
        1: (10.0, "keep"),        # not matched by source: unchanged
        2: (25.0, "update-me"),   # matched: updated
        4: (40.0, "new"),         # not matched by target: inserted
    }                             # 3 deleted (delta 99 > 50)


def test_merge_upsert_requires_full_column_spec(spark):
    import pytest as _pytest

    import bullet_spark_spark.operators.relational as rel2

    tgt = spark.createDataFrame([(1, 1.0, "x")], "k long, v double, tag string")
    src = spark.createDataFrame([(1, 2.0)], "k long, delta double")
    with _pytest.raises(ValueError, match="tag"):
        rel2.merge_upsert(
            tgt, src, ["k"],
            update_cols={"v": F.col("s.delta")},
            insert_cols={"v": F.col("s.delta")},
        )


def _sssp(spark, triples, sources, max_hops):
    edges = spark.createDataFrame(triples, "src string, dst string, w long")
    srcs = spark.createDataFrame([(s,) for s in sources], "node string")
    out = gr.shortest_paths(edges, srcs, max_hops=max_hops)
    return {r["node"]: r["cost"] for r in out.collect()}


def test_sssp_two_cheap_hops_beat_one_expensive(spark):
    edges = [("a", "c", 10), ("a", "b", 2), ("b", "c", 3)]
    got = _sssp(spark, edges, ["a"], max_hops=3)
    assert got == {"a": 0, "b": 2, "c": 5}
    # with only 1 hop allowed, the direct edge is the best reachable
    got1 = _sssp(spark, edges, ["a"], max_hops=1)
    assert got1 == {"a": 0, "b": 2, "c": 10}


def test_sssp_parallel_edges_keep_cheapest_and_cycles_terminate(spark):
    edges = [("a", "b", 7), ("a", "b", 4), ("b", "a", 1), ("b", "c", 1)]
    got = _sssp(spark, edges, ["a"], max_hops=5)
    assert got == {"a": 0, "b": 4, "c": 5}


def test_sssp_matches_recursive_oracle(spark, duck):
    import random

    rng = random.Random(13)
    nodes = [f"n{i}" for i in range(30)]
    triples = sorted(
        {
            (rng.choice(nodes), rng.choice(nodes), rng.randint(1, 9))
            for _ in range(100)
        }
    )
    triples = [(s, d, w) for s, d, w in triples if s != d]
    vals = ", ".join(f"('{s}', '{d}', {w})" for s, d, w in triples)
    sql = gr.oracle_shortest_paths_sql(
        f"edges(src, dst, w) AS (VALUES {vals})",
        "srcs(node) AS (VALUES ('n0'), ('n1'))",
        max_hops=4,
        select="SELECT node, cost FROM dists ORDER BY node",
    )
    want = dict(duck.execute(sql).fetchall())
    got = _sssp(spark, triples, ["n0", "n1"], max_hops=4)
    assert got == want


def test_cdc_suffix_stability_and_tail_candidates():
    # tail candidates still cut (suffix stability), and a candidate at
    # the last byte never produces an empty final chunk
    assert _cdc_cuts(90, [40], min_size=16, max_size=100) == [40]
    assert _cdc_cuts(50, [49], min_size=16, max_size=100) == []

    import hashlib

    import numpy as np

    def chunk_hashes(raw):
        g = np.array(_GEAR, dtype=np.uint64)[np.frombuffer(raw, dtype=np.uint8)]
        h = g.copy()
        old = np.seterr(over="ignore")
        try:
            for k in range(1, min(64, len(raw))):
                h[k:] += g[:-k] << np.uint64(k)
        finally:
            np.seterr(**old)
        cand = np.flatnonzero((h & np.uint64(_cdc_mask(6))) == np.uint64(0))
        cuts = _cdc_cuts(len(raw), cand, 16, 256)
        b = [0] + [c + 1 for c in cuts] + [len(raw)]
        return [
            hashlib.md5(raw[b[i] : b[i + 1]]).hexdigest()
            for i in range(len(b) - 1)
        ]

    base = ("the quick brown fox jumps over the lazy dog " * 25).encode()
    h1 = chunk_hashes(base)
    h2 = chunk_hashes(base + b" APPENDED SUFFIX CONTENT HERE")
    assert h1[:-1] == h2[: len(h1) - 1]  # every interior chunk identical


def test_bucketed_scan_prunes_buckets_on_point_lookup(spark, tables, tmp_path_factory):
    from bullet_spark_spark.operators import layout as lay

    base = str(tmp_path_factory.mktemp("bktprune"))
    lay.write_bucketed(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        "t_bkt_prune", "o_orderkey", 8, f"{base}/o",
    )
    # DisableUnnecessaryBucketedScan turns bucketed reading off when no
    # operator consumes the distribution — pin it on so the filter-side
    # bucket pruning is observable in the plan
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = spark.table("t_bkt_prune").filter(F.col("o_orderkey") == 42)
        plan = q._jdf.queryExecution().executedPlan().toString()
        # scan-side bucket pruning: an equality predicate on the bucket
        # key reads 1 of 8 buckets, not the table
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        got = q.count()
        want = tables["orders"].filter(F.col("o_orderkey") == 42).count()
        assert got == want
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_bucketed_agg_is_shuffle_free(spark, tables, tmp_path_factory):
    from bullet_spark_spark.operators import layout as lay

    base = str(tmp_path_factory.mktemp("bktagg"))
    lay.write_bucketed(
        tables["lineitem"].select(
            F.col("l_orderkey").alias("k"), "l_quantity"
        ),
        "t_bkt_agg", "k", 4, f"{base}/l",
    )
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        agg = spark.table("t_bkt_agg").groupBy("k").count()
        lay.assert_no_exchange(agg, "bucketed aggregation")
        # same agg on the unbucketed frame DOES shuffle (the assert isn't
        # vacuous)
        plain = tables["lineitem"].groupBy("l_orderkey").count()
        plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
        got = dict((r["k"], r["count"]) for r in agg.collect())
        want = dict(
            (r["l_orderkey"], r["count"]) for r in plain.collect()
        )
        assert got == want
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
