"""Z-order layout (operators/layout.py) and distributed Lloyd's k-means
(similarity.kmeans_lloyd): bit-level references, the production
range-cluster path's contracts, the pruning claim itself, and a pure-
numpy differential for the k-means fixed point."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bullet_spark_spark.operators import layout as lay
from bullet_spark_spark.operators import similarity as sim


def _morton2_py(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_interleave_bits_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 127, 255) for b in (0, 3, 64, 200, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn(
            "z", lay.interleave_bits([F.col("a"), F.col("b")], bits=8)
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton2_py(a, b, 8), (a, b)


def test_interleave_overflow_guard(spark):
    import pytest

    with pytest.raises(ValueError):
        lay.interleave_bits([F.col("a"), F.col("b")], bits=32)


def test_scale_int_exact_endpoints(spark):
    # endpoints map to 0 and 2^bits-1; interior uses exact integer division
    df = spark.createDataFrame(
        [(7,), (19_999,), (13_313,)], "x long"
    ).withColumn("lo", F.lit(7).cast("long")).withColumn(
        "hi", F.lit(19_999).cast("long")
    )
    got = [
        r["s"]
        for r in df.select(
            lay.scale_int(F.col("x"), F.col("lo"), F.col("hi"), bits=8).alias("s")
        ).orderBy("s").collect()
    ]
    lo, hi = 7, 19_999
    want = sorted(((x - lo) * 255) // (hi - lo) for x in (7, 19_999, 13_313))
    assert got == want == [0, 169, 255]


def test_cluster_by_range_partitions_are_disjoint_and_sorted(spark, tables):
    li = tables["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    z = lay.zorder_key(li, ["l_partkey", "l_suppkey"], bits=8)
    clustered = lay.cluster_by_range(z, "zkey", n_buckets=8)
    # production contract: one range exchange, visible in the plan
    plan = clustered._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    stats = (
        clustered.groupBy("bucket")
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .orderBy("bucket")
        .collect()
    )
    # zone maps of a range-clustered layout never overlap
    for prev, cur in zip(stats, stats[1:]):
        assert prev["hi"] <= cur["lo"]


def test_zorder_prunes_both_dims_linear_only_leading(spark, tables):
    li = tables["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    dims = ["l_partkey", "l_suppkey"]
    z = lay.zorder_key(li, dims, bits=8)
    zb = lay.assign_buckets_exact(z, ["zkey", "l_orderkey", "l_linenumber"], 16)
    lb = lay.assign_buckets_exact(
        z, ["l_partkey", "l_orderkey", "l_linenumber"], 16
    )
    zst = lay.bucket_stats(zb, dims)
    lst = lay.bucket_stats(lb, dims)
    sk = li.select(F.col("l_suppkey").alias("k")).distinct()
    z_avg = lay.pruning_report(zst, sk, "l_suppkey", "k", "z").collect()[0][
        "avg_buckets"
    ]
    l_avg = lay.pruning_report(lst, sk, "l_suppkey", "k", "l").collect()[0][
        "avg_buckets"
    ]
    # the claim the layout exists for: the non-leading dimension prunes
    # under z-order but degrades to ~full scan under the linear sort
    assert z_avg < l_avg
    assert l_avg > 12  # linear: suppkey predicate touches almost all 16
    assert z_avg < 12


def _kmeans_numpy(vecs: dict[int, np.ndarray], k: int, iters: int, dp=6, tdp=9):
    """Pure-python Lloyd with the module's exact quantization rules."""
    ids = sorted(vecs)
    cents = {c: vecs[i].astype(np.float64) for c, i in enumerate(ids[:k])}
    scale = float(10**dp)
    for _ in range(iters):
        assign: dict[int, int] = {}
        for i in ids:
            best = None
            for c in sorted(cents):
                d2 = sum(
                    round(float((vecs[i][j] - cents[c][j]) ** 2), tdp)
                    for j in range(len(vecs[i]))
                )
                if best is None or d2 < best[0] or (d2 == best[0] and c < best[1]):
                    best = (d2, c)
            assign[i] = best[1]
        new = {}
        for c in sorted(set(assign.values())):
            members = [vecs[i] for i in ids if assign[i] == c]
            n = len(members)
            m = np.zeros(len(members[0]))
            for j in range(len(m)):
                s = sum(float(v[j]) for v in members)  # small n: exact enough
                m[j] = np.floor(s / n * scale) / scale
            new[c] = (m, n)
        cents = {c: m for c, (m, n) in new.items()}
        sizes = {c: n for c, (m, n) in new.items()}
    return cents, sizes


def test_kmeans_lloyd_matches_numpy_reference(spark, tables):
    emb = tables["embeddings"].limit(60)
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    got = {
        r["cluster"]: (np.array(r["centroid"]), r["n"])
        for r in sim.kmeans_lloyd(emb, k=4, iterations=2).collect()
    }
    want_c, want_n = _kmeans_numpy(vecs, k=4, iters=2)
    assert set(got) == set(want_c)
    for c in want_c:
        assert got[c][1] == want_n[c]
        np.testing.assert_allclose(got[c][0], want_c[c], atol=2e-6)


def test_kmeans_sizes_conserve_rows(spark, tables):
    emb = tables["embeddings"]
    total = emb.count()
    out = sim.kmeans_lloyd(emb, k=8, iterations=1).collect()
    assert sum(r["n"] for r in out) == total
    # floor-quantized coordinates: every centroid entry is a 1e-6 multiple
    for r in out:
        for x in r["centroid"]:
            assert abs(round(x * 1e6) - x * 1e6) < 1e-6


def _rrf_py(rankings: dict[str, dict[tuple, int]], rrf_k=60):
    from decimal import Decimal

    keys = set()
    for r in rankings.values():
        keys |= set(r)
    out = {}
    for key in keys:
        s = Decimal(0)
        for r in rankings.values():
            if key in r:
                s += Decimal(str(round(1.0 / (rrf_k + r[key]), 9)))
        out[key] = s
    return out


def test_rrf_fuse_three_rankers_matches_reference(spark):
    # three rankers with partial overlap; fused order must match an exact
    # decimal reference regardless of join/sum order
    mk = lambda rows: spark.createDataFrame(
        rows, "query_id long, doc_id long, rank long"
    )
    a = mk([(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    b = mk([(1, 11, 1), (1, 13, 2)])
    c = mk([(1, 12, 1), (1, 10, 2), (1, 13, 3)])
    got = sim.rrf_fuse(
        [("a", a), ("b", b), ("c", c)], k=10
    ).orderBy("rank").collect()
    want = _rrf_py(
        {
            "a": {(1, 10): 1, (1, 11): 2, (1, 12): 3},
            "b": {(1, 11): 1, (1, 13): 2},
            "c": {(1, 12): 1, (1, 10): 2, (1, 13): 3},
        }
    )
    order = sorted(want, key=lambda kk: (-want[kk], kk[1]))
    assert [(r["query_id"], r["doc_id"]) for r in got] == order
    for r in got:
        assert abs(r["rrf"] - float(want[(r["query_id"], r["doc_id"])])) < 1e-6
    # per-ranker ranks survive fusion; misses are NULL
    row13 = [r for r in got if r["doc_id"] == 13][0]
    assert row13["rank_a"] is None and row13["rank_b"] == 2 and row13["rank_c"] == 3


def test_rrf_fuse_requires_rankers(spark):
    import pytest

    with pytest.raises(ValueError):
        sim.rrf_fuse([])


def test_streaming_zonemap_drip_equals_batch(spark, tables, tmp_path):
    """Zone-map maintenance is a stateless projection + one keyed agg, so
    the SAME layout code runs on a stream: drip lineitem in 3 micro-
    batches, maintain per-bucket stats in complete mode, and the final
    table equals the batch zone map computed with the same fixed bounds
    (the streaming variant pins bounds from a profile — no global min/max
    exists on a stream) and fixed-width z-prefix buckets (no NTILE)."""
    import os

    li = (
        tables["lineitem"]
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .limit(3000)
        .collect()
    )
    bounds = [("l_partkey", 0, 1999), ("l_suppkey", 0, 99)]

    data_dir = str(tmp_path / "in")
    os.makedirs(data_dir)
    chunks = [li[0:1000], li[1000:2200], li[2200:3000]]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(
            chunk, "l_orderkey long, l_partkey long, l_suppkey long"
        ).coalesce(1).write.parquet(f"{data_dir}/c{i}")

    def zonemap(df):
        z = lay.zorder_key_fixed(df, bounds, bits=8)
        b = z.withColumn("bucket", lay.prefix_bucket(F.col("zkey"), 16, 16))
        return lay.bucket_stats(b, ["l_partkey", "l_suppkey"])

    stream = (
        spark.readStream.schema("l_orderkey long, l_partkey long, l_suppkey long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{data_dir}/c*")
    )
    q = (
        zonemap(stream)
        .writeStream.format("memory")
        .queryName("zmap_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        tuple(r)
        for r in spark.sql("select * from zmap_t").collect()
    }
    batch_df = spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_suppkey long"
    )
    batch = {tuple(r) for r in zonemap(batch_df).collect()}
    assert streamed == batch
    assert sum(r[1] for r in streamed) == 3000


def test_prefix_bucket_rejects_non_power_of_two(spark):
    import pytest

    with pytest.raises(ValueError):
        lay.prefix_bucket(F.col("z"), 16, 10)


def test_zorder_layout_prunes_real_parquet_footers(spark, tables, tmp_path):
    """End-to-end: cluster_by_range(zkey) written to parquet produces
    FILE FOOTERS (the stats a real engine prunes with) where a point
    predicate on the non-leading dimension qualifies a small fraction of
    files, while the lexicographic layout qualifies ~all of them — the
    pruning_report's claim, validated against the actual storage format
    rather than a simulated zone map."""
    import glob

    import pyarrow.parquet as pq

    li = tables["lineitem"].select("l_orderkey", "l_partkey", "l_suppkey")
    z = lay.zorder_key(li, ["l_partkey", "l_suppkey"], bits=8)

    zdir, ldir = str(tmp_path / "zorder"), str(tmp_path / "linear")
    lay.cluster_by_range(z, "zkey", n_buckets=16).drop("bucket").write.parquet(zdir)
    lay.cluster_by_range(z, "l_partkey", n_buckets=16).drop("bucket").write.parquet(ldir)

    def files_touched(path, col, value):
        touched = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            hit = False
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or (st.min <= value <= st.max):
                    hit = True
            total += 1
            touched += int(hit)
        return touched, total

    z_t, z_n = files_touched(zdir, "l_suppkey", 5)
    l_t, l_n = files_touched(ldir, "l_suppkey", 5)
    assert z_n >= 8 and l_n >= 8  # both layouts actually split into files
    # suppkey predicate: z-order skips files, the partkey sort cannot
    assert z_t < l_t
    assert l_t >= l_n - 1  # linear: essentially every file qualifies
    assert z_t <= z_n // 2  # z-order: at most half the files qualify
    # and the leading dim still prunes under z-order (locality retained)
    zp_t, _ = files_touched(zdir, "l_partkey", 42)
    assert zp_t <= z_n // 2


def test_nearest_centroid_scorer_streaming_drip_equals_batch(
    spark, tables, tmp_path
):
    """Train batch, serve streaming, for clustering: kmeans_lloyd trains
    on the batch corpus, the frozen centroids compile into the stateless
    scorer, and dripping the corpus through a stream scores every vector
    with EXACTLY the batch path's assignment (same decimal distances,
    same smaller-label tie break)."""
    import os

    emb = tables["embeddings"]
    model = sim.kmeans_lloyd(emb, k=4, iterations=2).collect()
    cents_df = spark.createDataFrame(
        [(r["cluster"], r["centroid"]) for r in model],
        "cluster long, centroid array<double>",
    )
    batch = {
        (r["vec_id"], r["assigned"])
        for r in sim.nearest_centroid_assign(
            emb, cents_df, "vec_id", "embedding", "cluster", "centroid"
        ).collect()
    }

    cents = [(r["cluster"], list(r["centroid"])) for r in model]
    assigned, d2 = sim.nearest_centroid_scorer(cents)

    data_dir = str(tmp_path / "in")
    os.makedirs(data_dir)
    rows = emb.select("vec_id", "embedding").collect()
    for i, chunk in enumerate([rows[:40], rows[40:]]):
        spark.createDataFrame(
            [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in chunk],
            "vec_id long, embedding array<double>",
        ).coalesce(1).write.parquet(f"{data_dir}/c{i}")

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{data_dir}/c*")
    )
    q = (
        stream.select("vec_id", assigned.alias("assigned"), d2.alias("d2"))
        .writeStream.format("memory")
        .queryName("nc_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r["vec_id"], r["assigned"])
        for r in spark.sql("select * from nc_stream_t").collect()
    }
    # scorer consumed double vectors; batch consumed the float32 parquet
    # column — nearest_centroid_assign widens per-term, so both paths
    # compute on the same widened doubles
    assert streamed == batch
    assert len(streamed) == emb.count()


def test_hilbert_table_is_bijective_and_adjacent(spark):
    """The two properties that make Hilbert a LAYOUT curve: the mapping
    is a bijection onto [0, n²), and consecutive curve positions are
    grid-ADJACENT (manhattan distance exactly 1) — the locality z-order
    gives up at its seam jumps."""
    bits = 4
    n = 1 << bits
    rows = lay.hilbert_table(spark, bits).collect()
    assert len(rows) == n * n
    by_d = {r["hd"]: (r["hx"], r["hy"]) for r in rows}
    assert set(by_d) == set(range(n * n))  # bijection
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d  # adjacency


def test_hilbert_vs_zorder_vs_linear_pruning(spark, tables):
    """Hilbert prunes at least as well as z-order on the non-leading
    dimension (allowing small-sample slack) and both beat the
    lexicographic layout by a wide margin."""
    li = tables["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    dims = ["l_partkey", "l_suppkey"]
    h = lay.hilbert_key(li, dims, bits=8)
    z = lay.zorder_key(h, dims, bits=8)
    sk = li.select(F.col("l_suppkey").alias("k")).distinct()

    def avg(sort_key):
        b = lay.assign_buckets_exact(
            z, [sort_key, "l_orderkey", "l_linenumber"], 16
        )
        st = lay.bucket_stats(b, dims)
        return lay.pruning_report(st, sk, "l_suppkey", "k", sort_key).collect()[
            0
        ]["avg_buckets"]

    h_avg, z_avg, l_avg = avg("hkey"), avg("zkey"), avg("l_partkey")
    assert h_avg < l_avg and z_avg < l_avg
    assert h_avg <= z_avg * 1.25  # competitive-or-better locality


def test_hilbert_key_requires_two_dims(spark, tables):
    import pytest

    with pytest.raises(ValueError):
        lay.hilbert_key(tables["lineitem"], ["l_partkey"], bits=8)


def test_kmeans_farthest_init_deterministic_and_spread(spark, tables):
    """Gonzalez farthest-point seeding: RNG-free (two runs identical),
    k distinct seeds, and the minimum pairwise seed distance is at least
    the naive smallest-k-ids seeding's — the property the greedy maxmin
    traversal guarantees and the reason to pay k passes at init time.
    Plugs into kmeans_lloyd via init_centroids and converges to the same
    surface shape (k clusters covering every vector)."""
    import itertools

    emb = tables["embeddings"]
    a = sim.kmeans_init_farthest(emb, k=4).orderBy("cluster").collect()
    b = sim.kmeans_init_farthest(emb, k=4).orderBy("cluster").collect()
    assert [tuple(r["centroid"]) for r in a] == [tuple(r["centroid"]) for r in b]
    assert len({r["cluster"] for r in a}) == 4
    seeds = [np.array(r["centroid"]) for r in a]
    assert len({tuple(s) for s in (tuple(x) for x in seeds)}) == 4

    naive = [
        np.array(r["embedding"], dtype=np.float64)
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]

    def min_pair_d2(vs):
        return min(
            float(((x - y) ** 2).sum()) for x, y in itertools.combinations(vs, 2)
        )

    assert min_pair_d2(seeds) >= min_pair_d2(naive)

    out = sim.kmeans_lloyd(
        emb, k=4, iterations=2, init_centroids=sim.kmeans_init_farthest(emb, k=4)
    ).collect()
    assert sum(r["n"] for r in out) == emb.count()
