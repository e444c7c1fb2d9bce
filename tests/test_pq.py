"""Product-quantization ANN (pq_train / pq_encode / pq_topk)."""

from __future__ import annotations

import numpy as np
import pytest

from bullet_spark_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def clustered(spark):
    """10 well-separated 32-dim cluster centers × 30 members with small
    noise — the regime where a quantizer must score high recall."""
    rng = np.random.RandomState(11)
    centers = rng.randn(10, 32) * 4.0
    rows, vid = [], 0
    for c in range(10):
        for _ in range(30):
            rows.append((vid, (centers[c] + 0.1 * rng.randn(32)).tolist()))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_train_shape_and_determinism(clustered):
    cb1 = sim.pq_train(clustered, m=8, k=16, sample_size=256)
    cb2 = sim.pq_train(clustered, m=8, k=16, sample_size=256)
    assert len(cb1) == 8
    assert all(len(c) == 16 and len(c[0]) == 4 for c in cb1)
    assert cb1 == cb2  # bit-deterministic training


def test_pq_train_rejects_indivisible_dim(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="not divisible"):
        sim.pq_train(df, m=2)


def test_pq_encode_codes_valid_and_consistent(clustered):
    cb = sim.pq_train(clustered, m=8, k=16, sample_size=256)
    codes = sim.pq_encode(clustered, cb).collect()
    assert len(codes) == 300
    for r in codes:
        assert len(r["pq_codes"]) == 8
        assert all(0 <= c < 16 for c in r["pq_codes"])
    # same direction -> same codes (encode normalizes)
    byid = {r["vec_id"]: list(r["pq_codes"]) for r in codes}
    spark = clustered.sparkSession
    doubled = clustered.limit(5).selectExpr(
        "vec_id", "transform(embedding, x -> x * 2.0) AS embedding"
    )
    for r in sim.pq_encode(doubled, cb).collect():
        assert list(r["pq_codes"]) == byid[r["vec_id"]]


def test_pq_topk_matches_numpy_replica(spark):
    """Full-path differential: encode + ADC tables + partial-top-k merge
    reproduce a pure-numpy PQ replica exactly (codes, ranking, 6-dp sims)."""
    rng = np.random.RandomState(3)
    m, k, dsub = 4, 8, 4
    rows = [(i, rng.randn(m * dsub).tolist()) for i in range(20)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = sim.pq_train(corpus, m=m, k=k, sample_size=20)
    C = [np.asarray(c) for c in cb]

    X = np.array([r[1] for r in rows])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    codes_np = np.stack(
        [
            (-2.0 * (X[:, s * dsub:(s + 1) * dsub] @ C[s].T)
             + (C[s] ** 2).sum(axis=1)[None, :]).argmin(axis=1)
            for s in range(m)
        ],
        axis=1,
    )
    codes_df = sim.pq_encode(corpus, cb)
    got_codes = {r["vec_id"]: list(r["pq_codes"]) for r in codes_df.collect()}
    for i in range(20):
        assert got_codes[i] == codes_np[i].tolist()

    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(3)], "query_id long, query_vec array<double>"
    )
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
        for r in sim.pq_topk(codes_df, cb, queries, k=5).collect()
    }
    for qi in range(3):
        q = X[qi]
        table = np.stack(
            [((q[s * dsub:(s + 1) * dsub][None, :] - C[s]) ** 2).sum(axis=1)
             for s in range(m)]
        )
        d = table[np.arange(m), codes_np].sum(axis=1)
        order = sorted(range(20), key=lambda i: (d[i], i))[:5]
        for rank, i in enumerate(order, 1):
            vid, s6 = got[(qi, rank)]
            assert vid == i
            assert abs(s6 - round(1.0 - d[i] / 2.0, 6)) < 1e-9


def test_pq_topk_cluster_recall(clustered):
    """In the tight-cluster regime PQ collapses within-cluster distances
    (members share codes, so intra-cluster order is the id tie-break —
    inherent to quantization, not a bug); the property that must hold is
    that NO neighbor leaks in from another cluster: every top-10 result
    belongs to the query's true cluster (members i*30..i*30+29)."""
    cb = sim.pq_train(clustered, m=8, k=16, sample_size=256)
    codes = sim.pq_encode(clustered, cb)
    queries = clustered.filter(sim.F.col("vec_id").isin(0, 35, 70, 105)).select(
        sim.F.col("vec_id").alias("query_id"),
        sim.F.col("embedding").alias("query_vec"),
    )
    got = sim.pq_topk(codes, cb, queries, k=10)
    rows = got.collect()
    assert len(rows) == 40
    for r in rows:
        assert r["vec_id"] // 30 == r["query_id"] // 30  # same cluster
        assert r["sim"] > 0.9  # near-dup territory on unit vectors


def test_pq_topk_plan_no_crossjoin(clustered):
    """The ADC scan emits per-batch partial top-k — the n×q score matrix
    never exists as a frame and the plan has no cartesian product."""
    import contextlib
    import io

    cb = sim.pq_train(clustered, m=8, k=16, sample_size=256)
    codes = sim.pq_encode(clustered, cb)
    queries = clustered.limit(4).select(
        sim.F.col("vec_id").alias("query_id"),
        sim.F.col("embedding").alias("query_vec"),
    )
    out = sim.pq_topk(codes, cb, queries, k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
