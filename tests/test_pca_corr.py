"""Distributed PCA (similarity.py) and correlation_matrix (quality.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import quality as ql
from bullet_spark_spark.operators import similarity as sim


def _vec_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


def test_pca_matches_numpy_on_collected_data(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud: variance concentrated on a known direction
    X = rng.normal(size=(300, 6)) * np.array([5.0, 2.0, 1.0, 0.5, 0.2, 0.1])
    df = _vec_df(spark, X)
    mean, comps, var = sim.pca_components(df, "embedding", k=3)
    # numpy reference on the same data
    Xc = X - X.mean(axis=0)
    ref_cov = (Xc.T @ Xc) / len(X)
    ref_val, ref_vec = np.linalg.eigh(ref_cov)
    order = np.argsort(ref_val)[::-1][:3]
    assert np.allclose(mean, X.mean(axis=0), atol=1e-6)
    for i, idx in enumerate(order):
        assert var[i] == pytest.approx(ref_val[idx], rel=1e-6)
        # same direction up to sign (we normalize sign; compare |dot| = 1)
        assert abs(np.dot(comps[i], ref_vec[:, idx])) == pytest.approx(1.0, abs=1e-8)


def test_pca_components_orthonormal_and_ordered(spark):
    rng = np.random.default_rng(1)
    X = rng.normal(size=(200, 5))
    _, comps, var = sim.pca_components(_vec_df(spark, X), "embedding", k=5)
    C = np.asarray(comps)
    assert np.allclose(C @ C.T, np.eye(5), atol=1e-8)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(4))


def test_pca_projection_reduces_reconstruction_error_with_k(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(150, 6)) * np.array([4.0, 2.0, 1.0, 0.3, 0.1, 0.05])
    df = _vec_df(spark, X)
    errs = []
    for k in (1, 3, 6):
        mean, comps, _ = sim.pca_components(df, "embedding", k=k)
        M, mu = np.asarray(comps), np.asarray(mean)
        proj = (X - mu) @ M.T
        recon = proj @ M + mu
        errs.append(float(((X - recon) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] == pytest.approx(0.0, abs=1e-12)  # k=dim is lossless


def test_pca_project_frame_matches_fit(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(50, 4))
    df = _vec_df(spark, X)
    fit = sim.pca_components(df, "embedding", k=2)
    out = {r["vec_id"]: r["pca"] for r in
           sim.pca_project(df, "embedding", k=2, fitted=fit).collect()}
    M, mu = np.asarray(fit[1]), np.asarray(fit[0])
    ref = (X - mu) @ M.T
    for i in range(50):
        assert np.allclose(out[i], ref[i], atol=1e-8)
    # input frame schema untouched (StructType.add mutation regression)
    assert "pca" not in df.columns


def test_correlation_matrix_known_values(spark):
    rows = [(float(i), float(2 * i + 1), float(-3 * i), 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in ql.correlation_matrix(df, ["x", "y", "z", "c"]).collect()}
    assert got[("x", "y")] == pytest.approx(1.0, abs=1e-6)
    assert got[("x", "z")] == pytest.approx(-1.0, abs=1e-6)
    assert got[("x", "c")] is None  # zero variance -> undefined, not crash


def test_correlation_matrix_listwise_nulls_and_errors(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (None, 99.0), (3.0, 3.0)], "a double, b double"
    )
    (row,) = ql.correlation_matrix(df, ["a", "b"]).collect()
    assert row["corr"] == pytest.approx(1.0, abs=1e-6)  # null row excluded
    with pytest.raises(ValueError):
        ql.correlation_matrix(df, ["a"])


def test_correlation_matrix_single_scan(spark):
    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "a double, b double, c double")
    plan = (
        ql.correlation_matrix(df, ["a", "b", "c"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan") <= 1


def test_pca_ann_recall_vs_exact(spark):
    rng = np.random.default_rng(11)
    # clustered corpus: fast-decaying spectrum (PCA-friendly)
    centers = rng.normal(size=(5, 16)) * 3.0
    X = np.vstack([c + rng.normal(size=(40, 16)) * 0.4 for c in centers])
    corpus = _vec_df(spark, X)
    Q = X[:8] + rng.normal(size=(8, 16)) * 0.05
    queries = spark.createDataFrame(
        [(i, [float(x) for x in q]) for i, q in enumerate(Q)],
        "query_id long, query_vec array<float>",
    )
    exact = sim.brute_force_topk(corpus, queries, k=5)
    approx = sim.pca_ann_topk(corpus, queries, k=5, pca_k=4, rerank_factor=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8  # coarse PCA prune + exact re-rank keeps most
    # and the sims it reports are EXACT (full-dim cosine)
    e_sims = {(r["query_id"], r["vec_id"]): r["sim"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["query_id"], r["vec_id"])
        if key in e_sims:
            assert r["sim"] == e_sims[key]


def test_group_centroids_exact_means(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], "a"), (2, [3.0, 4.0], "a"), (3, [10.0, 0.0], "b")],
        "vec_id long, embedding array<float>, label string",
    )
    got = {r["label"]: (r["centroid"], r["n"]) for r in
           sim.group_centroids(df, "label", "embedding").collect()}
    assert got["a"] == ([2.0, 3.0], 2)
    assert got["b"] == ([10.0, 0.0], 1)


def test_nearest_centroid_assignment_and_ties(spark):
    cents = spark.createDataFrame(
        [("a", [0.0, 0.0]), ("b", [10.0, 0.0])],
        "label string, centroid array<double>",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [9.0, 0.0]), (3, [5.0, 0.0])],  # 3 is EQUIDISTANT
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["assigned"] for r in
           sim.nearest_centroid_assign(vecs, cents).collect()}
    assert got == {1: "a", 2: "b", 3: "a"}  # tie -> label ASC


def test_nearest_centroid_majority_diagonal_on_clustered_data(spark):
    rng = np.random.default_rng(2)
    centers = rng.normal(size=(4, 8)) * 5.0
    rows = []
    for lbl, c in enumerate(centers):
        for i in range(25):
            v = c + rng.normal(size=8) * 0.3
            rows.append((lbl * 100 + i, [float(x) for x in v], str(lbl)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    cents = sim.group_centroids(df, "label", "embedding")
    assigned = sim.nearest_centroid_assign(df, cents)
    joined = assigned.join(df.select("vec_id", "label"), "vec_id")
    acc = joined.filter(F.col("assigned") == F.col("label")).count() / 100
    assert acc == 1.0  # tight, well-separated clusters classify perfectly


def test_centroid_distances_and_silhouette_bounds(spark):
    cents = spark.createDataFrame(
        [("a", [0.0, 0.0]), ("b", [10.0, 0.0])],
        "label string, centroid array<double>",
    )
    vecs = spark.createDataFrame(
        [(1, [0.1, 0.0]), (2, [9.9, 0.0])],
        "vec_id long, embedding array<float>",
    )
    d = sim.centroid_distances(vecs, cents)
    got = {(r["vec_id"], r["cand"]): float(r["d2"]) for r in d.collect()}
    assert len(got) == 4  # every (vector, centroid) pair scored
    assert got[(1, "a")] < got[(1, "b")] and got[(2, "b")] < got[(2, "a")]
    # tight clusters near distinct prototypes: silhouette approaches 1
    import math
    a1 = math.sqrt(got[(1, "a")]); b1 = math.sqrt(got[(1, "b")])
    assert (b1 - a1) / max(a1, b1) > 0.97


def test_correlation_matrix_fast_path_agrees(spark, tables):
    """exact=False (Tungsten double sums, the production regime — ~30×
    cheaper than the decimal certification regime) agrees with exact=True
    to well inside any statistical tolerance."""
    from bullet_spark_spark.operators import quality as ql

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ex = {(r["col_a"], r["col_b"]): r["corr"]
          for r in ql.correlation_matrix(tables["lineitem"], cols).collect()}
    fast = {(r["col_a"], r["col_b"]): r["corr"]
            for r in ql.correlation_matrix(tables["lineitem"], cols, exact=False).collect()}
    assert set(ex) == set(fast)
    for k in ex:
        if ex[k] is None:
            assert fast[k] is None
        else:
            assert abs(ex[k] - fast[k]) < 1e-5
