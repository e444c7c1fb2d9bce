"""Round-10-queue operator additions: triangle counting, rank-based and
parametric two-sample tests, temporal autocorrelation."""

from __future__ import annotations

from pyspark.sql import functions as F

from bullet_spark_spark.operators import graph as gr


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------

def _tri_rows(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in gr.triangle_counts(df).collect()
    }


def test_triangle_counts_diamond(spark):
    # K4 minus edge (1,4): triangles (1,2,3) and (2,3,4)
    got = _tri_rows(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    assert got == {
        1: (2, 1, 1.0),
        2: (3, 2, round(2 * 2 / (3 * 2), 6)),
        3: (3, 2, round(2 * 2 / (3 * 2), 6)),
        4: (2, 1, 1.0),
    }


def test_triangle_counts_star_has_none(spark):
    # a star (celebrity hub) has maximal degree but zero triangles —
    # exactly the degree-vs-clustering separation the operator exists for
    got = _tri_rows(spark, [(0, i) for i in range(1, 6)])
    assert got[0] == (5, 0, 0.0)
    assert all(got[i] == (1, 0, 0.0) for i in range(1, 6))


def test_triangle_counts_canonicalizes_input(spark):
    # duplicates, reversed orientation, and self-loops must collapse to
    # the one undirected triangle
    got = _tri_rows(
        spark,
        [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 3), (2, 2)],
    )
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_triangle_counts_complete_k5(spark):
    # K5: C(5,2)=10 edges, C(5,3)=10 triangles; every node sits in
    # C(4,2)=6 of them and clusters at exactly 1.0 — exercises the
    # all-ties orientation path (every degree equal -> node-id tiebreak)
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    got = _tri_rows(spark, edges)
    assert got == {i: (4, 6, 1.0) for i in range(5)}


def test_triangle_counts_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    plan = gr.triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
