"""PageRank (operators/graph.py) semantics + scale-shape tests.

Mirrors the connected_components test posture: known-topology graphs with
hand-checkable outcomes, plus the lineage-discipline regression (long loops
must not compound plans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import graph as gr


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


def test_star_graph_center_dominates(spark):
    # 4 leaves all pointing at hub (symmetrized) — hub must rank highest,
    # leaves tie exactly.
    rows = []
    for leaf in ["a", "b", "c", "d"]:
        rows += [(leaf, "hub", 1), ("hub", leaf, 1)]
    ranks = {r["node"]: r["rank"] for r in gr.pagerank(_edges(spark, rows)).collect()}
    assert ranks["hub"] == max(ranks.values())
    leaf_ranks = {ranks[x] for x in "abcd"}
    assert len(leaf_ranks) == 1  # exact symmetry → exact tie
    # conservation: symmetrized graph has no dangling mass; ranks sum to ~1
    assert abs(sum(ranks.values()) - 1.0) < 1e-6


def test_uniform_cycle_is_uniform(spark):
    # directed 3-cycle with equal weights: stationary from the uniform
    # start — every iteration maps 1/3 -> 0.15/3 + 0.85*(1/3) = 1/3.
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    ranks = [r["rank"] for r in gr.pagerank(_edges(spark, rows)).collect()]
    assert len(set(ranks)) == 1
    assert ranks[0] == pytest.approx(1 / 3, abs=1e-9)


def test_weights_steer_rank(spark):
    # 'src' splits its vote 9:1 between x and y — x must outrank y.
    rows = [
        ("s", "x", 9),
        ("s", "y", 1),
        ("x", "s", 1),
        ("y", "s", 1),
    ]
    ranks = {r["node"]: r["rank"] for r in gr.pagerank(_edges(spark, rows)).collect()}
    assert ranks["x"] > ranks["y"]


def test_dangling_node_keeps_teleport_only(spark):
    # 'sink' has no out-edges: it receives mass but redistributes none;
    # every node still gets >= teleport/n each round.
    rows = [("a", "sink", 1), ("b", "sink", 1), ("a", "b", 1), ("b", "a", 1)]
    df = gr.pagerank(_edges(spark, rows), iterations=3)
    n = df.count()
    floor = 0.15 / n
    assert df.filter(F.col("rank") < floor - 1e-12).count() == 0
    ranks = {r["node"]: r["rank"] for r in df.collect()}
    assert ranks["sink"] == max(ranks.values())


def test_long_chain_lineage_does_not_blow_up(spark):
    # 12 iterations over a 30-node path: without localCheckpoint per round
    # the nested plan overflows analysis (the connected_components lesson).
    rows = []
    for i in range(29):
        rows += [(f"n{i:02d}", f"n{i + 1:02d}", 1), (f"n{i + 1:02d}", f"n{i:02d}", 1)]
    out = gr.pagerank(_edges(spark, rows), iterations=12)
    assert out.count() == 30


def test_oracle_sql_matches_engine(spark, duck):
    # differential on an asymmetric weighted graph (not part of the driver
    # fixture tables — exercises the SQL generator directly).
    rows = [
        ("u", "v", 3),
        ("v", "w", 2),
        ("w", "u", 5),
        ("u", "w", 1),
        ("w", "v", 4),
    ]
    engine = {
        r["node"]: r["rank"]
        for r in gr.pagerank(_edges(spark, rows), iterations=4).collect()
    }
    values = ", ".join(f"('{s}', '{d}', {w})" for s, d, w in rows)
    sql = gr.oracle_pagerank_sql(
        f"edges(src, dst, w) AS (SELECT * FROM (VALUES {values}))",
        iterations=4,
    )
    oracle = dict(duck.execute(sql).fetchall())
    assert engine == oracle
