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


def _pagerank_reference(edges, iterations=4, damping=0.85, teleport=0.15, dp=10):
    """Sequential replica of the quantized fixed point: q(x) = floor(x*s)/s."""
    import math

    s = float(10**dp)
    q = lambda x: math.floor(x * s) / s  # noqa: E731
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    n = float(len(nodes))
    out_w = {}
    for src, _, w in edges:
        out_w[src] = out_w.get(src, 0) + w
    ranks = {v: q(1.0 / n) for v in nodes}
    for _ in range(iterations):
        # exact integer-unit sums, like the engine's decimal aggregation
        units = {}
        for src, dst, w in edges:
            units[dst] = units.get(dst, 0) + math.floor(
                ranks[src] * w / out_w[src] * s
            )
        ranks = {
            v: q(teleport / n + damping * (units.get(v, 0) / s)) for v in nodes
        }
    return ranks


def test_pagerank_matches_sequential_reference_on_random_graphs(spark):
    import random

    for seed in range(4):
        rng = random.Random(seed)
        nodes = [f"n{i}" for i in range(rng.randint(3, 8))]
        edges = []
        seen = set()
        for _ in range(rng.randint(2, 14)):
            a, b = rng.sample(nodes, 2)
            if (a, b) not in seen:
                seen.add((a, b))
                edges.append((a, b, rng.randint(1, 9)))
        got = {
            r["node"]: r["rank"]
            for r in gr.pagerank(
                _edges(spark, edges), iterations=4
            ).collect()
        }
        assert got == _pagerank_reference(edges, iterations=4), f"seed {seed}"


def test_hits_bipartite_roles(spark):
    """On a bipartite customer->supplier graph, sources are pure hubs
    (authority 0) and sinks pure authorities (hub 0); the best-cited
    sink has authority 1.0 after max-normalization."""
    from bullet_spark_spark.operators import graph as gr
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [("c1", "s1", 2.0), ("c1", "s2", 1.0), ("c2", "s1", 1.0)],
        "src string, dst string, w double",
    )
    got = {r["node"]: (r["hub"], r["authority"])
           for r in gr.hits(edges, iterations=3).collect()}
    assert got["s1"][0] == 0.0 and got["s2"][0] == 0.0  # sinks: no hub mass
    assert got["c1"][1] == 0.0 and got["c2"][1] == 0.0  # sources: no authority
    assert got["s1"][1] == 1.0          # most-cited sink is the max-normalized 1
    assert 0 < got["s2"][1] < 1.0
    assert got["c1"][0] == 1.0          # strongest hub normalizes to 1
    assert 0 < got["c2"][0] <= 1.0


def test_hits_oracle_differential_small(spark, duck):
    """oracle_hits_sql reproduces the DataFrame fixed point digit-for-digit
    on a small cyclic graph (both directions carry mass)."""
    from bullet_spark_spark.operators import graph as gr
    from pyspark.sql import functions as F

    rows = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0), ("a", "c", 3.0)]
    edges = spark.createDataFrame(rows, "src string, dst string, w double")
    got = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in gr.hits(edges, iterations=4).collect()
    )
    vals = ", ".join(f"('{s}', '{d}', {w!r})" for s, d, w in rows)
    sql = gr.oracle_hits_sql(
        f"edges(src, dst, w) AS (VALUES {vals})", iterations=4
    )
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(float(w[1]), abs=1e-12)
        assert g[2] == pytest.approx(float(w[2]), abs=1e-12)
