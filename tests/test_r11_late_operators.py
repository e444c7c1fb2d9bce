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
