"""Property-based differential for the engine-portable md5 minhash
pipeline: random small corpora (with forced duplicate/near-duplicate
structure) run through Spark's minhash_dedup_pairs_md5 AND the DuckDB
SQL construction, and must emit IDENTICAL (id_a, id_b, est_jaccard)
rows — signatures, banding, candidates, verify, and threshold all pinned
at once, on adversarially-shaped inputs the fixture corpus can't cover
(empty docs, 1-2 word docs, heavy repetition, shared prefixes)."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bullet_spark_spark.operators import dedup as dd

_WORDS = ["alpha", "beta", "gamma", "delta", "join", "scan", "row", "batch"]


@st.composite
def corpus(draw):
    """3-10 docs of 0-12 words from a tiny vocabulary (forces shingle
    collisions), plus one guaranteed duplicated doc when possible."""
    n = draw(st.integers(3, 10))
    docs = []
    for i in range(n):
        words = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12))
        docs.append((i, " ".join(words)))
    if n >= 2 and docs[0][1]:
        docs[-1] = (docs[-1][0], docs[0][1])  # exact duplicate pair
    return docs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_minhash_md5_random_corpora_match_duckdb(spark, data):
    pairs = dd.minhash_dedup_pairs_md5(
        spark.createDataFrame(data, ["doc_id", "text"]),
        "doc_id",
        "text",
        threshold=0.25,
        num_hashes=16,
        bands=8,
    )
    got = sorted(
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 6)) for r in pairs.collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", data)
    expected = sorted(
        tuple(r)
        for r in con.execute(
            r"""WITH d AS (
             SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
                      FOR i IN range(1, greatest(len(toks) - 2, 0) + 1)]) AS shingles
             FROM (SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
                   FROM documents)),
           e AS (SELECT doc_id, unnest(shingles) AS sh FROM d),
           h AS (SELECT doc_id, j, min(md5(CAST(j AS VARCHAR) || ':' || sh)) AS mh
                 FROM e CROSS JOIN range(16) r(j) GROUP BY doc_id, j),
           bk AS (SELECT doc_id, j // 2 AS b, string_agg(mh, '|' ORDER BY j) AS bkey
                  FROM h GROUP BY doc_id, j // 2),
           cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                    FROM bk a JOIN bk b
                    ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
           est AS (SELECT c.id_a, c.id_b,
                          sum(CASE WHEN ha.mh = hb.mh THEN 1 ELSE 0 END) / 16.0 AS ej
                   FROM cand c
                   JOIN h ha ON ha.doc_id = c.id_a
                   JOIN h hb ON hb.doc_id = c.id_b AND hb.j = ha.j
                   GROUP BY c.id_a, c.id_b)
           SELECT id_a, id_b, round(ej, 6) FROM est WHERE ej >= 0.25"""
        ).fetchall()
    )
    con.close()
    assert got == expected


# -- connected components: differential vs union-find on random graphs ------


@st.composite
def edge_list(draw):
    """Random small undirected graphs, edge-dense enough to form chains."""
    n_nodes = draw(st.integers(2, 12))
    n_edges = draw(st.integers(0, 16))
    edges = []
    for _ in range(n_edges):
        a = draw(st.integers(0, n_nodes - 1))
        b = draw(st.integers(0, n_nodes - 1))
        if a != b:
            edges.append((min(a, b), max(a, b)))
    return sorted(set(edges))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_list())
def test_connected_components_equals_union_find(spark, edges):
    """The distributed min-label-propagation loop equals a union-find on
    arbitrary random graphs — chains, cliques, isolated pairs, multi-edges."""
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    # driver_uf_threshold=0 forces the DISTRIBUTED loop — the 100 TB path
    # keeps its differential coverage now that small graphs default to
    # the in-driver fast path (r11)
    got = {
        r["node"]: r["comp"]
        for r in dd.connected_components(
            pairs, driver_uf_threshold=0
        ).collect()
    }
    assert got == expected
    # and the r11 fast path (default threshold) produces the identical map
    got_fast = {
        r["node"]: r["comp"] for r in dd.connected_components(pairs).collect()
    }
    assert got_fast == expected


def test_connected_components_long_chain(spark):
    """Regression: a 30-node path graph (diameter 29) through the
    DISTRIBUTED loop — per-iteration lineage must be truncated
    (localCheckpoint), or the compounding plan tree overflows the JVM
    stack during analysis around diameter 8."""
    edges = [(i, i + 1) for i in range(29)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    comps = dd.connected_components(
        df, max_iterations=40, driver_uf_threshold=0
    ).collect()
    assert {r["comp"] for r in comps} == {0}
    assert len(comps) == 30
