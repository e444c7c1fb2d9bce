"""Regression tests for the round-7 ADVICE.md items (fixed in round 8).

- sim_cluster_silhouette k=1 guard: vectors with no second centroid
  candidate are DROPPED (matching the oracle's inner join on r=2) rather
  than contributing NULL silhouettes that deflate the mean denominator;
- kmeans_init_farthest excludes already-chosen ids and stops early when
  every remaining point duplicates a chosen centroid (<k distinct
  vectors), so it can never emit duplicate centroid vectors under
  distinct cluster labels;
- hilbert_key row preservation: a row with a NULL dimension keeps its
  place with a NULL hkey (LEFT lookup join), matching zorder_key's
  semantics instead of silently disappearing;
- scale_zorder3_stats decimal->long conversion is floor() in BOTH
  engines (Spark cast('long') truncates, DuckDB CAST AS BIGINT rounds —
  a latent divergence for fractional dimensions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bullet_spark_spark.operators import layout as lay
from bullet_spark_spark.operators import similarity as sim


# ---------------------------------------------------------------------------
# silhouette k=1 guard (ADVICE __spark_entry__.py:5862)
# ---------------------------------------------------------------------------

def test_silhouette_top2_drops_single_candidate_vectors(spark):
    """With ONE centroid there is no nearest-other prototype: the top-2
    slice has size 1 and the vector must not reach the scoring stage
    (the oracle's `JOIN rk b ON b.r = 2` drops it)."""
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0], "a"), (2, [1.0, 1.0], "a")],
        "vec_id long, embedding array<double>, label string",
    )
    cents = sim.group_centroids(emb, "label", "embedding")
    assert cents.count() == 1
    d = sim.centroid_distances(emb, cents, "vec_id", "embedding")
    top2 = d.groupBy("vec_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("d2", "cand"))), 1, 2
        ).alias("t2")
    ).where(F.size("t2") == 2)
    assert top2.count() == 0  # every vector dropped, mean not deflated


def test_silhouette_top2_keeps_two_candidate_vectors(spark):
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0], "a"), (2, [4.0, 4.0], "b"), (3, [0.1, 0.1], "a")],
        "vec_id long, embedding array<double>, label string",
    )
    cents = sim.group_centroids(emb, "label", "embedding")
    d = sim.centroid_distances(emb, cents, "vec_id", "embedding")
    top2 = d.groupBy("vec_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("d2", "cand"))), 1, 2
        ).alias("t2")
    ).where(F.size("t2") == 2)
    assert top2.count() == 3


# ---------------------------------------------------------------------------
# kmeans_init_farthest duplicate-centroid guard (ADVICE similarity.py:1977)
# ---------------------------------------------------------------------------

def test_farthest_init_stops_early_on_duplicate_vectors(spark):
    """Only 2 distinct vectors but k=4: the traversal must stop after the
    2 distinct centroids instead of re-selecting the smallest id and
    emitting duplicate centroid vectors under new cluster labels."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [0.0, 0.0]), (4, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = sim.kmeans_init_farthest(df, "vec_id", "embedding", k=4)
    rows = sorted(cents.collect(), key=lambda r: r["cluster"])
    assert len(rows) == 2
    vecs = {tuple(r["centroid"]) for r in rows}
    assert vecs == {(0.0, 0.0), (1.0, 1.0)}  # no duplicate centroid vectors
    assert [r["cluster"] for r in rows] == [0, 1]


def test_farthest_init_full_k_distinct(spark):
    df = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(1, 7)],
        "vec_id long, embedding array<double>",
    )
    cents = sim.kmeans_init_farthest(df, "vec_id", "embedding", k=3)
    rows = sorted(cents.collect(), key=lambda r: r["cluster"])
    assert len(rows) == 3
    # seed = smallest id (1); next = farthest from it (6); then the point
    # maximizing min-distance to {1, 6} — the midpoint-ish 3 or 4; exact
    # decimal distances tie-break to the smaller id.
    assert tuple(rows[0]["centroid"]) == (1.0, -1.0)
    assert tuple(rows[1]["centroid"]) == (6.0, -6.0)
    assert len({tuple(r["centroid"]) for r in rows}) == 3


def test_farthest_init_never_reselects_chosen_id(spark):
    # 3 distinct vectors, k=3: every id must appear exactly once even
    # though round 3's candidate pool has shrunk to a single row.
    df = spark.createDataFrame(
        [(10, [0.0]), (20, [5.0]), (30, [9.0])],
        "vec_id long, embedding array<double>",
    )
    cents = sim.kmeans_init_farthest(df, "vec_id", "embedding", k=3)
    vecs = sorted(tuple(r["centroid"]) for r in cents.collect())
    assert vecs == [(0.0,), (5.0,), (9.0,)]


# ---------------------------------------------------------------------------
# hilbert_key NULL-dimension row preservation (ADVICE layout.py:283)
# ---------------------------------------------------------------------------

def test_hilbert_key_preserves_null_dimension_rows(spark):
    df = spark.createDataFrame(
        [(1, 10, 10), (2, None, 20), (3, 30, 30)],
        "id long, x long, y long",
    )
    out = lay.hilbert_key(df, ["x", "y"], bits=2)
    rows = {r["id"]: r["hkey"] for r in out.collect()}
    assert set(rows) == {1, 2, 3}  # no row dropped
    assert rows[2] is None  # NULL dim -> NULL key (zorder_key parity)
    assert rows[1] is not None and rows[3] is not None


def test_hilbert_key_null_semantics_match_zorder(spark):
    df = spark.createDataFrame(
        [(1, 1, 1), (2, None, 2), (3, 3, None), (4, 4, 4)],
        "id long, x long, y long",
    )
    h = {r["id"]: r["hkey"] for r in lay.hilbert_key(df, ["x", "y"], bits=2).collect()}
    z = {r["id"]: r["zkey"] for r in lay.zorder_key(df, ["x", "y"], bits=2).collect()}
    assert set(h) == set(z) == {1, 2, 3, 4}
    for i in (1, 2, 3, 4):
        assert (h[i] is None) == (z[i] is None)


# ---------------------------------------------------------------------------
# scale_zorder3_stats floor parity (ADVICE __spark_entry__.py:2343)
# ---------------------------------------------------------------------------

def test_zorder3_uses_floor_in_both_engines():
    import __spark_entry__ as entry

    sql = entry.oracle_sql()["scale_zorder3_stats"]
    assert "CAST(floor(l_quantity) AS BIGINT)" in sql
    assert "CAST(l_quantity AS BIGINT)" not in sql


def test_floor_cast_matches_duckdb_on_fractional_decimals(spark):
    """The actual divergence the advisory flagged: 2.5 rounds to 2 under
    DuckDB CAST-to-BIGINT? No — it rounds to 2 or 3 per banker's/half-up;
    Spark cast truncates to 2. floor() is 2 in both, always."""
    import duckdb

    vals = ["2.5", "3.5", "-1.5", "7.9", "-0.1"]
    sdf = spark.createDataFrame(
        [(v,) for v in vals], "s string"
    ).select(F.floor(F.col("s").cast("decimal(12,2)")).cast("long").alias("q"))
    spark_out = [r["q"] for r in sdf.collect()]
    duck_out = [
        duckdb.sql(
            f"SELECT CAST(floor(CAST('{v}' AS DECIMAL(12,2))) AS BIGINT)"
        ).fetchone()[0]
        for v in vals
    ]
    assert spark_out == duck_out == [2, 3, -2, 7, -1]
