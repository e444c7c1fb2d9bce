"""Plan contracts for the r11 optimization round's internals changes.

Each optimization that changed an operator's inner plan shape gets its
shape pinned here so a later refactor fails CI, not just the benchmark:

- the rank-test merge (`_merged_rank_counts`, shared by KS and
  Mann-Whitney) and the spearman y-rank-map join carry SHUFFLE_HASH
  hints — distinct-value-space build sides, no skew — so their plans
  must hold ShuffledHashJoin, never SortMergeJoin and never a
  driver-scale broadcast of a near-row-scale map;
- adamic-adar and pagerank accumulate their quantized-term sums as
  LONGs, not decimal(28,0) (bit-identical by the mass-conservation /
  degree-cap bounds documented at the operators);
- `drain_shuffle_partitions` sizes a drain's state shuffle from the
  replayed frame's size, clamped to the session conf, and restores the
  conf afterwards.

These check the INITIAL plan (explicit hints and aggregate expression
types — properties that hold at any scale factor), like
test_plan_contracts.py.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _two_samples(spark):
    a = spark.createDataFrame(
        [(float(i % 17),) for i in range(200)], "x double"
    )
    b = spark.createDataFrame(
        [(float((i * 3) % 23),) for i in range(150)], "x double"
    )
    return a, b


def test_ks_rank_merge_is_shuffled_hash_not_smj(spark):
    from bullet_spark_spark.operators import distribution as dist

    a, b = _two_samples(spark)
    plan = _plan(dist.ks_two_sample(a, b, "x"))
    # the full-outer count merge builds a per-partition hash slice of the
    # value domain; a SortMergeJoin here pays two full sorts feeding
    # straight into the bucketed running sums (r11 fix, commit a6fe73c)
    assert "ShuffledHashJoin FullOuter" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_mannwhitney_rank_merge_is_shuffled_hash_not_smj(spark):
    from bullet_spark_spark.operators import distribution as dist

    a, b = _two_samples(spark)
    plan = _plan(dist.mann_whitney_u(a, b, "x"))
    assert "ShuffledHashJoin FullOuter" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_spearman_y_rank_map_join_is_shuffled_hash(spark, tables):
    from bullet_spark_spark.operators import distribution as dist

    # parquet-backed input (r12): the r11 createDataFrame fixture carried
    # no size statistics (LogicalRDD defaults to spark.sql.defaultSizeInBytes
    # = 8 EiB), so after the lazy-bounds change removed the construct-time
    # cache materialization, every auto join decision in the fixture plan
    # degraded to SortMergeJoin — an artifact of the statless fixture, not
    # of the operator (the real scan-backed plan keeps BroadcastHashJoin
    # for the x map). The contract is about plans over REAL stats.
    df = tables["lineitem"].select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    plan = _plan(dist.spearman_corr(df, "x", "y"))
    # the y rank map is distinct-value-sized (near row-scale for a
    # continuous column): without the hint the planner either broadcasts
    # it (driver-scale build at 100 TB) or sort-merges it; the hint pins
    # the partitioned build at ANY input size (r11 fix, commit d7e6364)
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_adamic_adar_wedge_sum_accumulates_longs(spark):
    from bullet_spark_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [((i * 5) % 19, (i * 13 + 2) % 19) for i in range(70)],
        "src long, dst long",
    )
    plan = _plan(gr.adamic_adar_pairs(edges))
    # r11 (commit 63ae727): sum the exact long numerators directly —
    # the decimal(28,0) accumulator paid a per-row widen/unscale and
    # CodegenFallback on the sum
    assert "sum(FLOOR(" in plan, plan
    assert "sum(cast(FLOOR" not in plan, plan
    assert "decimal(28" not in plan, plan


def test_pagerank_contribution_sum_accumulates_longs(spark, tables):
    from bullet_spark_spark.operators import graph as gr

    edges = (
        tables["orders"]
        .limit(300)
        .select(
            (F.col("o_custkey") % 40).alias("src"),
            (F.col("o_orderkey") % 40).alias("dst"),
            F.lit(1.0).alias("w"),
        )
    )
    ranks = gr.pagerank(edges, iterations=1, checkpoint_final=False)
    plan = _plan(ranks)
    # r11 (commit ba27541): the per-iteration contribution sum is a long
    # sum of floor-quantized terms (bounded ~10^dp by mass conservation),
    # not a decimal(28,0) accumulator. r11 continuation: the terms are
    # FLOOR-projected before a union-with-zeros and summed through ONE
    # aggregate — no decimal anywhere, and the old second per-iteration
    # join (nodes LEFT JOIN broadcast(contribs), a node-sized driver
    # collect every round) is gone from the plan
    assert "FLOOR(" in plan, plan
    assert "sum(__t" in plan, plan
    assert "decimal(28" not in plan, plan
    assert "Union" in plan, plan
    assert "LeftOuter" not in plan, plan


def test_drain_shuffle_partitions_sizes_and_restores(spark):
    from bullet_spark_spark.sources.streaming import drain_shuffle_partitions

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    small = spark.range(100).selectExpr("id", "id % 7 AS k")

    # a tiny replay hits the parallelism floor, never the session default
    with drain_shuffle_partitions(spark, small, min_partitions=2) as n:
        assert n == 2
        assert spark.conf.get("spark.sql.shuffle.partitions") == "2"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev

    # the derived count is CLAMPED to the session conf: even a byte-sized
    # advisory partition (size/1 partitions wanted) cannot raise past it
    with drain_shuffle_partitions(
        spark, small, bytes_per_partition=1, min_partitions=1
    ) as n:
        assert n == int(prev)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
