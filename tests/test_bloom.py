"""Bloom filter build/probe/merge — the cross-query semi-join pruning
sketch (Bloom 1970). Same mergeable-pre-aggregate posture as the HLL and
Theta tables in operators/sketch.py (bullet-core's DataSketches blob
contract, FilterStreaming.scala:124), applied to set MEMBERSHIP.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bullet_spark_spark.operators import sketch as sk


def _build_keys(spark, n, stride=7919, offset=13):
    return spark.range(n).select((F.col("id") * stride + offset).alias("key"))


def test_bloom_no_false_negatives(spark):
    """Every inserted key tests positive — the Bloom filter's hard
    guarantee (false positives allowed, false negatives never)."""
    keys = _build_keys(spark, 5_000)
    bloom = sk.bloom_build(keys, "key", m_bits=1 << 16, k=5)
    probed = sk.bloom_probe(keys, "key", bloom, m_bits=1 << 16, k=5)
    assert probed.filter(~F.col("bloom_maybe")).count() == 0


def test_bloom_fpr_within_bound(spark):
    """A disjoint probe set's positive rate stays near the analytic
    (1-e^(-kn/m))^k bound (3x slack: one-sided sampling wobble)."""
    n, m, k = 5_000, 1 << 16, 5
    keys = _build_keys(spark, n)
    # disjoint: build keys are odd (stride*id+13 with odd stride*id parity
    # varies) — use a separate congruence class entirely
    probe = spark.range(20_000).select((F.col("id") * 104729 + 104717).alias("key"))
    probe = probe.join(keys, "key", "left_anti")  # enforce disjointness
    bloom = sk.bloom_build(keys, "key", m_bits=m, k=k)
    got = sk.bloom_probe(probe, "key", bloom, m_bits=m, k=k)
    n_probe = probe.count()
    fp = got.filter(F.col("bloom_maybe")).count()
    expected = sk.bloom_fpr(n, m, k)
    assert fp / n_probe <= max(3.0 * expected, 0.01), (fp, n_probe, expected)


def test_bloom_merge_equals_union_build(spark):
    """bit_or-merging two filters is EXACTLY the filter of the unioned
    key sets — the lossless-union property that makes per-shard filters
    roll up to a corpus filter."""
    a = _build_keys(spark, 2_000)
    b = spark.range(2_000).select((F.col("id") * 7919 + 500_000).alias("key"))
    m, k = 1 << 15, 4
    merged = sk.bloom_merge(
        sk.bloom_build(a, "key", m_bits=m, k=k),
        sk.bloom_build(b, "key", m_bits=m, k=k),
    )
    direct = sk.bloom_build(a.unionByName(b), "key", m_bits=m, k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_prune_exact_equals_left_semi(spark, tables):
    """exact=True pruning returns exactly the plain left_semi join —
    false positives removed by the trailing verification join."""
    keys = tables["customer"].filter(F.col("c_custkey") % 17 == 0).select(
        F.col("c_custkey").alias("o_custkey")
    )
    got = sk.bloom_prune_join(
        tables["orders"], keys, "o_custkey", target_fpr=0.05, exact=True
    )
    want = tables["orders"].join(keys.distinct(), "o_custkey", "left_semi")
    assert sorted(r.o_orderkey for r in got.select("o_orderkey").collect()) == sorted(
        r.o_orderkey for r in want.select("o_orderkey").collect()
    )


def test_bloom_probe_plan_never_shuffles_probe_side(spark, tables):
    """The probe side rides broadcast joins only: no SortMergeJoin, and
    every bit test is a BroadcastHashJoin over the words frame. This is
    the plan property that makes the operator worth having at 100 TB."""
    keys = tables["customer"].limit(500).select(
        F.col("c_custkey").alias("o_custkey")
    )
    bloom = sk.bloom_build(keys, "o_custkey", m_bits=1 << 14, k=3)
    probed = sk.bloom_probe(
        tables["orders"], "o_custkey", bloom, m_bits=1 << 14, k=3
    ).filter(F.col("bloom_maybe"))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_null_keys(spark):
    """NULL keys are skipped at build and test false at probe — a
    semi-join never matches NULL."""
    keys = spark.range(100).select(
        F.when(F.col("id") < 50, F.col("id")).alias("key")
    )
    m, k = 1 << 12, 3
    bloom = sk.bloom_build(keys, "key", m_bits=m, k=k)
    probed = sk.bloom_probe(keys, "key", bloom, m_bits=m, k=k)
    nulls = probed.filter(F.col("key").isNull())
    assert nulls.count() == 50
    assert nulls.filter(F.col("bloom_maybe")).count() == 0


def test_bloom_size_formula():
    """bloom_size hits the textbook optimum (~9.6 bits/key, k=7 at 1%)
    and the resulting fpr lands at or below target."""
    m, k = sk.bloom_size(100_000, 0.01)
    assert 9.0 <= m / 100_000 <= 10.5
    assert k == 7
    assert sk.bloom_fpr(100_000, m, k) <= 0.0105
