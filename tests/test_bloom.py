"""Bloom filter build/probe/merge — the cross-query semi-join pruning
sketch (Bloom 1970). Same mergeable-pre-aggregate posture as the HLL and
Theta tables in operators/sketch.py (bullet-core's DataSketches blob
contract, FilterStreaming.scala:124), applied to set MEMBERSHIP.
"""

from __future__ import annotations

import math

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


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_never_underestimates(spark):
    """est >= true for every key — the Count-Min hard guarantee."""
    df = spark.range(10_000).select((F.col("id") % 100).alias("key"))
    cms = sk.cms_build(df, "key", w=256, d=4)
    keys = df.groupBy("key").agg(F.count(F.lit(1)).alias("true_cnt"))
    got = sk.cms_lookup(keys, "key", cms, w=256, d=4)
    assert got.filter(F.col("freq_est") < F.col("true_cnt")).count() == 0


def test_cms_overestimate_within_epsilon_n(spark):
    """est <= true + eps*N holds for (at least) 1-delta of keys; with
    w=2048 over N=30k the bound is ~40, so check every key at 3x slack."""
    df = spark.range(30_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(997))).alias("key")
    )
    w, d = 2048, 5
    cms = sk.cms_build(df, "key", w=w, d=d)
    keys = df.groupBy("key").agg(F.count(F.lit(1)).alias("true_cnt"))
    got = sk.cms_lookup(keys, "key", cms, w=w, d=d)
    bound = 3.0 * sk.cms_error(w, d)["epsilon"] * 30_000
    assert got.filter(F.col("freq_est") > F.col("true_cnt") + bound).count() == 0


def test_cms_merge_equals_union_build(spark):
    """Per-cell addition merges two sketches into exactly the sketch of
    the concatenated input."""
    a = spark.range(5_000).select((F.col("id") % 50).alias("key"))
    b = spark.range(5_000).select((F.col("id") % 37 + 100).alias("key"))
    w, d = 128, 3
    merged = sk.cms_merge(
        sk.cms_build(a, "key", w=w, d=d), sk.cms_build(b, "key", w=w, d=d)
    )
    direct = sk.cms_build(a.unionByName(b), "key", w=w, d=d)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_weighted(spark):
    """weight_col accumulates weights, not row counts: exact when a key
    never collides (tiny key set vs w)."""
    df = spark.range(10).select(
        (F.col("id") % 2).alias("key"), (F.col("id") + 1).alias("wt")
    )
    cms = sk.cms_build(df, "key", weight_col="wt", w=4096, d=5)
    got = {
        r.key: r.freq_est
        for r in sk.cms_lookup(
            df.select("key").distinct(), "key", cms, w=4096, d=5
        ).collect()
    }
    # key 0 holds ids {0,2,4,6,8} -> weights {1,3,5,7,9} = 25; key 1 = 30
    assert got == {0: 25, 1: 30}


def test_cms_lookup_plan_never_shuffles_lookup_side(spark, tables):
    """The lookup side rides broadcast joins only — same plan property
    as bloom_probe."""
    cms = sk.cms_build(tables["orders"], "o_custkey", w=1024, d=3)
    got = sk.cms_lookup(tables["customer"], "c_custkey", cms, w=1024, d=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sketches_accumulate_over_microbatches(spark, tmp_path):
    """Bloom and Count-Min as STREAMING state: per-micro-batch partial
    sketches folded with bloom_merge/cms_merge across a foreachBatch
    drain equal the one-shot batch build — the partial-combine contract
    bullet-core's sketch blobs satisfy (FilterStreaming.scala:124
    partials, JoinStreaming.scala:126 combine), proven for the two new
    sketch families."""
    from bullet_spark_spark.sources.streaming import file_drip

    df = spark.range(4_000).select((F.col("id") % 257).alias("key"))
    stream = file_drip(spark, df, str(tmp_path), chunks=4)

    m, kb, w, d = 1 << 14, 4, 512, 3
    state = {"bloom": None, "cms": None, "batches": 0}

    def fold(batch, _bid):
        blm = sk.bloom_build(batch, "key", m_bits=m, k=kb).localCheckpoint()
        cms = sk.cms_build(batch, "key", w=w, d=d).localCheckpoint()
        state["bloom"] = (
            blm if state["bloom"] is None else sk.bloom_merge(state["bloom"], blm)
        ).localCheckpoint()
        state["cms"] = (
            cms if state["cms"] is None else sk.cms_merge(state["cms"], cms)
        ).localCheckpoint()
        state["batches"] += 1

    q = stream.writeStream.foreachBatch(fold).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert state["batches"] >= 2  # the drain actually micro-batched

    direct_bloom = sk.bloom_build(df, "key", m_bits=m, k=kb)
    direct_cms = sk.cms_build(df, "key", w=w, d=d)
    assert sorted(map(tuple, state["bloom"].collect())) == sorted(
        map(tuple, direct_bloom.collect())
    )
    assert sorted(map(tuple, state["cms"].collect())) == sorted(
        map(tuple, direct_cms.collect())
    )


def test_cms_join_size_never_underestimates_and_is_tight(spark):
    """Sketch inner product >= true join cardinality always, and within
    the eps*Na*Nb overestimate bound at both a roomy and a colliding
    width (exactness is NOT guaranteed even at w >> keys — birthday
    collisions inside each row always overcount a little)."""
    a = spark.range(6_000).select((F.col("id") % 300).alias("key"))
    b = spark.range(4_000).select((F.col("id") % 200).alias("key"))
    true_size = a.join(b, "key").count()
    for w, d in ((4096, 5), (64, 3)):
        est = sk.cms_join_size_estimate(
            sk.cms_build(a, "key", w=w, d=d), sk.cms_build(b, "key", w=w, d=d)
        ).collect()[0][0]
        assert est >= true_size, (w, d, est, true_size)
        assert est <= true_size + 3.0 * (math.e / w) * 6_000 * 4_000, (w, d, est)


def test_hll_overlap_matrix_within_sketch_error(spark):
    """Inclusion-exclusion overlap estimates land within HLL error of
    truth on a known-overlap construction (A = 0..4999, B = 3000..9999:
    overlap 2000, union 10000), and the pair grid covers every unordered
    pair exactly once."""
    a = spark.range(0, 5_000).select(F.lit("A").alias("src"), F.col("id"))
    b = spark.range(3_000, 10_000).select(F.lit("B").alias("src"), F.col("id"))
    c = spark.range(20_000, 21_000).select(F.lit("C").alias("src"), F.col("id"))
    df = a.unionByName(b).unionByName(c)
    out = {
        (r.group_a, r.group_b): r
        for r in sk.hll_overlap_matrix(df, "src", "id").collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    # rse ~1.6% at lgk=12; the difference estimate is relative to the
    # union — allow 5x rse of the union (~800 on 10k)
    tol = 5 * 1.04 / (2**12) ** 0.5 * 10_000
    assert abs(ab.n_overlap_est - 2_000) <= tol
    assert abs(ab.n_union_est - 10_000) <= tol
    assert abs(ab.jaccard_est - 0.2) <= 0.05
    # disjoint pairs report (near-)zero overlap, never negative
    assert out[("A", "C")].n_overlap_est <= tol
    assert out[("A", "C")].n_overlap_est >= 0
