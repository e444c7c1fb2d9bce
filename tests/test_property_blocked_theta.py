"""Property-based checks for the two round-6 operator families.

1. ``cosine_pairs_blocked`` must equal the crossJoin exact path on
   adversarially-shaped corpora (duplicate vectors, zero vectors, single
   vector, id gaps) for ANY block count — the grid is a layout, never a
   semantics knob.
2. Theta (bottom-k KMV) sketches: union over ANY partition of the rows
   equals the direct sketch (the mergeability law), and the estimate is
   exact below saturation.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bullet_spark_spark.operators import similarity as sim
from bullet_spark_spark.operators import sketch as sk

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def vec_corpus(draw):
    n = draw(st.integers(2, 12))
    dim = draw(st.sampled_from([2, 3, 8]))
    rng = np.random.RandomState(draw(st.integers(0, 10_000)))
    rows = []
    for i in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0 and rows:
            v = rows[-1][1]  # exact duplicate of previous
        elif kind == 1:
            v = [0.0] * dim  # zero vector (norm guard)
        else:
            v = rng.randn(dim).tolist()
        rows.append((i * draw(st.integers(1, 3)), v))  # id gaps
    # dedupe ids (multiplier can collide)
    seen, out = set(), []
    for i, v in rows:
        while i in seen:
            i += 1
        seen.add(i)
        out.append((i, v))
    return out, dim


@given(vec_corpus(), st.integers(1, 5), st.sampled_from([0.3, 0.7, 0.95]))
@settings(**_SETTINGS)
def test_blocked_equals_exact_any_grid(spark, data, n_blocks, threshold):
    rows, dim = data
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.id_a, r.id_b, r.sim)
        for r in sim.cosine_near_dup_pairs(
            df, threshold=threshold, exact=True
        ).collect()
    }
    blocked = {
        (r.id_a, r.id_b, r.sim)
        for r in sim.cosine_pairs_blocked(
            df, threshold, n_blocks=n_blocks
        ).collect()
    }
    assert exact == blocked


@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=80),
    st.integers(2, 5),
    st.sampled_from([4, 16, 64]),
)
@settings(**_SETTINGS)
def test_theta_union_law_and_exactness(spark, keys, n_parts, k):
    """Bottom-k union law: sketching per arbitrary partition then merging
    equals sketching everything at once; below saturation the estimate is
    the exact distinct count."""
    rows = [(i % n_parts, int(v)) for i, v in enumerate(keys)]
    df = spark.createDataFrame(rows, "part int, key long")
    fine = sk.theta_group_sketches(df, ["part"], "key", k=k)
    merged = sk.theta_merge_slices(fine, [], k=k).collect()[0]["n_distinct_est"]
    direct = sk.theta_merge_slices(
        sk.theta_group_sketches(df.withColumn("g", F.lit(1)), ["g"], "key", k=k),
        [],
        k=k,
    ).collect()[0]["n_distinct_est"]
    assert merged == direct
    n_distinct = len(set(keys))
    if n_distinct < k:
        assert merged == float(n_distinct)


# ---------------------------------------------------------------------------
# Bloom / Count-Min property laws (round-6 late additions)
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=60),
    st.lists(st.integers(-(2**40), 2**40), min_size=0, max_size=60),
    st.sampled_from([(1 << 10, 3), (1 << 14, 5)]),
)
@settings(**_SETTINGS)
def test_bloom_laws_any_keys(spark, keys_a, keys_b, params):
    """For ANY key sets and parameters: (1) no false negatives, (2)
    merge of two builds == build of the union — the two laws that make
    the filter safe to use as a semi-join pre-filter."""
    m, k = params
    a = spark.createDataFrame([(x,) for x in keys_a], "key long")
    b = (
        spark.createDataFrame([(x,) for x in keys_b], "key long")
        if keys_b
        else spark.createDataFrame([], "key long")
    )
    bloom_a = sk.bloom_build(a, "key", m_bits=m, k=k)
    # law 1: every inserted key tests positive
    probed = sk.bloom_probe(a, "key", bloom_a, m_bits=m, k=k)
    assert probed.filter(~F.col("bloom_maybe")).count() == 0
    # law 2: merge == union build (frame-exact)
    merged = sk.bloom_merge(bloom_a, sk.bloom_build(b, "key", m_bits=m, k=k))
    direct = sk.bloom_build(a.unionByName(b), "key", m_bits=m, k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=80),
    st.sampled_from([(16, 2), (256, 4)]),
)
@settings(**_SETTINGS)
def test_cms_laws_any_multiset(spark, keys, params):
    """For ANY multiset (heavy collisions at w=16 included): estimates
    never undercount the true multiplicity, and a 2-way split merged
    equals the direct build."""
    w, d = params
    df = spark.createDataFrame([(x,) for x in keys], "key long")
    cms = sk.cms_build(df, "key", w=w, d=d)
    truth = df.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    got = sk.cms_lookup(truth, "key", cms, w=w, d=d)
    assert got.filter(F.col("freq_est") < F.col("n")).count() == 0
    half = len(keys) // 2
    p1 = spark.createDataFrame([(x,) for x in keys[:half]], "key long")
    p2 = spark.createDataFrame([(x,) for x in keys[half:]], "key long")
    if half:
        merged = sk.cms_merge(
            sk.cms_build(p1, "key", w=w, d=d), sk.cms_build(p2, "key", w=w, d=d)
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, cms.collect())
        )
