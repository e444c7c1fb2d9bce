"""Round-11 operator hardening: hot-group-skew-safe per-group quantiles
(range-partitioned in-group rank — the column_stats posture), interval-
overlap width auto-derivation + long-split (tested in test_r10_additions),
and the skewed-fixture certification paths (VERDICT r10 tasks 5-7)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import distribution as dist


def _np_quantile(vals, p):
    # numpy 'linear' == DuckDB quantile_cont == the engine's h=(n-1)p rule
    return float(np.quantile(np.array(vals, dtype="float64"), p, method="linear"))


def test_group_quantiles_hot_group_skew(spark):
    """One group holds 90% of the rows (the hot-language corpus shape the
    r11 range-partitioned rank exists for): values bit-identical to the
    sequential h=(n-1)p interpolation on every group, hot or cold."""
    rng = np.random.RandomState(7)
    hot = [("hot", float(v)) for v in rng.lognormal(3.0, 1.0, 9000)]
    cold = [
        (f"cold{i % 3}", float(v))
        for i, v in enumerate(rng.normal(50.0, 5.0, 1000))
    ]
    df = spark.createDataFrame(hot + cold, "g string, v double")
    probs = [0.1, 0.5, 0.9, 0.99]
    got = {
        (r["g"], r["prob"]): r["value"]
        for r in dist.group_quantiles(df, ["g"], "v", probs).collect()
    }
    by_g: dict[str, list[float]] = {}
    for g, v in hot + cold:
        by_g.setdefault(g, []).append(v)
    assert len(got) == len(by_g) * len(probs)
    for g, vals in by_g.items():
        for p in probs:
            assert got[(g, p)] == pytest.approx(
                round(_np_quantile(vals, p), 6), abs=1e-6
            ), (g, p)


def test_group_quantiles_multi_group_cols_and_ties(spark):
    """Composite group key + heavy value ties (the rank tiebreak must not
    change the interpolated value) + a 1-row group (h=0 everywhere)."""
    rows = (
        [("a", "x", 1.0)] * 5
        + [("a", "x", 2.0)] * 5
        + [("a", "y", 7.0)]
        + [("b", "x", float(i)) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "g1 string, g2 string, v double")
    got = {
        (r["g1"], r["g2"], r["prob"]): r["value"]
        for r in dist.group_quantiles(df, ["g1", "g2"], "v", [0.5]).collect()
    }
    assert got[("a", "x", 0.5)] == pytest.approx(1.5, abs=1e-9)
    assert got[("a", "y", 0.5)] == pytest.approx(7.0, abs=1e-9)
    assert got[("b", "x", 0.5)] == pytest.approx(4.5, abs=1e-9)


def test_group_quantiles_no_pergroup_window(spark):
    """Plan shape: the physical plan must contain NO window partitioned
    by the group alone (the single-task-per-group funnel); every window
    runs over (group, range-partition-id) slices."""
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(100)], "g string, v double"
    )
    plan = dist.group_quantiles(df, ["g"], "v", [0.5])._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            # physical Window nodes print as:
            #   Window [row_number() ... partition spec: [g#1, __pid#2] ...
            # assert __pid rides every partition spec
            if "row_number" in line:
                assert "__pid" in line, line


# ---------------------------------------------------------------------------
# MaxSim late interaction
# ---------------------------------------------------------------------------

def test_maxsim_prefers_partial_match_over_diluted_cosine(spark):
    """The signature MaxSim property: a doc matching ONE query sub-vector
    perfectly outranks a doc that is mediocre everywhere, even when
    single-vector cosine would prefer the latter."""
    from bullet_spark_spark.operators import similarity as sim

    dim, m = 8, 4  # slices of 2
    q = [1.0, 0.0] + [0.0] * 6
    # doc 1: perfect on slice 0, orthogonal elsewhere
    d1 = [1.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0]
    # doc 2: weakly aligned on every slice
    d2 = [0.5, 0.5] * 4
    corpus = spark.createDataFrame(
        [(1, d1), (2, d2)], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(100, q)], "query_id long, query_vec array<double>"
    )
    got = {
        r["vec_id"]: (r["score"], r["rank"])
        for r in sim.maxsim_topk(corpus, queries, k=2, n_subvectors=m).collect()
    }
    # d1: slice0 cos=1 vs q slice0; q slices 1-3 are zero vectors -> cos 0
    assert got[1][0] == pytest.approx(1.0, abs=1e-6)
    assert got[1][1] == 1
    # d2 against q slice0 ([1,0] vs [.5,.5]) = cos 45deg ~ 0.7071
    assert got[2][0] == pytest.approx(0.707107, abs=1e-5)


def test_maxsim_sequential_replica(spark):
    """Random vectors: scores equal the numpy replica of
    sum_i max_j cos(q_i, d_j) on every pair."""
    from bullet_spark_spark.operators import similarity as sim

    rng = np.random.RandomState(3)
    dim, m = 16, 4
    docs = [(i, [float(x) for x in rng.randn(dim)]) for i in range(20)]
    qs = [(100 + i, [float(x) for x in rng.randn(dim)]) for i in range(3)]
    corpus = spark.createDataFrame(docs, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        qs, "query_id long, query_vec array<double>"
    )
    got = {
        (r["query_id"], r["vec_id"]): r["score"]
        for r in sim.maxsim_topk(corpus, queries, k=20, n_subvectors=m).collect()
    }

    def np_maxsim(qv, dv):
        s = 0.0
        sub = dim // m
        for i in range(m):
            qi = np.array(qv[i * sub:(i + 1) * sub])
            best = max(
                float(
                    qi @ np.array(dv[j * sub:(j + 1) * sub])
                    / (np.linalg.norm(qi) * np.linalg.norm(dv[j * sub:(j + 1) * sub]))
                )
                for j in range(m)
            )
            s += best
        return round(s, 6)

    for qid, qv in qs:
        for did, dv in docs:
            assert got[(qid, did)] == pytest.approx(np_maxsim(qv, dv), abs=2e-6)


def test_maxsim_rejects_indivisible_dim(spark):
    from bullet_spark_spark.operators import similarity as sim

    corpus = spark.createDataFrame(
        [(1, [1.0] * 6)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="divisible"):
        sim.maxsim_topk(corpus, corpus.selectExpr(
            "vec_id as query_id", "embedding as query_vec"), n_subvectors=4)


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

def test_dsir_weights_rank_target_like_docs_higher(spark):
    """Docs drawn from the target vocabulary get higher logweight than
    docs from a disjoint vocabulary; mixed docs sit between."""
    from bullet_spark_spark.operators import text as tx

    target_rows = [(100 + i, "alpha beta gamma delta epsilon") for i in range(20)]
    raw_rows = [
        (1, "alpha beta gamma alpha beta"),        # target-like
        (2, "zeta eta theta iota kappa"),           # off-target
        (3, "alpha beta zeta eta gamma"),           # mixed
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(target_rows, "doc_id long, text string")
    # source = raw + enough off-target mass that the ratio separates
    got = {
        r["doc_id"]: r["logweight"]
        for r in tx.dsir_importance_weights(raw, tgt, n_buckets=64).collect()
    }
    assert got[1] > got[3] > got[2]
    n_tok = {
        r["doc_id"]: r["n_tokens"]
        for r in tx.dsir_importance_weights(raw, tgt, n_buckets=64).collect()
    }
    assert n_tok == {1: 5, 2: 5, 3: 5}


def test_dsir_weights_sequential_replica(spark):
    """Exact replica: hashed-bucket counts, add-1 smoothing, rounded
    lambda, decimal sum — computed sequentially in Python."""
    import hashlib

    from bullet_spark_spark.operators import text as tx

    B = 32
    raw_rows = [(1, "a b b c"), (2, "c d d d"), (3, "x y z")]
    tgt_rows = [(10, "a b c c"), (11, "b b a")]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B

    from collections import Counter

    ct = Counter(bucket(t) for _, s in tgt_rows for t in s.split())
    cs = Counter(bucket(t) for _, s in raw_rows for t in s.split())
    nt, ns = sum(ct.values()), sum(cs.values())
    lam = {
        f: round(
            __import__("math").log((ct.get(f, 0) + 1.0) / (nt + B))
            - __import__("math").log((cs.get(f, 0) + 1.0) / (ns + B)),
            6,
        )
        for f in set(ct) | set(cs)
    }
    want = {}
    for did, s in raw_rows:
        c = Counter(bucket(t) for t in s.split())
        want[did] = round(sum(n * lam[f] for f, n in c.items()), 6)
    got = {
        r["doc_id"]: r["logweight"]
        for r in tx.dsir_importance_weights(raw, tgt, n_buckets=B).collect()
    }
    for did in want:
        assert got[did] == pytest.approx(want[did], abs=1e-6), did


# ---------------------------------------------------------------------------
# SemDeDup cluster-local pruning
# ---------------------------------------------------------------------------

def test_semdedup_prunes_within_cluster_only(spark):
    """Two tight clusters: near-dups INSIDE a cluster collapse to the
    min id; an equally-similar pair straddling clusters survives (the
    paper's cluster-local contract)."""
    from bullet_spark_spark.operators import dedup as dd
    from bullet_spark_spark.operators import similarity as sim

    # cluster A around e0, cluster B around e1 (orthogonal)
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], "A"),
        (2, [0.99, 0.01, 0.0, 0.0], "A"),   # near-dup of 1 (same cluster)
        (3, [0.0, 1.0, 0.0, 0.0], "B"),
        (4, [0.01, 0.99, 0.0, 0.0], "B"),   # near-dup of 3 (same cluster)
        (5, [0.0, 0.0, 1.0, 0.0], "B"),     # distinct within B
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    cents = sim.group_centroids(df)
    got = sorted(
        r["vec_id"]
        for r in dd.semdedup_survivors(df, cents, threshold=0.95).collect()
    )
    assert got == [1, 3, 5]


# ---------------------------------------------------------------------------
# Gumbel-top-k + the _U_DENOM shadowing regression
# ---------------------------------------------------------------------------

def test_weighted_key_uniform_spans_unit_interval(spark):
    """Regression (r11): a second module-level `_U_DENOM = float(1 << 60)`
    SHADOWED weighted_key's documented 16^13+1 denominator, squashing the
    ES uniforms into (0, 0.0039] — a constant −ln(256) shift on ln(u)
    that distorts cross-weight comparisons. The uniform must span (0, 1]."""
    from bullet_spark_spark.operators import sampling as smp
    from pyspark.sql import functions as F

    df = spark.range(2000).select(F.col("id").alias("k"))
    u = (
        F.conv(F.substring(smp.sample_hash(F.col("k"), 0), 1, 13), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(smp._U_DENOM)
    stats = df.select(F.min(u).alias("lo"), F.max(u).alias("hi")).first()
    assert stats["hi"] > 0.99  # would be <= 0.0039 under the shadowed 2^60
    assert 0.0 < stats["lo"] < 0.01
    # and the bootstrap's own 60-bit denominator is untouched
    assert smp._U_DENOM_60 == float(1 << 60)
    assert smp._U_DENOM == float(16**13 + 1)


def test_gumbel_topk_selects_proportional_to_exp_logweight(spark):
    """Inclusion frequency rises with logweight: weight-4-nats rows
    dominate a 100-of-1000 selection against weight-0 rows."""
    from bullet_spark_spark.operators import sampling as smp

    rows = [(i, 4.0 if i < 500 else 0.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, lw double")
    got = smp.gumbel_topk_select(df, "id", "lw", n=100).collect()
    heavy = sum(1 for r in got if r["lw"] == 4.0)
    assert heavy > 85  # e^4 ~ 55x relative odds
    assert [r["rank"] for r in got] == sorted(r["rank"] for r in got)
    assert len(got) == 100


def test_gumbel_topk_never_leaves_log_space(spark):
    """Log-weights far outside exp()'s double range still select fine —
    the whole point of the Gumbel key over exp(lw) ES weights."""
    from bullet_spark_spark.operators import sampling as smp

    rows = [(1, 900.0), (2, -900.0), (3, 800.0), (4, -800.0)]
    df = spark.createDataFrame(rows, "id long, lw double")
    got = [r["id"] for r in smp.gumbel_topk_select(df, "id", "lw", n=2).collect()]
    assert got == [1, 3]  # the two high-logweight rows, rank order


def test_gumbel_by_group_quota_and_order(spark):
    from bullet_spark_spark.operators import sampling as smp

    rows = [(i, "a" if i % 2 == 0 else "b", float(i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, lw double")
    got = smp.gumbel_topk_by_group(df, "id", "lw", ["g"], n_per_group=5).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append(r["rank"])
    assert set(by_g) == {"a", "b"}
    assert sorted(by_g["a"]) == [1, 2, 3, 4, 5]
    assert sorted(by_g["b"]) == [1, 2, 3, 4, 5]


def test_dsir_bigram_features_separate_collocations(spark):
    """Bigram features distinguish docs whose unigram distributions are
    IDENTICAL: same words, different adjacency."""
    from bullet_spark_spark.operators import text as tx

    tgt = spark.createDataFrame(
        [(100 + i, "prime minister speaks today") for i in range(10)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "prime minister speaks today"),   # target word ORDER
            (2, "minister prime today speaks"),   # same words, shuffled
        ],
        "doc_id long, text string",
    )
    uni = {
        r["doc_id"]: r["logweight"]
        for r in tx.dsir_importance_weights(raw, tgt, n_buckets=256).collect()
    }
    bi = {
        r["doc_id"]: r["logweight"]
        for r in tx.dsir_importance_weights(
            raw, tgt, n_buckets=256, ngram_max=2
        ).collect()
    }
    # unigram-only cannot separate them; bigrams rank the ordered doc higher
    assert uni[1] == pytest.approx(uni[2], abs=1e-9)
    assert bi[1] > bi[2]


def test_maxsim_candidates_path_matches_cross_on_given_pairs(spark):
    """maxsim_topk(candidates=...) scores exactly the given pair space
    with the same scores as the crossJoin path."""
    from bullet_spark_spark.operators import similarity as sim

    rng = np.random.RandomState(11)
    docs = [(i, [float(x) for x in rng.randn(8)]) for i in range(12)]
    qs = [(100, [float(x) for x in rng.randn(8)])]
    corpus = spark.createDataFrame(docs, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(qs, "query_id long, query_vec array<double>")
    full = {
        (r["query_id"], r["vec_id"]): r["score"]
        for r in sim.maxsim_topk(corpus, queries, k=12, n_subvectors=4).collect()
    }
    cands = spark.createDataFrame(
        [(100, i) for i in (1, 3, 5, 7)], "query_id long, vec_id long"
    )
    got = sim.maxsim_topk(
        corpus, queries, k=12, n_subvectors=4, candidates=cands
    ).collect()
    assert {r["vec_id"] for r in got} == {1, 3, 5, 7}
    for r in got:
        assert r["score"] == pytest.approx(full[(100, r["vec_id"])], abs=1e-9)


def test_maxsim_slice_candidates_contain_best_slice_matches(spark):
    """A doc whose ONE slice matches a query slice perfectly must be
    retrieved by the per-slice stage (the ColBERT retrieval property)."""
    from bullet_spark_spark.operators import similarity as sim

    rng = np.random.RandomState(5)
    docs = [(i, [float(x) for x in rng.randn(8)]) for i in range(30)]
    q = [float(x) for x in rng.randn(8)]
    planted = q[2:4]  # matches query slice 1 exactly
    docs.append((999, [0.0, 0.0] + planted + [0.0] * 4))
    corpus = spark.createDataFrame(docs, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(7, q)], "query_id long, query_vec array<double>"
    )
    cands = {
        r["vec_id"]
        for r in sim.maxsim_slice_candidates(
            corpus, queries, k_per_slice=8, n_subvectors=4, num_planes=2
        ).collect()
    }
    assert 999 in cands
