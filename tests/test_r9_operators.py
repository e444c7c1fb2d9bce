"""Round-9 operator additions: Zipf OLS fit, unigram KL drift,
shard integrity manifest, Poisson-bootstrap CI."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bullet_spark_spark.operators import sampling as smp
from bullet_spark_spark.operators import text as tx


# ---------------------------------------------------------------------------
# zipf_fit
# ---------------------------------------------------------------------------

def _ols_reference(pairs):
    """(x, y) OLS with the operator's rounding discipline."""
    xs = [round(math.log(r), 8) for r, _ in pairs]
    ys = [round(math.log(c), 8) for _, c in pairs]
    n = float(len(pairs))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(round(x * y, 8) for x, y in zip(xs, ys))
    sxx = sum(round(x * x, 8) for x in xs)
    syy = sum(round(y * y, 8) for y in ys)
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return (
        round(cov / varx, 6),
        round((sy - (cov / varx) * sx) / n, 6),
        round(cov * cov / (varx * vary), 6),
    )


def test_zipf_fit_matches_hand_ols(spark):
    # frequencies 8/4/2/1 for tokens a/b/c/d -> ranks 1..4
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = tx.zipf_fit(df, "text", top_n=10).collect()[0]
    slope, intercept, r2 = _ols_reference([(1, 8), (2, 4), (3, 2), (4, 1)])
    assert r["n_terms"] == 4
    assert r["slope"] == slope and r["intercept"] == intercept
    assert r["r2"] == r2
    assert r["slope"] < 0  # frequency falls with rank


def test_zipf_fit_perfect_power_law(spark):
    # freq = 16/rank at ranks 1,2,4,8,16 -> EXACT line in log-log space:
    # slope -1, r2 1 (within the 8dp input rounding)
    freqs = {1: 16, 2: 8, 4: 4, 8: 2, 16: 1}
    words = []
    for rank, f in freqs.items():
        words += [f"w{rank:02d}"] * f
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    r = tx.zipf_fit(df, "text", top_n=10).collect()[0]
    # ranks here are 1..5 (dense), freqs 16,8,4,2,1: ln f = ln16 - (rk-1)ln2
    # which is linear in RANK; use the true power-law pairs instead via the
    # reference to pin the operator's exact arithmetic
    slope, intercept, r2 = _ols_reference(
        [(1, 16), (2, 8), (3, 4), (4, 2), (5, 1)]
    )
    assert (r["slope"], r["intercept"], r["r2"]) == (slope, intercept, r2)


def test_zipf_fit_flat_head_on_uniform(spark):
    # uniform frequencies -> slope 0, r2 NULL/degenerate (vary = 0)
    df = spark.createDataFrame(
        [(1, "aa bb cc dd aa bb cc dd")], "doc_id long, text string"
    )
    r = tx.zipf_fit(df, "text", top_n=10).collect()[0]
    assert r["slope"] == 0.0


# ---------------------------------------------------------------------------
# unigram_kl
# ---------------------------------------------------------------------------

def test_unigram_kl_identical_corpora_zero(spark):
    df = spark.createDataFrame(
        [(1, "x y z x y"), (2, "z z y x")], "doc_id long, text string"
    )
    r = tx.unigram_kl(df, df).collect()[0]
    assert r["kl_bits"] == 0.0
    assert r["n_tokens_p"] == r["n_tokens_q"] == 9


def test_unigram_kl_hand_computed(spark):
    # P: {a:2, b:1}; Q: {a:1, c:2}; union vocab V=3, k=0.5
    p = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    q = spark.createDataFrame([(1, "a c c")], "doc_id long, text string")
    V, k, Np, Nq = 3, 0.5, 3, 3

    def pr(c, N):
        return (c + k) / (N + k * V)

    expected = 0.0
    for cp, cq in [(2, 1), (1, 0), (0, 2)]:
        expected += round(
            pr(cp, Np) * math.log2(pr(cp, Np) / pr(cq, Nq)), 8
        )
    r = tx.unigram_kl(p, q).collect()[0]
    assert r["n_terms"] == 3
    assert r["kl_bits"] == round(expected, 6)
    # and KL is asymmetric: D(Q||P) differs
    r2 = tx.unigram_kl(q, p).collect()[0]
    assert r2["kl_bits"] != r["kl_bits"]


# ---------------------------------------------------------------------------
# shard_manifest
# ---------------------------------------------------------------------------

def test_shard_manifest_order_independent_and_corruption_sensitive(spark):
    rows = [(i, f"shard{i % 2}", f"payload-{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, shard string, text string")
    base = {
        r["shard"]: (r["n_rows"], r["checksum"])
        for r in smp.shard_manifest(df, "shard", ["id", "text"]).collect()
    }
    assert base["shard0"][0] == base["shard1"][0] == 10
    # order/partitioning invariant
    reshuffled = df.repartition(7).sortWithinPartitions(F.desc("id"))
    again = {
        r["shard"]: (r["n_rows"], r["checksum"])
        for r in smp.shard_manifest(
            reshuffled, "shard", ["id", "text"]
        ).collect()
    }
    assert again == base
    # a single corrupted byte flips that shard's checksum only
    corrupt = df.withColumn(
        "text",
        F.when(F.col("id") == 4, F.lit("payload-X")).otherwise(F.col("text")),
    )
    c = {
        r["shard"]: (r["n_rows"], r["checksum"])
        for r in smp.shard_manifest(corrupt, "shard", ["id", "text"]).collect()
    }
    assert c["shard0"] != base["shard0"] and c["shard1"] == base["shard1"]
    # a single EXTRA copy of a row flips the checksum (odd count change)...
    dup1 = df.unionByName(df.where(F.col("id") == 3))
    d1 = {
        r["shard"]: (r["n_rows"], r["checksum"])
        for r in smp.shard_manifest(dup1, "shard", ["id", "text"]).collect()
    }
    assert d1["shard1"][1] != base["shard1"][1]
    # ...while TWO extra copies cancel in XOR — the documented blind spot
    # n_rows exists to cover (the checks cover each other)
    dup2 = dup1.unionByName(df.where(F.col("id") == 3))
    d2 = {
        r["shard"]: (r["n_rows"], r["checksum"])
        for r in smp.shard_manifest(dup2, "shard", ["id", "text"]).collect()
    }
    assert d2["shard1"][1] == base["shard1"][1]  # XOR blind
    assert d2["shard1"][0] == 12  # count catches it


# ---------------------------------------------------------------------------
# poisson_bootstrap_ci
# ---------------------------------------------------------------------------

def test_poisson_bootstrap_ci_deterministic_and_ordered(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 50).cast("double").alias("v")
    )
    r1 = smp.poisson_bootstrap_ci(df, "v", "k", b=64).collect()[0]
    r2 = smp.poisson_bootstrap_ci(df, "v", "k", b=64).collect()[0]
    assert r1 == r2  # md5-seeded: no RNG, fully reproducible
    assert r1["n"] == 400 and r1["b"] == 64
    assert r1["ci_lo"] <= r1["mean"] <= r1["ci_hi"]
    # the CI brackets the true mean (24.5) for this well-behaved sample
    assert r1["ci_lo"] <= 24.5 <= r1["ci_hi"]
    # and it shrinks roughly like 1/sqrt(n): a 4x corpus gives a
    # narrower interval
    big = spark.range(0, 1600).select(
        F.col("id").alias("k"), (F.col("id") % 50).cast("double").alias("v")
    )
    rb = smp.poisson_bootstrap_ci(big, "v", "k", b=64).collect()[0]
    assert (rb["ci_hi"] - rb["ci_lo"]) < (r1["ci_hi"] - r1["ci_lo"])


def test_poisson1_weight_mean_near_one(spark):
    # the inverse-CDF weights must average ~1 (resample size ~ n)
    df = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
    u = (
        F.conv(F.substring(F.md5(F.col("k")), 1, 15), 16, 10).cast("double")
        / F.lit(float(1 << 60))
    )
    m = df.select(smp._poisson1_weight(u).alias("w")).agg(
        F.avg("w").alias("m"), F.max("w").alias("mx")
    ).collect()[0]
    assert abs(m["m"] - 1.0) < 0.05  # se = 1/sqrt(5000) ~ 0.014
    assert m["mx"] <= 13


# ---------------------------------------------------------------------------
# unigram_js
# ---------------------------------------------------------------------------

def test_unigram_js_symmetric_bounded_zero(spark):
    p = spark.createDataFrame([(1, "a a b c")], "doc_id long, text string")
    q = spark.createDataFrame([(1, "a d d e e")], "doc_id long, text string")
    ab = tx.unigram_js(p, q).collect()[0]
    ba = tx.unigram_js(q, p).collect()[0]
    # symmetric (KL is not) and bounded in [0, 1] bits
    assert ab["js_bits"] == ba["js_bits"]
    assert 0.0 < ab["js_bits"] <= 1.0
    same = tx.unigram_js(p, p).collect()[0]
    assert same["js_bits"] == 0.0


# ---------------------------------------------------------------------------
# poisson_bootstrap_ci_by
# ---------------------------------------------------------------------------

def test_poisson_bootstrap_by_group_consistent(spark):
    df = spark.range(0, 600).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 40).cast("double").alias("v"),
    )
    out = {
        r["g"]: r
        for r in smp.poisson_bootstrap_ci_by(df, "v", "k", ["g"], b=64).collect()
    }
    assert set(out) == {"0", "1", "2"}
    for r in out.values():
        assert r["n"] == 200 and r["b"] == 64
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    # deterministic across invocations
    again = {
        r["g"]: r
        for r in smp.poisson_bootstrap_ci_by(df, "v", "k", ["g"], b=64).collect()
    }
    assert again == out
    # group-consistent resampling: the single-group CI over a filtered
    # frame equals that group's row in the grouped run (weights seed from
    # the row key alone)
    g0 = df.where(F.col("g") == "0")
    single = smp.poisson_bootstrap_ci(g0, "v", "k", b=64).collect()[0]
    assert (single["mean"], single["ci_lo"], single["ci_hi"]) == (
        out["0"]["mean"],
        out["0"]["ci_lo"],
        out["0"]["ci_hi"],
    )


# ---------------------------------------------------------------------------
# cusum_path
# ---------------------------------------------------------------------------

def test_cusum_matches_sequential_recurrence(spark):
    """The windowed reflection closed form s+_t = cs_t - min(0, min cs_j)
    must equal the textbook sequential recurrence exactly."""
    from bullet_spark_spark.operators import temporal as tmp

    vals = [10, 11, 9, 10, 30, 31, 32, 29, 30, 31]  # level shift at t=5
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "ts long, v double"
    )
    out = {
        r["ts"]: r
        for r in tmp.cusum_path(df, "ts", "v", k_slack=0.5, h_threshold=2.0)
        .collect()
    }
    # python reference on the same quantized z
    n = len(vals)
    mean = sum(vals) / n
    std = (sum(v * v for v in vals) / n - mean**2) ** 0.5

    def q9(x):
        return math.floor(x * 1e9) / 1e9

    mean, std = q9(mean), q9(std)
    sp = sn = 0.0
    for i, v in enumerate(vals):
        z = q9((v - mean) / std)
        sp = max(0.0, sp + z - 0.5)
        sn = max(0.0, sn - z - 0.5)
        assert out[i]["s_pos"] == math.floor(sp * 1e6) / 1e6, (i, sp)
        assert out[i]["s_neg"] == math.floor(sn * 1e6) / 1e6, (i, sn)
    # both sides of the level shift deviate from the GLOBAL mean, so the
    # prefix accumulates a DOWNWARD alarm and the suffix an UPWARD one —
    # textbook two-sided CUSUM on a standardized series with a shift
    assert not out[0]["alarm"]  # one step can't clear h
    assert out[3]["alarm"] and out[3]["s_neg"] > 2.0 and out[3]["s_pos"] == 0.0
    # the suffix accumulates upward mass monotonically (z-k ~ +0.26/step
    # here — below this h, which is exactly CUSUM's slack behavior)
    assert 0.0 < out[6]["s_pos"] < out[9]["s_pos"]
    assert out[9]["s_neg"] == 0.0  # the upward run drains the down side


def test_cusum_per_key_and_constant_series(spark):
    from bullet_spark_spark.operators import temporal as tmp

    rows = [("a", i, float(10 + (5 if i >= 8 else 0))) for i in range(12)]
    rows += [("b", i, 7.0) for i in range(12)]  # constant: std=0 guard
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = tmp.cusum_path(
        df, "ts", "v", key_cols=["k"], k_slack=0.5, h_threshold=2.0
    ).collect()
    a = [r for r in out if r["k"] == "a"]
    b = [r for r in out if r["k"] == "b"]
    assert any(r["alarm"] for r in a)  # shift detected within key a
    assert all(not r["alarm"] and r["z"] == 0.0 for r in b)  # flat + no NaN


# ---------------------------------------------------------------------------
# theil_sen_trend
# ---------------------------------------------------------------------------

def _py_theil_sen(vals, dp=9):
    n = len(vals)
    slopes, s = [], 0
    for i in range(n):
        for j in range(i + 1, n):
            d = vals[j] - vals[i]
            s += (d > 0) - (d < 0)
            slopes.append(math.floor((d / (j - i)) * 10**dp) / 10**dp)
    slopes.sort()
    m = len(slopes)
    med = slopes[math.ceil(m / 2) - 1]  # percentile-disc LOWER
    return n, s, round(s / m, 6), round(med, 6)


def test_theil_sen_matches_reference_and_resists_outlier(spark):
    from bullet_spark_spark.operators import temporal as tmp

    vals = [1.0, 2.0, 3.0, 4.0, 100.0, 6.0, 7.0, 8.0]  # one wild outlier
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)],
        "k string, ts long, v double",
    )
    r = tmp.theil_sen_trend(df, "ts", "v", key_cols=["k"]).collect()[0]
    n, s, tau, med = _py_theil_sen(vals)
    assert (r["n_points"], r["s_kendall"], r["tau"], r["slope"]) == (
        n,
        s,
        tau,
        med,
    )
    # robustness: the Theil-Sen slope stays ~1 despite the outlier, where
    # OLS would be dragged far above it
    assert 0.9 <= r["slope"] <= 1.5
    # perfectly monotone series: tau == 1
    mono = spark.createDataFrame(
        [("k", i, float(i) * 2) for i in range(6)],
        "k string, ts long, v double",
    )
    rm = tmp.theil_sen_trend(mono, "ts", "v", key_cols=["k"]).collect()[0]
    assert rm["tau"] == 1.0 and rm["slope"] == 2.0
