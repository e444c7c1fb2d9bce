"""Round-10-queue operator additions: triangle counting, rank-based and
parametric two-sample tests, temporal autocorrelation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bullet_spark_spark.operators import distribution as dist
from bullet_spark_spark.operators import graph as gr


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------

def _tri_rows(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in gr.triangle_counts(df).collect()
    }


def test_triangle_counts_diamond(spark):
    # K4 minus edge (1,4): triangles (1,2,3) and (2,3,4)
    got = _tri_rows(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    assert got == {
        1: (2, 1, 1.0),
        2: (3, 2, round(2 * 2 / (3 * 2), 6)),
        3: (3, 2, round(2 * 2 / (3 * 2), 6)),
        4: (2, 1, 1.0),
    }


def test_triangle_counts_star_has_none(spark):
    # a star (celebrity hub) has maximal degree but zero triangles —
    # exactly the degree-vs-clustering separation the operator exists for
    got = _tri_rows(spark, [(0, i) for i in range(1, 6)])
    assert got[0] == (5, 0, 0.0)
    assert all(got[i] == (1, 0, 0.0) for i in range(1, 6))


def test_triangle_counts_canonicalizes_input(spark):
    # duplicates, reversed orientation, and self-loops must collapse to
    # the one undirected triangle
    got = _tri_rows(
        spark,
        [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 3), (2, 2)],
    )
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_triangle_counts_complete_k5(spark):
    # K5: C(5,2)=10 edges, C(5,3)=10 triangles; every node sits in
    # C(4,2)=6 of them and clusters at exactly 1.0 — exercises the
    # all-ties orientation path (every degree equal -> node-id tiebreak)
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    got = _tri_rows(spark, edges)
    assert got == {i: (4, 6, 1.0) for i in range(5)}


def test_triangle_counts_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    plan = gr.triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

# ---------------------------------------------------------------------------
# mann_whitney_u / welch_ttest
# ---------------------------------------------------------------------------

def _mwu_reference(xs, ys):
    """Pure-Python tie-corrected Mann-Whitney U (average ranks)."""
    pooled = sorted(set(xs) | set(ys))
    # average rank per distinct value
    ranks, start = {}, 1
    for v in pooled:
        t = xs.count(v) + ys.count(v)
        ranks[v] = start + (t - 1) / 2.0
        start += t
    na, nb, nn = len(xs), len(ys), len(xs) + len(ys)
    ra = sum(ranks[v] for v in xs)
    ua = ra - na * (na + 1) / 2.0
    mu = na * nb / 2.0
    ties = sum(
        (xs.count(v) + ys.count(v)) ** 3 - (xs.count(v) + ys.count(v))
        for v in pooled
    )
    sigma = math.sqrt(
        na * nb / 12.0 * ((nn + 1.0) - ties / (nn * (nn - 1.0)))
    )
    return na, nb, ua, mu, sigma, (ua - mu) / sigma


def test_mann_whitney_hand_example(spark):
    xs, ys = [1.0, 2.0, 3.0], [2.0, 3.0, 4.0]
    a = spark.createDataFrame([(v,) for v in xs], "value double")
    b = spark.createDataFrame([(v,) for v in ys], "value double")
    row = dist.mann_whitney_u(a, b, "value").collect()[0]
    na, nb, ua, mu, sigma, z = _mwu_reference(xs, ys)
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["u_a"] == round(ua, 6) == 2.0
    assert row["mu_u"] == round(mu, 6) == 4.5
    assert row["sigma_u"] == round(sigma, 6)
    assert row["z"] == round(z, 6)
    assert row["reject_95"] is False


def test_mann_whitney_random_with_ties(spark):
    import random

    rng = random.Random(47)
    xs = [float(rng.randint(0, 30)) for _ in range(400)]
    ys = [float(rng.randint(5, 35)) for _ in range(300)]
    a = spark.createDataFrame([(v,) for v in xs], "value double")
    b = spark.createDataFrame([(v,) for v in ys], "value double")
    row = dist.mann_whitney_u(a, b, "value").collect()[0]
    na, nb, ua, mu, sigma, z = _mwu_reference(xs, ys)
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["u_a"] == round(ua, 6)
    assert abs(row["sigma_u"] - sigma) < 1e-5
    assert abs(row["z"] - z) < 1e-5
    assert row["reject_95"] is True  # B is shifted +5: strong signal


def test_mann_whitney_all_tied_null_z(spark):
    a = spark.createDataFrame([(1.0,)] * 4, "value double")
    b = spark.createDataFrame([(1.0,)] * 3, "value double")
    row = dist.mann_whitney_u(a, b, "value").collect()[0]
    assert row["sigma_u"] == 0.0
    assert row["z"] is None and row["reject_95"] is None


def _welch_reference(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = sum((x - ma) ** 2 for x in xs) / (na - 1)
    vb = sum((y - mb) ** 2 for y in ys) / (nb - 1)
    ea, eb = va / na, vb / nb
    t = (ma - mb) / math.sqrt(ea + eb)
    dof = (ea + eb) ** 2 / (ea * ea / (na - 1) + eb * eb / (nb - 1))
    return ma, mb, va, vb, t, dof


def test_welch_ttest_reference(spark):
    import random

    rng = random.Random(11)
    xs = [round(rng.gauss(10.0, 2.0), 3) for _ in range(500)]
    ys = [round(rng.gauss(10.5, 4.0), 3) for _ in range(350)]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys] + [("c", 99.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    row = dist.welch_ttest(df, "value", "g", "a", "b").collect()[0]
    ma, mb, va, vb, t, dof = _welch_reference(xs, ys)
    assert (row["n_a"], row["n_b"]) == (500, 350)
    assert abs(row["mean_a"] - ma) < 1e-6 and abs(row["mean_b"] - mb) < 1e-6
    assert abs(row["var_a"] - va) < 1e-5 and abs(row["var_b"] - vb) < 1e-5
    assert abs(row["t_stat"] - t) < 1e-5
    assert abs(row["dof"] - dof) < 1e-3
    assert row["reject_95"] == (abs(t) > 1.959964)


def test_welch_ttest_ignores_nulls_and_other_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("b", 5.0), ("b", 7.0),
         ("z", 1000.0)],
        "g string, value double",
    )
    row = dist.welch_ttest(df, "value", "g", "a", "b").collect()[0]
    assert (row["n_a"], row["n_b"]) == (2, 2)
    assert row["mean_a"] == 1.5 and row["mean_b"] == 6.0

# ---------------------------------------------------------------------------
# temporal acf
# ---------------------------------------------------------------------------

def _acf_reference(xs, max_lag):
    n = len(xs)
    m = sum(xs) / n
    den = sum((x - m) ** 2 for x in xs)
    out = {}
    for k in range(1, max_lag + 1):
        if k >= n or den <= 0:
            continue
        out[k] = round(
            sum((xs[i] - m) * (xs[i + k] - m) for i in range(n - k)) / den, 6
        )
    return out


def test_acf_periodic_series(spark):
    from datetime import datetime, timedelta

    from bullet_spark_spark.operators import temporal as tmp

    xs = [1.0, 5.0, 2.0, 4.0] * 6  # period-4 cycle
    t0 = datetime(2024, 1, 1)
    rows = [("k", t0 + timedelta(days=i), v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    got = {
        r["lag"]: r["acf"]
        for r in tmp.acf(df, "ts", "v", ["g"], max_lag=6).collect()
    }
    ref = _acf_reference(xs, 6)
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k] - ref[k]) < 2e-6, (k, got[k], ref[k])
    # the period shows: lag-4 autocorrelation dominates every other lag
    assert got[4] == max(got.values())
    assert got[4] > 0.8


def test_acf_constant_series_null(spark):
    from datetime import datetime, timedelta

    from bullet_spark_spark.operators import temporal as tmp

    t0 = datetime(2024, 1, 1)
    rows = [("k", t0 + timedelta(days=i), 3.0) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = tmp.acf(df, "ts", "v", ["g"], max_lag=3).collect()
    assert len(out) == 3 and all(r["acf"] is None for r in out)


def test_acf_keys_are_independent(spark):
    from datetime import datetime, timedelta

    from bullet_spark_spark.operators import temporal as tmp

    t0 = datetime(2024, 1, 1)
    xs = [1.0, 2.0, 4.0, 8.0, 16.0, 13.0, 7.0, 5.0]
    ys = [9.0, 1.0, 9.0, 1.0, 9.0, 1.0, 9.0, 1.0]
    rows = [("a", t0 + timedelta(days=i), v) for i, v in enumerate(xs)]
    rows += [("b", t0 + timedelta(days=i), v) for i, v in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    got = {
        (r["g"], r["lag"]): r["acf"]
        for r in tmp.acf(df, "ts", "v", ["g"], max_lag=2).collect()
    }
    ra, rb = _acf_reference(xs, 2), _acf_reference(ys, 2)
    for k in ra:
        assert abs(got[("a", k)] - ra[k]) < 2e-6
    for k in rb:
        assert abs(got[("b", k)] - rb[k]) < 2e-6
    # alternating series: lag-1 = -112/128 = -0.875 (biased estimator)
    assert got[("b", 1)] == -0.875

# ---------------------------------------------------------------------------
# spearman_corr
# ---------------------------------------------------------------------------

def _spearman_reference(xs, ys):
    def avg_ranks(vs):
        order = sorted(vs)
        first = {}
        for i, v in enumerate(order):
            first.setdefault(v, i + 1)
        return [first[v] + (vs.count(v) - 1) / 2.0 for v in vs]

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    return num / den


def test_spearman_monotone_transform_is_one(spark):
    # exp() is monotone: Pearson degrades, Spearman stays exactly 1
    rows = [(float(i), math.exp(i / 3.0)) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "x double, y double")
    row = dist.spearman_corr(df, "x", "y").collect()[0]
    assert row["n"] == 39 and row["rho"] == 1.0


def test_spearman_with_ties_matches_reference(spark):
    import random

    rng = random.Random(5)
    xs = [float(rng.randint(1, 8)) for _ in range(300)]  # heavy ties
    ys = [x * 2 + rng.gauss(0, 3.0) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    row = dist.spearman_corr(df, "x", "y").collect()[0]
    ref = _spearman_reference(xs, ys)
    assert row["n"] == 300
    assert abs(row["rho"] - ref) < 1e-6


def test_spearman_constant_column_null(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
    )
    row = dist.spearman_corr(df, "x", "y").collect()[0]
    assert row["rho"] is None


def test_spearman_drops_null_rows(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 4.0), (None, 9.0), (3.0, None), (4.0, 16.0)],
        "x double, y double",
    )
    row = dist.spearman_corr(df, "x", "y").collect()[0]
    assert row["n"] == 3 and row["rho"] == 1.0

# ---------------------------------------------------------------------------
# compaction_plan
# ---------------------------------------------------------------------------

def test_compaction_plan_stripes_by_target(spark):
    from bullet_spark_spark.operators import layout as lay

    # one partition, sizes desc: 90, 60, 30, 20, 10 — target 100
    # cum_excl: 0, 90, 150, 180, 200 -> shards 0, 0, 1, 1, 2
    files = spark.createDataFrame(
        [("p", i, s) for i, s in enumerate([90, 60, 30, 20, 10])],
        "part string, fid long, bytes long",
    )
    rows = {
        r["shard"]: (r["file_count"], r["total_bytes"], r["fill_ratio"])
        for r in lay.compaction_plan(
            files, "bytes", 100, ["part"], "fid"
        ).collect()
    }
    assert rows == {
        0: (2, 150, 1.5),
        1: (2, 50, 0.5),
        2: (1, 10, 0.1),
    }


def test_compaction_plan_oversized_file_isolates(spark):
    from bullet_spark_spark.operators import layout as lay

    files = spark.createDataFrame(
        [("p", 1, 350), ("p", 2, 40), ("p", 3, 30)],
        "part string, fid long, bytes long",
    )
    rows = {
        r["shard"]: (r["file_count"], r["total_bytes"])
        for r in lay.compaction_plan(
            files, "bytes", 100, ["part"], "fid"
        ).collect()
    }
    # cum_excl: 0, 350, 390 -> shards 0, 3, 3: the giant sits alone,
    # both small files pool into one rewrite task
    assert rows == {0: (1, 350), 3: (2, 70)}


def test_compaction_plan_partitions_independent(spark):
    from bullet_spark_spark.operators import layout as lay

    files = spark.createDataFrame(
        [("a", 1, 80), ("a", 2, 80), ("b", 1, 80), ("b", 2, 80)],
        "part string, fid long, bytes long",
    )
    out = lay.compaction_plan(files, "bytes", 100, ["part"], "fid").collect()
    # cumsum restarts per partition: each plans ONE shard of its own two
    # files (cum_excl 0 and 80 both stripe 0) — no cross-partition bleed
    assert sorted((r["part"], r["shard"]) for r in out) == [("a", 0), ("b", 0)]
    assert all(r["file_count"] == 2 and r["total_bytes"] == 160 for r in out)

# ---------------------------------------------------------------------------
# temporal ccf
# ---------------------------------------------------------------------------

def _ccf_reference(xs, ys, max_lag):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    den = math.sqrt(
        sum((x - mx) ** 2 for x in xs) * sum((y - my) ** 2 for y in ys)
    )
    out = {}
    for k in range(-max_lag, max_lag + 1):
        pairs = [
            (xs[i] - mx) * (ys[i + k] - my)
            for i in range(n)
            if 0 <= i + k < n
        ]
        if pairs and den > 0:
            out[k] = round(sum(pairs) / den, 6)
    return out


def test_ccf_detects_lead(spark):
    from datetime import datetime, timedelta

    from bullet_spark_spark.operators import temporal as tmp

    import random

    rng = random.Random(3)
    base = [rng.uniform(0, 10) for _ in range(40)]
    xs = base[:]                      # x leads:
    ys = [0.0, 0.0] + base[:-2]      # y is x delayed by 2 steps
    t0 = datetime(2024, 1, 1)
    rows = [
        (t0 + timedelta(days=i), x, y) for i, (x, y) in enumerate(zip(xs, ys))
    ]
    df = spark.createDataFrame(rows, "ts timestamp, x double, y double")
    got = {
        r["lag"]: r["ccf"]
        for r in tmp.ccf(df, "ts", "x", "y", max_lag=4).collect()
    }
    ref = _ccf_reference(xs, ys, 4)
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k] - ref[k]) < 2e-6, (k, got[k], ref[k])
    # x_t correlates with y_{t+2}: the peak sits at lag +2
    assert max(got, key=got.get) == 2
    # the two zero-padded head values dilute the peak slightly below 0.9
    assert got[2] > 0.85


def test_ccf_lag_zero_is_plain_correlation(spark):
    from datetime import datetime, timedelta

    from bullet_spark_spark.operators import temporal as tmp

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 6.0, 8.0, 10.0]
    t0 = datetime(2024, 1, 1)
    rows = [
        (t0 + timedelta(days=i), x, y) for i, (x, y) in enumerate(zip(xs, ys))
    ]
    df = spark.createDataFrame(rows, "ts timestamp, x double, y double")
    got = {
        r["lag"]: r["ccf"]
        for r in tmp.ccf(df, "ts", "x", "y", max_lag=2).collect()
    }
    assert got[0] == 1.0
    ref = _ccf_reference(xs, ys, 2)
    for k in ref:
        assert abs(got[k] - ref[k]) < 2e-6

# ---------------------------------------------------------------------------
# invariance properties
# ---------------------------------------------------------------------------

def test_mwu_invariant_under_monotone_transform(spark):
    # U is rank-based: exp() must leave every output except nothing changed
    import random

    rng = random.Random(9)
    xs = [float(rng.randint(0, 20)) for _ in range(150)]
    ys = [float(rng.randint(3, 25)) for _ in range(120)]
    a1 = spark.createDataFrame([(v,) for v in xs], "value double")
    b1 = spark.createDataFrame([(v,) for v in ys], "value double")
    a2 = spark.createDataFrame([(math.exp(v / 5),) for v in xs], "value double")
    b2 = spark.createDataFrame([(math.exp(v / 5),) for v in ys], "value double")
    r1 = dist.mann_whitney_u(a1, b1, "value").collect()[0]
    r2 = dist.mann_whitney_u(a2, b2, "value").collect()[0]
    assert r1.asDict() == r2.asDict()


def test_spearman_is_symmetric(spark):
    import random

    rng = random.Random(21)
    rows = [
        (float(rng.randint(1, 9)), rng.uniform(0, 100)) for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    r_xy = dist.spearman_corr(df, "x", "y").collect()[0]["rho"]
    r_yx = dist.spearman_corr(df, "y", "x").collect()[0]["rho"]
    assert r_xy == r_yx


def test_triangles_relabel_invariant_and_divisible(spark):
    import random

    rng = random.Random(13)
    edges = list({
        (min(a, b), max(a, b))
        for a, b in (
            (rng.randint(0, 24), rng.randint(0, 24)) for _ in range(120)
        )
        if a != b
    })
    base = _tri_rows(spark, edges)
    total = sum(t for _, t, _ in base.values())
    assert total % 3 == 0  # each triangle counted once per member node
    # relabel nodes by a fixed permutation: per-node stats must transport
    perm = {i: (i * 7 + 3) % 101 for i in range(25)}
    relabeled = _tri_rows(spark, [(perm[a], perm[b]) for a, b in edges])
    assert {perm[n]: v for n, v in base.items()} == relabeled

# ---------------------------------------------------------------------------
# hardening regressions (round-9 self-review)
# ---------------------------------------------------------------------------

def test_welch_singleton_group_yields_nulls_not_inf(spark):
    # n=1 has no variance: every variance-dependent output must be NULL,
    # never a quiet IEEE Inf/NaN
    df = spark.createDataFrame(
        [("a", 5.0), ("b", 1.0), ("b", 2.0), ("b", 3.0)],
        "g string, value double",
    )
    row = dist.welch_ttest(df, "value", "g", "a", "b").collect()[0]
    assert row["n_a"] == 1 and row["mean_a"] == 5.0
    assert row["var_a"] is None
    assert row["t_stat"] is None and row["dof"] is None
    assert row["reject_95"] is None


def test_welch_empty_group_yields_nulls(spark):
    df = spark.createDataFrame(
        [("b", 1.0), ("b", 2.0)], "g string, value double"
    )
    row = dist.welch_ttest(df, "value", "g", "a", "b").collect()[0]
    assert row["n_a"] == 0
    assert row["mean_a"] is None and row["var_a"] is None
    assert row["t_stat"] is None


def test_acf_tied_timestamps_deterministic(spark):
    from datetime import datetime

    from bullet_spark_spark.operators import temporal as tmp

    # two rows share a timestamp: the value tiebreak pins the index, so
    # repeated runs (and both engines) agree
    t0 = datetime(2024, 1, 1)
    rows = [("k", t0, 5.0), ("k", t0, 1.0), ("k", t0, 3.0)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    a = {(r["lag"], r["acf"]) for r in tmp.acf(df, "ts", "v", ["g"], 2).collect()}
    b = {(r["lag"], r["acf"]) for r in tmp.acf(df, "ts", "v", ["g"], 2).collect()}
    assert a == b
    # value order 1,3,5: lag-1 of a monotone 3-point series is 1/8
    ref = _acf_reference([1.0, 3.0, 5.0], 2)
    got = dict(a)
    for k in ref:
        assert abs(got[k] - ref[k]) < 2e-6

# ---------------------------------------------------------------------------
# frequent_pairs (association rules)
# ---------------------------------------------------------------------------

def test_frequent_pairs_hand_example(spark):
    from bullet_spark_spark.operators import relational as rel

    # 4 baskets: {x,y}, {x,y}, {x,z}, {y}
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in rel.frequent_pairs(df, "b", "i", min_pair_count=1).collect()
    }
    xy = out[("x", "y")]
    assert (xy["n_a"], xy["n_b"], xy["n_ab"]) == (3, 3, 2)
    assert xy["support"] == 0.5                      # 2 of 4 baskets
    assert xy["conf_a_b"] == round(2 / 3, 6)
    assert xy["conf_b_a"] == round(2 / 3, 6)
    assert xy["lift"] == round(2 * 4 / (3 * 3), 6)   # 0.888889
    xz = out[("x", "z")]
    assert (xz["n_ab"], xz["lift"]) == (1, round(1 * 4 / (3 * 1), 6))
    assert ("y", "z") not in out                     # never co-occur


def test_frequent_pairs_presence_based_and_threshold(spark):
    from bullet_spark_spark.operators import relational as rel

    # duplicate (basket, item) rows collapse; threshold prunes pairs
    rows = [(1, "x")] * 5 + [(1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {
        (r["item_a"], r["item_b"]): r["n_ab"]
        for r in rel.frequent_pairs(df, "b", "i", min_pair_count=2).collect()
    }
    assert out == {("x", "y"): 2}  # x appears once per basket despite dups

# ---------------------------------------------------------------------------
# adamic_adar_pairs
# ---------------------------------------------------------------------------

def test_adamic_adar_hand_graph(spark):
    import math as _m

    # path graph 1-2-3 plus 2-4: pairs through z=2 (deg 3): (1,3),(1,4),(3,4)
    # each scoring 1/ln(3); plus (2,?) through z=1/3/4? deg-1 centers have
    # no pairs. Edge (1,3) itself absent — AA predicts it anyway.
    df = spark.createDataFrame([(1, 2), (2, 3), (2, 4)], "src long, dst long")
    got = {
        (r["node_a"], r["node_b"]): (r["n_common"], r["score"])
        for r in gr.adamic_adar_pairs(df).collect()
    }
    term = _m.floor(1.0 / _m.log(3.0) * 1e9) / 1e9
    assert got == {
        (1, 3): (1, round(term, 6)),
        (1, 4): (1, round(term, 6)),
        (3, 4): (1, round(term, 6)),
    }


def test_adamic_adar_rare_neighbor_outweighs_hub(spark):
    # x,y share BOTH a rare neighbor (deg 2) and a hub (deg 12):
    # the pair's score must exceed a pair sharing only the hub
    edges = [("x", "r"), ("y", "r")]
    edges += [("x", "h"), ("y", "h")]
    edges += [(f"u{i}", "h") for i in range(10)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["node_a"], r["node_b"]): r["score"]
        for r in gr.adamic_adar_pairs(df).collect()
    }
    import math as _m

    xy = got[("x", "y")]
    hub_only = got[("u0", "u1")]
    assert xy > hub_only
    exp_xy = (
        _m.floor(1.0 / _m.log(2.0) * 1e9) + _m.floor(1.0 / _m.log(12.0) * 1e9)
    ) / 1e9
    assert xy == round(exp_xy, 6)


def test_adamic_adar_hub_cap_prunes_centers(spark):
    # cap below the hub's degree: only the rare-neighbor term survives
    import math as _m

    edges = [("x", "r"), ("y", "r")] + [("x", "h"), ("y", "h")]
    edges += [(f"u{i}", "h") for i in range(10)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["node_a"], r["node_b"]): r["score"]
        for r in gr.adamic_adar_pairs(df, max_degree=5).collect()
    }
    assert got[("x", "y")] == round(_m.floor(1.0 / _m.log(2.0) * 1e9) / 1e9, 6)
    assert ("u0", "u1") not in got  # hub pruned: no center connects them


def test_adamic_adar_hub_cap_collapses_wedge_count(spark):
    """VERDICT r9 task 8 (the df-cap pin, graph edition): plant a
    200-degree synthetic hub and NAME the candidate-wedge counts with and
    without the cap. The wedge expansion emits Σ_z C(deg(z), 2)
    candidates; the hub alone contributes C(200,2) = 19 900 — with
    ``max_degree=50`` it is excluded as a center and the candidate space
    collapses to the 6 wedges of the small clique, a 3 300× cut at this
    toy scale (and unbounded at web scale: one 10⁶-degree hub is 5·10¹¹
    wedges)."""
    hub_edges = [("hub", f"leaf{i}") for i in range(200)]
    # a 4-clique of normal nodes: every node has degree 3 (≤ cap), each
    # of the 4 centers contributes C(3,2)=3 wedges but each unordered
    # pair is counted once per shared neighbor => Σ n_common = 4*3/2 … =
    # count them from the result instead of hand-folding
    clique = [
        (a, b)
        for i, a in enumerate(["c0", "c1", "c2", "c3"])
        for b in ["c0", "c1", "c2", "c3"][i + 1:]
    ]
    df = spark.createDataFrame(hub_edges + clique, "src string, dst string")

    def wedge_count(pairs):
        return sum(r["n_common"] for r in pairs.collect())

    uncapped = wedge_count(gr.adamic_adar_pairs(df, max_degree=None))
    capped = wedge_count(gr.adamic_adar_pairs(df, max_degree=50))
    # uncapped: hub center C(200,2)=19900 + every clique node as center
    # C(3,2)=3 each (12) + each leaf/clique-neighbor degree-1/2 centers
    assert uncapped >= 19_900 + 12, uncapped
    # capped: the hub's 19 900 wedges are GONE; only small-degree centers
    # remain (the 4 clique centers = 12 wedges)
    assert capped == 12, capped
    assert uncapped - capped >= 19_900

# ---------------------------------------------------------------------------
# review-pass regressions
# ---------------------------------------------------------------------------

def test_welch_near_constant_clamps_variance_at_zero(spark):
    # Σx quantizes at 6 dp while Σround(x²,8) quantizes the squares: a
    # near-constant column can compute an epsilon-negative variance from
    # the mismatched roundings — the clamp surfaces 0, never < 0
    rows = [("a", 1000.0000005)] * 50 + [("b", 1.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    row = dist.welch_ttest(df, "value", "g", "a", "b").collect()[0]
    assert row["var_a"] is not None and row["var_a"] >= 0.0
    # b's variance is genuine (1.0): the t-test still runs
    assert row["var_b"] == 1.0 and row["t_stat"] is not None


def test_bucketed_cumsum_string_column_uses_safe_fallback(spark):
    from bullet_spark_spark.operators.distribution import (
        _bucketed_running_sums,
    )

    # numeric-looking strings order '10' < '9' natively but 9.0 < 10.0
    # as doubles — the helper must NOT bucket by the cast
    rows = [(str(v), 1) for v in [9, 10, 100, 2, 20]]
    df = spark.createDataFrame(rows, "v string, c long")
    got = {
        r["v"]: r["__cum_c"]
        for r in _bucketed_running_sums(df, "v", ["c"]).collect()
    }
    order = sorted(got)  # lexicographic: 10, 100, 2, 20, 9
    assert [got[v] for v in order] == [1, 2, 3, 4, 5]


def test_adamic_adar_oracle_supports_uncapped(spark):
    # max_degree=None must emit a valid uncapped oracle (engine parity)
    import duckdb

    sql = gr.oracle_adamic_adar_sql(
        "edges AS (SELECT * FROM (VALUES (1, 2), (2, 3), (2, 4)) t(src, dst))",
        select="SELECT node_a, node_b, n_common, score FROM {last}",
        max_degree=None,
    )
    out = duckdb.sql(sql).fetchall()
    assert len(out) == 3  # pairs (1,3),(1,4),(3,4) through z=2

# ---------------------------------------------------------------------------
# neyman_allocation
# ---------------------------------------------------------------------------

def test_neyman_allocation_favors_big_volatile_strata(spark):
    import random

    from bullet_spark_spark.operators import sampling as smp

    rng = random.Random(7)
    rows = [("big_flat", 100.0 + rng.uniform(-0.01, 0.01)) for _ in range(500)]
    rows += [("small_wild", rng.uniform(0, 1000)) for _ in range(100)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r
        for r in smp.neyman_allocation(df, ["g"], "v", 100).collect()
    }
    # 100 volatile rows out-earn 500 near-constant ones
    assert got["small_wild"]["alloc_n"] > got["big_flat"]["alloc_n"]
    assert sum(r["alloc_n"] for r in got.values()) <= 100  # floor: never over
    assert abs(sum(r["share"] for r in got.values()) - 1.0) < 1e-5


def test_neyman_allocation_matches_reference(spark):
    import math
    import random

    from bullet_spark_spark.operators import sampling as smp

    rng = random.Random(3)
    data = {
        "a": [rng.gauss(10, 2) for _ in range(200)],
        "b": [rng.gauss(50, 20) for _ in range(80)],
        "c": [rng.gauss(5, 0.5) for _ in range(300)],
    }
    rows = [(g, round(v, 3)) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r for r in smp.neyman_allocation(df, ["g"], "v", 500).collect()
    }
    ws = {}
    for g, vs in data.items():
        vs = [round(v, 3) for v in vs]
        n = len(vs)
        m = sum(vs) / n
        sd = math.sqrt(sum((x - m) ** 2 for x in vs) / (n - 1))
        ws[g] = round(n * sd, 6)
    tw = sum(ws.values())
    for g in data:
        assert got[g]["n_rows"] == len(data[g])
        assert abs(got[g]["weight"] - ws[g]) < 1e-4
        assert got[g]["alloc_n"] == math.floor(500.0 * ws[g] / tw)


def test_neyman_singleton_stratum_gets_zero_sd(spark):
    from bullet_spark_spark.operators import sampling as smp

    df = spark.createDataFrame(
        [("a", 5.0), ("b", 1.0), ("b", 3.0)], "g string, v double"
    )
    got = {
        r["g"]: r for r in smp.neyman_allocation(df, ["g"], "v", 10).collect()
    }
    assert got["a"]["sd"] == 0.0 and got["a"]["alloc_n"] == 0
    assert got["b"]["alloc_n"] == 10  # all weight on the only varying stratum
