"""Round-5 operator semantics: ewma, tf-idf cosine pairs, containment
pairs, Benford digit report (each also oracle-checked via __spark_entry__)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import dedup as dd
from bullet_spark_spark.operators import quality as ql
from bullet_spark_spark.operators import temporal as tmp


def test_ewma_constant_series_is_constant(spark):
    df = spark.createDataFrame(
        [("k", f"2024-01-01 00:0{i}:00", 5.0) for i in range(5)],
        "key string, ts string, v double",
    ).select("key", F.to_timestamp("ts").alias("ts"), "v")
    out = tmp.ewma(df, "key", "ts", "v", alpha=0.3, span_rows=3)
    assert all(r["ewma"] == 5.0 for r in out.collect())


def test_ewma_matches_hand_computation(spark):
    # alpha=0.5 -> c=0.5; series 1,2,4 with span 3:
    # row2 ewma = (4 + 0.5*2 + 0.25*1) / (1 + 0.5 + 0.25) = 5.25/1.75 = 3.0
    df = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", 1.0),
         ("k", "2024-01-01 00:01:00", 2.0),
         ("k", "2024-01-01 00:02:00", 4.0)],
        "key string, ts string, v double",
    ).select("key", F.to_timestamp("ts").alias("ts"), "v")
    out = {r["v"]: r["ewma"] for r in tmp.ewma(df, "key", "ts", "v", 0.5, 3).collect()}
    assert out[1.0] == 1.0
    assert out[2.0] == pytest.approx((2 + 0.5 * 1) / 1.5)
    assert out[4.0] == pytest.approx(3.0)


def test_tfidf_cosine_identical_docs_score_one(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        "doc_id int, text string",
    )
    # max_df_frac=None: at 3 docs every shared term exceeds any useful
    # df fraction — the corpus-relative stop-term pruning is for real
    # corpora (its oracle row covers it), not 3-row fixtures
    pairs = {(r["id_a"], r["id_b"]): r["cos"]
             for r in dd.tfidf_cosine_pairs(df, min_cos=0.5, max_df_frac=None).collect()}
    assert pairs == {(1, 2): 1.0}


def test_containment_detects_embedded_doc(spark):
    small = "the quick brown fox jumps over dogs"
    big = "breaking news today " + small + " more unrelated trailing content here"
    df = spark.createDataFrame(
        [(1, big), (2, small), (3, "totally different text about spark engines")],
        "doc_id int, text string",
    )
    # max_df_frac=None: same 3-row-fixture convention as the tfidf test
    # above — the corpus-relative stop-gram prune is for real corpora
    out = {(r["id_a"], r["id_b"]): r["containment"]
           for r in dd.containment_pairs(
               df, n=3, min_containment=0.9, max_df_frac=None).collect()}
    assert out == {(1, 2): 1.0}  # every 3-gram of the small doc is in the big


def test_containment_max_df_prunes_universal_gram(spark):
    """VERDICT r5 task 5: a boilerplate trigram present in EVERY document
    must not make every document pair a candidate. With the prune, only
    genuinely-overlapping docs pair; without it, the universal gram makes
    all C(n,2) pairs candidates."""
    boiler = "all rights reserved"
    rows = [(i, f"unique{i}a word{i}b token{i}c {boiler}") for i in range(1, 11)]
    rows.append((11, rows[0][1]))  # one true duplicate of doc 1
    df = spark.createDataFrame(rows, "doc_id int, text string")

    exact = dd.containment_pairs(
        df, n=3, min_containment=0.01, max_df_frac=None
    ).count()
    pruned_pairs = dd.containment_pairs(
        df, n=3, min_containment=0.01, max_df_frac=0.5
    ).collect()
    # unpruned: the shared boiler gram links every pair → 55 candidates
    assert exact == 55
    # pruned: only the true duplicate pair survives, at full containment
    assert {(r["id_a"], r["id_b"]) for r in pruned_pairs} == {(1, 11)}
    assert pruned_pairs[0]["containment"] == 1.0


def test_benford_report_shape(spark, tables):
    rows = ql.benford_digit_report(tables["orders"], "o_totalprice").collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["expected"] == pytest.approx(math.log10(1 + 1 / r["digit"]), abs=1e-6)
        assert r["deviation"] == pytest.approx(r["share"] - r["expected"], abs=1e-5)


def test_k_anonymity_report_semantics(spark):
    from bullet_spark_spark.operators import quality as ql

    rows = [("a", 1, "x")] * 5 + [("a", 2, "y")] * 2 + [("b", 1, "x")] * 3
    df = spark.createDataFrame(rows, "q1 string, q2 int, s string")
    r = ql.k_anonymity_report(df, ["q1", "q2"], k=3, sensitive_col="s").collect()[0]
    assert r["n_rows"] == 10
    assert r["n_classes"] == 3
    assert r["min_class_size"] == 2      # the ("a",2) class
    assert r["anonymity_k"] == 2         # dataset is only 2-anonymous
    assert r["n_violating_classes"] == 1
    assert r["n_violating_rows"] == 2
    assert r["min_l_diversity"] == 1     # every class has one sensitive value


def test_ks_two_sample_extremes(spark):
    from bullet_spark_spark.operators import distribution as dist

    same = spark.createDataFrame([(float(i % 7),) for i in range(100)], "v double")
    r = dist.ks_two_sample(same, same, "v").collect()[0]
    assert r["d_stat"] == 0.0 and r["p_approx"] == 1.0
    lo = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    hi = spark.createDataFrame([(float(i + 1000),) for i in range(50)], "v double")
    r2 = dist.ks_two_sample(lo, hi, "v").collect()[0]
    assert r2["d_stat"] == 1.0  # disjoint supports: maximal separation
    assert r2["p_approx"] == 0.0
    assert (r2["n_a"], r2["n_b"]) == (50, 50)


def test_compression_ratio_separates_degenerate_text(spark):
    from bullet_spark_spark.operators import text as tx

    import random

    rng = random.Random(7)
    prose = (
        "the quick brown fox jumps over the lazy dog while a distributed "
        "engine aggregates partial results across many executor cores "
    ) * 4
    repetitive = "spam " * 120
    noise = "".join(chr(rng.randint(33, 0x2FA0)) for _ in range(400))
    df = spark.createDataFrame(
        [(1, prose), (2, repetitive), (3, noise)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["compression_ratio"]
           for r in tx.compression_ratio(df).collect()}
    assert got[2] < got[1] < got[3]       # boilerplate << prose << noise
    assert got[2] < 0.1 and got[3] > 0.7


def test_incremental_join_delta_equals_recompute(spark):
    """Applying the incremental change set to the old view reproduces the
    new view EXACTLY — multiplicities included (duplicate rows on both
    sides exercise the counting algorithm's multiset arithmetic)."""
    from collections import Counter

    from bullet_spark_spark.operators import relational as rel

    a_old = spark.createDataFrame(
        [(1, "k1"), (1, "k1"), (2, "k2"), (3, "k3")], "aid int, k string"
    )
    a_new = spark.createDataFrame(
        [(1, "k1"), (2, "k2"), (2, "k2"), (4, "k1")], "aid int, k string"
    )
    b_old = spark.createDataFrame(
        [("k1", "x"), ("k2", "y"), ("k2", "y")], "k string, v string"
    )
    b_new = spark.createDataFrame(
        [("k1", "x"), ("k1", "z"), ("k2", "y")], "k string, v string"
    )
    delta = rel.incremental_join_delta(a_old, a_new, b_old, b_new, on=["k"])
    applied = Counter()
    for r in a_old.join(b_old, "k").collect():
        applied[(r["k"], r["aid"], r["v"])] += 1
    for r in delta.collect():
        applied[(r["k"], r["aid"], r["v"])] += r["__delta"]
    want = Counter()
    for r in a_new.join(b_new, "k").collect():
        want[(r["k"], r["aid"], r["v"])] += 1
    assert {k: v for k, v in applied.items() if v} == dict(want)


def test_asof_directional_semantics(spark):
    from bullet_spark_spark.operators import temporal as tmp2

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:10:00"), ("k", "2024-01-01 00:20:00"),
         ("k", "2024-01-01 00:30:00")],
        "key string, ts string",
    ).select("key", F.to_timestamp("ts").alias("ts"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:08:00", 1.0),   # 2 min before first
         ("k", "2024-01-01 00:21:00", 2.0),   # 1 min after second
         ("k", "2024-01-01 00:45:00", 3.0)],  # far after third
        "key string, rts string, v double",
    ).select("key", F.to_timestamp("rts").alias("rts"), "v")

    def run(direction):
        out = tmp2.asof_join_directional(
            left, right, ["key"], "ts", "rts", ["v"], direction=direction
        )
        return {r["ts"].minute: r["v"] for r in out.collect()}

    assert run("backward") == {10: 1.0, 20: 1.0, 30: 2.0}
    assert run("forward") == {10: 2.0, 20: 2.0, 30: 3.0}
    # nearest: 00:10 -> 00:08 (2min back beats 11min fwd);
    # 00:20 -> 00:21 (1min fwd beats 12min back); 00:30 -> 00:21 (9 vs 15)
    assert run("nearest") == {10: 1.0, 20: 2.0, 30: 2.0}


def test_asof_directional_matches_duckdb(spark, tables, duck):
    """Forward/nearest against correlated-subquery oracles on real data
    (matched timestamps compared; values ride the same match)."""
    from bullet_spark_spark.operators import temporal as tmp2

    ev = tables["events"].filter(F.col("user_id") % 25 == 0)
    left = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("rts"), "value"
    )
    got = {
        (r["user_id"], r["ts"]): r["rts_matched"]
        for r in tmp2.asof_join_directional(
            left, right, ["user_id"], "ts", "rts", ["value"], direction="forward"
        ).collect()
    }
    want = {
        (r[0], r[1]): r[2]
        for r in duck.execute(
            """SELECT l.user_id, l.ts,
                      (SELECT min(r.ts) FROM events r
                       WHERE r.event_type = 'purchase' AND r.user_id % 25 = 0
                         AND r.user_id = l.user_id AND r.ts >= l.ts) AS m
               FROM events l
               WHERE l.event_type = 'click' AND l.user_id % 25 = 0"""
        ).fetchall()
    }
    assert got == want


def test_plan_lsh_bands():
    from bullet_spark_spark.operators import dedup as dd2

    b, r, thr = dd2.plan_lsh_bands(0.8, 64)
    assert b * r == 64
    assert abs(thr - 0.8) < 0.1
    # monotonic: a lower target picks MORE bands (lower threshold)
    b_lo, _, thr_lo = dd2.plan_lsh_bands(0.4, 64)
    assert b_lo >= b and thr_lo < thr
    with pytest.raises(ValueError):
        dd2.plan_lsh_bands(1.5, 64)


def test_hot_keys_report(spark):
    from bullet_spark_spark.operators import quality as ql

    rows = [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    got = {r["k"]: (r["n"], r["share"], r["skew_factor"])
           for r in ql.hot_keys_report(df, ["k"], top=2).collect()}
    assert set(got) == {"hot", "warm"}  # top-2 only
    assert got["hot"] == (80, 0.8, pytest.approx(80 / (100 / 3), abs=1e-6))


def test_referential_integrity_report(spark):
    from bullet_spark_spark.operators import quality as ql

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None), (5, 20)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    r = ql.referential_integrity_report(child, parent, ["fk"], ["pk"]).collect()[0]
    assert r["n_child"] == 5
    assert r["n_child_null_fk"] == 1   # NULL FK never violates
    assert r["n_orphans"] == 1         # fk=99
    assert r["orphan_fraction"] == 0.25


def test_profile_diff_detects_null_and_mean_drift(spark):
    from bullet_spark_spark.operators import quality as ql

    old = spark.createDataFrame(
        [(float(i),) for i in range(10)], "v double"
    )
    new = spark.createDataFrame(
        [(float(i) + 100,) for i in range(8)] + [(None,), (None,)], "v double"
    )
    r = {row["column"]: row
         for row in ql.profile_diff(old, new, numeric_cols=["v"]).collect()}["v"]
    assert r["null_frac_old"] == 0.0
    assert r["null_frac_new"] == 0.2
    assert r["null_frac_delta"] == 0.2
    assert r["mean_delta"] == pytest.approx(103.5 - 4.5, abs=1e-6)
