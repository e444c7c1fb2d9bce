"""shard_and_order (sampling.py) and profile_columns (quality.py) tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import quality as ql
from bullet_spark_spark.operators import sampling as smp


def test_shard_and_order_is_a_partitioned_permutation(spark):
    df = spark.range(200).withColumnRenamed("id", "k")
    out = smp.shard_and_order(df, "k", n_shards=4, seed=1).collect()
    assert len(out) == 200
    assert {r["k"] for r in out} == set(range(200))
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # pos is dense 1..k within every shard
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shard_and_order_partitioning_invariant(spark):
    # the permutation must not depend on the input's physical layout
    df1 = spark.range(100).withColumnRenamed("id", "k").repartition(1)
    df2 = spark.range(100).withColumnRenamed("id", "k").repartition(13)
    a = {(r["k"], r["shard"], r["pos"]) for r in
         smp.shard_and_order(df1, "k", 5, seed=3).collect()}
    b = {(r["k"], r["shard"], r["pos"]) for r in
         smp.shard_and_order(df2, "k", 5, seed=3).collect()}
    assert a == b


def test_shard_and_order_seed_changes_permutation(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    a = {(r["k"], r["shard"]) for r in smp.shard_and_order(df, "k", 5, 0).collect()}
    b = {(r["k"], r["shard"]) for r in smp.shard_and_order(df, "k", 5, 1).collect()}
    assert a != b


def test_hash32_matches_duckdb(spark, duck):
    keys = ["0", "42", "doc-7"]
    got = (
        spark.createDataFrame([(k,) for k in keys], "k string")
        .select("k", smp.hash32(F.col("k"), seed=9).alias("h"))
        .collect()
    )
    for r in got:
        (exp,) = duck.execute(
            f"SELECT ('0x' || substr(md5('{r['k']}:9'), 1, 8))::BIGINT"
        ).fetchone()
        assert r["h"] == exp


def test_profile_columns_known_stats(spark):
    df = spark.createDataFrame(
        [(1.0, "ab"), (2.0, "abcd"), (None, "ab"), (3.0, None)],
        "v double, s string",
    )
    rows = {
        r["column"]: r
        for r in ql.profile_columns(df, numeric_cols=["v"], string_cols=["s"]).collect()
    }
    v = rows["v"]
    assert (v["kind"], v["n_rows"], v["nulls"], v["n_distinct"]) == ("numeric", 4, 1, 3)
    assert (v["min_num"], v["max_num"]) == (1.0, 3.0)
    assert v["mean"] == pytest.approx(2.0)
    s = rows["s"]  # string column profiles LENGTHS
    assert (s["kind"], s["nulls"], s["n_distinct"]) == ("string", 1, 2)
    assert (s["min_num"], s["max_num"]) == (2.0, 4.0)
    assert s["mean"] == pytest.approx((2 + 4 + 2) / 3, abs=1e-6)


def test_profile_columns_single_job(spark):
    # the report is ONE aggregation plan — no per-column union of scans
    df = spark.range(10).select(
        F.col("id").cast("double").alias("a"), F.col("id").cast("string").alias("b")
    )
    plan = (
        ql.profile_columns(df, ["a"], ["b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan") <= 1


def test_profile_columns_approx_mode_and_errors(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("a"))
    (row,) = ql.profile_columns(df, ["a"], approx_distinct=True).collect()
    assert abs(row["n_distinct"] - 100) <= 5
    with pytest.raises(ValueError):
        ql.profile_columns(df)


def test_winsorize_clips_tails(spark):
    from bullet_spark_spark.operators import distribution as dist

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)] + [(None,)], "v double"
    )
    out = dist.winsorize(df, "v", 0.10, 0.90, out_col="w")
    rows = out.collect()
    vals = [r["w"] for r in rows if r["w"] is not None]
    # exact linear-interp 10%/90% of 1..100 = 10.9 / 90.1 (ulp-tolerant:
    # the interpolated cutoff differs from the literal in the last bit)
    assert min(vals) == pytest.approx(10.9, abs=1e-9)
    assert max(vals) == pytest.approx(90.1, abs=1e-9)
    assert sum(1 for v in vals if v == min(vals)) == 10  # 1..10 all clip up
    assert any(r["w"] is None for r in rows)  # NULL passes through
    mid = [r for r in rows if r["w"] == 50.0]
    assert len(mid) == 1  # interior values untouched


def test_fd_violations_detects_and_certifies(spark):
    from bullet_spark_spark.operators import quality as qlq

    df = spark.createDataFrame(
        [("z1", "cityA"), ("z1", "cityB"), ("z2", "cityC"), ("z2", "cityC"),
         ("z3", None), ("z3", "cityD")],
        "zip string, city string",
    )
    rows = {r["zip"]: r for r in qlq.fd_violations(df, ["zip"], "city").collect()}
    assert set(rows) == {"z1", "z3"}  # z2 holds; NULL vs value violates
    assert rows["z1"]["n_rhs_values"] == 2
    assert rows["z1"]["rhs_examples"] == ["cityA", "cityB"]
    assert rows["z3"]["rhs_examples"] == ["\x00", "cityD"]  # NULL encodes chr(0)
    # examples=0 skips the set entirely
    cols = qlq.fd_violations(df, ["zip"], "city", examples=0).columns
    assert "rhs_examples" not in cols


def test_mad_outliers_flags_and_zero_mad(spark):
    from bullet_spark_spark.operators import distribution as dist

    # median 5, MAD = 1 (deviations 0..4 -> median 2? construct simply):
    vals = [1.0, 4.0, 5.0, 5.0, 6.0, 9.0, 100.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = {r["v"]: r["is_outlier"] for r in dist.mad_outliers(df, "v", k=3.0).collect()}
    assert rows[100.0] is True     # far tail flagged
    assert rows[5.0] is False      # the median is never an outlier
    assert rows[None] is None      # NULL passes through as NULL
    # zero-MAD: >50% constant — any deviation flags
    df2 = spark.createDataFrame([(2.0,), (2.0,), (2.0,), (7.0,)], "v double")
    rows2 = [(r["v"], r["is_outlier"]) for r in dist.mad_outliers(df2, "v").collect()]
    assert (7.0, True) in rows2 and (2.0, False) in rows2
