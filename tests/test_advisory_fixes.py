"""Regression tests for the round-4 ADVICE.md items (all five fixed in r5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.plans.bql import BQLError, parse_bql


def test_merge_upsert_null_partition_keeps_existing_rows(spark, tmp_path):
    """merge_upsert with a NULL partition value must read back the existing
    rows of the NULL partition before dynamic overwrite replaces its
    directory — a non-null-safe predicate read back zero rows and silently
    dropped non-superseded keys."""
    from bullet_spark_spark.sources.write import merge_upsert

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (3, "c", "p1")],
        "id int, v string, part string",
    )
    base.write.partitionBy("part").parquet(path)
    updates = spark.createDataFrame([(2, "B", None)], "id int, v string, part string")
    merge_upsert(spark, path, updates, key_cols=["id"], partition_cols=["part"])
    got = {
        (r["id"], r["v"], r["part"])
        for r in spark.read.parquet(path).collect()
    }
    # id=1 in the NULL partition survives; id=2 superseded; p1 untouched
    assert got == {(1, "a", None), (2, "B", None), (3, "c", "p1")}


def test_incremental_update_preserves_null_sum(spark):
    """A group whose values are ALL NULL must yield sum=NULL (matching a
    fresh recompute), not 0."""
    from bullet_spark_spark.operators.relational import (
        group_snapshot_agg,
        incremental_group_update,
    )

    old = spark.createDataFrame([], "k string, v double")
    new = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 1.0)], "k string, v double"
    )
    base = group_snapshot_agg(spark.createDataFrame([], "k string, v double"),
                              ["k"], [("v", "sum_v")])
    updated = incremental_group_update(base, old, new, ["k"], [("v", "sum_v")])
    recomputed = group_snapshot_agg(new, ["k"], [("v", "sum_v")])
    got = {r["k"]: (r["n_rows"], r["sum_v"]) for r in updated.collect()}
    want = {r["k"]: (r["n_rows"], r["sum_v"]) for r in recomputed.collect()}
    assert got == want
    assert got["a"][1] is None  # the all-NULL group: NULL, not 0


def test_snapshot_diff_null_keys_match(spark):
    """A row with a NULL key present in both snapshots is 'unchanged' (or
    'changed'), never a spurious added+removed pair."""
    from bullet_spark_spark.operators.quality import snapshot_diff

    old = spark.createDataFrame([(None, "x"), (1, "y")], "k int, v string")
    new = spark.createDataFrame([(None, "x"), (1, "z")], "k int, v string")
    got = {
        (r["k"], r["change"])
        for r in snapshot_diff(old, new, ["k"], ["v"], include_unchanged=True).collect()
    }
    assert got == {(None, "unchanged"), (1, "changed")}


def test_resample_ffill_null_observation_not_a_gap(spark):
    """A genuinely observed row whose first value column is NULL must NOT
    be flagged is_gap (and must not be forward-filled over)."""
    from bullet_spark_spark.operators.temporal import resample_ffill

    df = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00", 1.0),
            ("k", "2024-01-01 00:01:00", None),  # real NULL observation
            ("k", "2024-01-01 00:03:00", 4.0),   # minute 2 missing -> gap
        ],
        "key string, ts string, v double",
    ).select("key", F.to_timestamp("ts").alias("ts"), "v")
    rows = {
        r["bucket_ts"].minute: (r["v"], r["is_gap"])
        for r in resample_ffill(df, "key", "ts", ["v"], 60).collect()
    }
    assert rows[0] == (1.0, False)
    assert rows[1] == (1.0, False)  # observed (NULL ffilled) but NOT a gap
    assert rows[2] == (1.0, True)   # genuinely missing bucket
    assert rows[3] == (4.0, False)


def test_bql_lateral_view_alias_validation():
    """Keywords/operators are rejected as LATERAL VIEW aliases; EOF raises
    BQLError, not AttributeError."""
    parse_bql(
        "SELECT tag, COUNT(*) AS n FROM STREAM() "
        "LATERAL VIEW EXPLODE(tags) AS tag GROUP BY tag"
    )  # sane alias parses
    for bad in (
        "SELECT t FROM STREAM() LATERAL VIEW EXPLODE(tags) AS WHERE",
        "SELECT t FROM STREAM() LATERAL VIEW EXPLODE(tags) AS ,",
        "SELECT t FROM STREAM() LATERAL VIEW EXPLODE(tags) AS",
    ):
        with pytest.raises(BQLError):
            parse_bql(bad)
