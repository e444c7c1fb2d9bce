"""snapshot_diff (quality.py) and merge_upsert (sources/write.py) tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bullet_spark_spark.operators import quality as ql
from bullet_spark_spark.sources import write as wr


def test_snapshot_diff_classifies_all_change_kinds(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish"), (4, None)],
        "k long, v string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (5, "brand new"), (4, None)],
        "k long, v string",
    )
    got = {r["k"]: r["change"] for r in ql.snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_null_vs_empty_differ(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "")], "k long, v string")
    (row,) = ql.snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert row["change"] == "changed"


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, "a")], "k long, v string")
    got = ql.snapshot_diff(old, old, ["k"], ["v"], include_unchanged=True).collect()
    assert [(r["k"], r["change"]) for r in got] == [(1, "unchanged")]


def _read_state(spark, path):
    return {
        (r["k"], r["day"]): r["v"]
        for r in spark.read.parquet(path).collect()
    }


def test_merge_upsert_partitioned_touches_only_affected_dirs(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c"), (4, "d3", "d")],
        "k long, day string, v string",
    )
    wr.write_partitioned(base, path, ["day"])
    untouched_dir = os.path.join(path, "day=d3")
    before = {
        f: os.path.getmtime(os.path.join(untouched_dir, f))
        for f in os.listdir(untouched_dir)
        if f.endswith(".parquet")
    }
    updates = spark.createDataFrame(
        [(2, "d1", "B2"), (9, "d2", "new")], "k long, day string, v string"
    )
    wr.merge_upsert(spark, path, updates, ["k"], ["day"])
    assert _read_state(spark, path) == {
        (1, "d1"): "a", (2, "d1"): "B2", (3, "d2"): "c",
        (9, "d2"): "new", (4, "d3"): "d",
    }
    after = {
        f: os.path.getmtime(os.path.join(untouched_dir, f))
        for f in os.listdir(untouched_dir)
        if f.endswith(".parquet")
    }
    assert after == before  # untouched partition's files not rewritten


def test_merge_upsert_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).write.parquet(path)
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    wr.merge_upsert(spark, path, updates, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_merge_upsert_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "idem")
    base = spark.createDataFrame(
        [(1, "d1", "a"), (2, "d2", "b")], "k long, day string, v string"
    )
    wr.write_partitioned(base, path, ["day"])
    updates = spark.createDataFrame([(1, "d1", "A")], "k long, day string, v string")
    wr.merge_upsert(spark, path, updates, ["k"], ["day"])
    wr.merge_upsert(spark, path, updates, ["k"], ["day"])  # re-run = same state
    assert _read_state(spark, path) == {(1, "d1"): "A", (2, "d2"): "b"}


def test_streaming_cdc_apply_converges(spark, tmp_path):
    """Streaming CDC: a change stream applied per micro-batch through
    merge_upsert — the table converges to last-write-wins state (batch
    boundaries are deterministic via file_drip's maxFilesPerTrigger)."""
    from bullet_spark_spark.sources.streaming import file_drip

    path = str(tmp_path / "cdc_tbl")
    spark.createDataFrame(
        [(1, "d1", "a0"), (2, "d1", "b0"), (3, "d2", "c0")],
        "k long, day string, v string",
    ).write.partitionBy("day").parquet(path)

    # 4 chunks of updates; later chunks overwrite earlier keys
    changes = spark.createDataFrame(
        [(1, "d1", "a1"), (2, "d1", "b1"), (4, "d2", "new4"),
         (1, "d1", "a2")],
        "k long, day string, v string",
    )
    stream = file_drip(spark, changes, str(tmp_path / "drip"), chunks=4)

    def apply_batch(batch, epoch_id):
        if batch.isEmpty():
            return
        # within a micro-batch, last event per key wins (no ordering col in
        # this fixture: any single row per key per chunk)
        wr.merge_upsert(spark, path, batch, ["k"], ["day"])

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got[2] == "b1" and got[3] == "c0" and got[4] == "new4"
    assert got[1] in ("a1", "a2")  # both chunks touched k=1; one applied last
    assert set(got) == {1, 2, 3, 4}


def test_streaming_incremental_view_maintenance(spark, tmp_path):
    """Streaming materialized view: per micro-batch, arriving after-images
    patch a grouped aggregate via incremental_group_update; the final
    table equals a fresh aggregation over everything that arrived."""
    from bullet_spark_spark.operators import relational as rel
    from bullet_spark_spark.sources.streaming import file_drip

    seed = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k long, g string, v double"
    )
    view = {"df": rel.group_snapshot_agg(seed, ["g"], [("v", "sv")])
            .localCheckpoint(eager=True)}

    arrivals = spark.createDataFrame(
        [(3, "a", 10.0), (4, "c", 5.0), (5, "b", 0.5), (6, "c", 2.5)],
        "k long, g string, v double",
    )
    stream = file_drip(spark, arrivals, str(tmp_path / "drip"), chunks=2)

    def apply_batch(batch, epoch_id):
        if batch.isEmpty():
            return
        empty = batch.filter(F.lit(False))  # inserts only: no before-images
        view["df"] = rel.incremental_group_update(
            view["df"], empty, batch, ["g"], [("v", "sv")]
        ).localCheckpoint(eager=True)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)

    got = {r["g"]: (r["n_rows"], float(r["sv"])) for r in view["df"].collect()}
    want = {
        r["g"]: (r["n_rows"], float(r["sv"]))
        for r in rel.group_snapshot_agg(
            seed.unionByName(arrivals), ["g"], [("v", "sv")]
        ).collect()
    }
    assert got == want
