"""Write-side layout helpers: partition pruning reaches the scan, one file
per partition value, bucketed joins skip their Exchange, compaction
right-sizes file counts."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from bullet_spark_spark.sources import write as wr


def test_write_partitioned_prunes_and_one_file_per_value(spark, tables, tmp_path):
    path = str(tmp_path / "events_by_type")
    wr.write_partitioned(
        tables["events"], path, ["event_type"], sort_cols=["ts"]
    )
    # one data file per partition value — not (#tasks × #values)
    for d in glob.glob(os.path.join(path, "event_type=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)

    back = spark.read.parquet(path)
    assert back.count() == tables["events"].count()

    # a filter on the partition column prunes directories, not rows:
    # it appears as a PartitionFilter on the scan, NOT a post-scan Filter
    plan = (
        back.filter(F.col("event_type") == "click")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan
    got = back.filter(F.col("event_type") == "click").count()
    want = tables["events"].filter(F.col("event_type") == "click").count()
    assert got == want


def test_write_partitioned_max_records_splits_large_values(spark, tables, tmp_path):
    path = str(tmp_path / "events_capped")
    total = tables["events"].count()
    cap = max(1, total // 10)
    wr.write_partitioned(tables["events"], path, ["event_type"], max_records_per_file=cap)
    for d in glob.glob(os.path.join(path, "event_type=*")):
        n_rows = spark.read.parquet(d).count()
        n_files = len([f for f in os.listdir(d) if f.endswith(".parquet")])
        assert n_files == -(-n_rows // cap), (d, n_rows, n_files)


def test_write_bucketed_join_elides_exchange(spark, tables):
    wr.write_bucketed(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        "wb_orders", ["o_orderkey"], 8,
    )
    wr.write_bucketed(
        tables["lineitem"].select("l_orderkey", "l_quantity"),
        "wb_lineitem", ["l_orderkey"], 8,
    )
    # at this tiny sf AQE would broadcast; disable so the plan shows the
    # bucket-driven SMJ a real fact⋈fact would use
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("wb_lineitem").join(
            spark.table("wb_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located buckets join shuffle-free
        want = (
            tables["lineitem"]
            .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS wb_orders")
        spark.sql("DROP TABLE IF EXISTS wb_lineitem")


def test_compact_small_files(spark, tables, tmp_path):
    path = str(tmp_path / "shattered")
    ev = tables["events"]
    total = ev.count()
    ev.repartition(64).write.parquet(path)  # simulate a small-file accretion
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 64

    files = wr.compact_small_files(spark, path, target_file_rows=-(-total // 4))
    assert files == 4
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 4
    assert spark.read.parquet(path).count() == total
