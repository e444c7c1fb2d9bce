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


def test_overwrite_partitions_is_incremental(spark, tables, tmp_path):
    """Dynamic partition overwrite replaces only the partition values in
    the incoming frame; other partitions survive byte-for-byte — the
    idempotent daily-backfill contract (a static overwrite would delete
    the whole table)."""
    import bullet_spark_spark.sources.write as wr

    path = str(tmp_path / "events_by_type")
    ev = tables["events"].select("event_id", "event_type", "value")
    wr.write_partitioned(ev, path, ["event_type"])
    before = spark.read.parquet(path)
    n_total = before.count()
    n_click = before.filter(F.col("event_type") == "click").count()

    # backfill ONLY the 'click' partition with doubled values
    patch = ev.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") * 2
    )
    wr.overwrite_partitions(patch, path, ["event_type"])

    after = spark.read.parquet(path)
    assert after.count() == n_total  # nothing else was deleted
    assert after.filter(F.col("event_type") == "click").count() == n_click
    # the patched partition changed; an untouched one did not
    s_before = before.filter(F.col("event_type") == "view").agg(F.sum("value")).collect()
    s_after = after.filter(F.col("event_type") == "view").agg(F.sum("value")).collect()
    assert s_before == s_after
    c_after = after.filter(F.col("event_type") == "click").agg(
        F.round(F.sum("value"), 4).alias("s")
    ).collect()[0]["s"]
    c_expected = ev.filter(F.col("event_type") == "click").agg(
        F.round(F.sum("value") * 2, 4).alias("s")
    ).collect()[0]["s"]
    assert abs(c_after - c_expected) < 1e-6
    # session default restored (the dynamic mode was scoped to the write)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == "static"
    )


def test_write_zordered_prunes_both_dims(spark, tables, tmp_path):
    """Z-order layout keeps per-file min/max stats narrow in BOTH
    dimensions: a small box predicate on (user_id, value) must intersect
    fewer files than a linear user_id-sorted layout with the same file
    count."""
    import pyarrow.parquet as pq

    ev = tables["events"].select("event_id", "user_id", "value")
    n_files = 32
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    wr.write_zordered(ev, zpath, ["user_id", "value"], num_files=n_files, bits=5)
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(lpath)
    )

    lo = ev.selectExpr(
        "min(user_id) umin", "max(user_id) umax",
        "min(value) vmin", "max(value) vmax",
    ).collect()[0]

    def files_hit(path, ubox, vbox):
        """-> (intersecting files, total files)"""
        import glob

        hit = total = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            umin = vmin = float("inf")
            umax = vmax = float("-inf")
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if st is None:
                        continue
                    if name == "user_id":
                        umin, umax = min(umin, st.min), max(umax, st.max)
                    elif name == "value":
                        vmin, vmax = min(vmin, st.min), max(vmax, st.max)
            total += 1
            if umin <= ubox[1] and umax >= ubox[0] and vmin <= vbox[1] and vmax >= vbox[0]:
                hit += 1
        return hit, total

    full_u = (lo["umin"], lo["umax"])
    full_v = (lo["vmin"], lo["vmax"])
    narrow_v = (lo["vmin"], lo["vmin"] + (lo["vmax"] - lo["vmin"]) * 0.1)
    narrow_u = (lo["umin"], lo["umin"] + (lo["umax"] - lo["umin"]) * 0.1)

    # the z-order payoff: a filter on the NON-LEADING dimension alone.
    # linear (user-sorted) files all span the full value range -> 0 skipped;
    # z-ordered files have narrow value stats -> most are skipped
    z_v, z_n = files_hit(zpath, full_u, narrow_v)
    l_v, l_n = files_hit(lpath, full_u, narrow_v)
    assert l_v == l_n  # linear layout cannot skip a single file
    assert z_v / z_n <= 0.5, (z_v, z_n)
    # and the leading dimension still prunes most z files too (partial
    # pruning in EVERY dimension is the contract, perfection in none)
    z_u, _ = files_hit(zpath, narrow_u, full_v)
    assert z_u / z_n <= 0.5, z_u
    # and the rewrite is lossless
    assert spark.read.parquet(zpath).count() == ev.count()
    got = spark.read.parquet(zpath).agg(F.sum("event_id")).collect()[0][0]
    want = ev.agg(F.sum("event_id")).collect()[0][0]
    assert got == want


def test_dynamic_partition_pruning_fires_on_star_join(spark, tables, tmp_path):
    """Dynamic partition pruning — the star-schema runtime prune: a fact
    table partitioned on the join key, joined to a dim with a selective
    filter, scans ONLY the partitions the filtered dim reaches. The scan
    carries a dynamicpruning expression and the fact read drops to the
    matching partition count — the Catalyst feature that turns a 100 TB
    partitioned fact scan into a few directories without any hand-written
    predicate."""
    import bullet_spark_spark.sources.write as wr

    fact_path = str(tmp_path / "fact")
    ev = tables["events"].select("event_type", "user_id", "value")
    wr.write_partitioned(ev, fact_path, ["event_type"])
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 2.0), ("purchase", 3.0),
         ("signup", 4.0), ("error", 5.0)],
        "event_type string, weight double",
    ).filter(F.col("weight") < 1.5)  # selects exactly one partition value

    joined = fact.join(dim, "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]
    got = joined.collect()[0]["cnt"]
    want = ev.filter(F.col("event_type") == "click").count()
    assert got == want
