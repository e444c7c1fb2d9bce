"""One-off phase breakdown for graph_cheapest_path (guide §1: measure first)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry
from bullet_spark_spark import get_spark
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="phase-cheapest")
t = entry._t(spark, SF)

# replicate the query's edge build
base = (
    t["orders"]
    .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
    .groupBy("o_custkey", "l_suppkey")
    .agg(F.count(F.lit(1)).alias("cnt"))
    .filter(F.col("cnt") >= 2)
    .select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        (F.lit(101) - F.least(F.col("cnt"), F.lit(100))).alias("w"),
    )
)
edges = base.select(
    F.explode(
        F.array(
            F.struct("src", "dst", "w"),
            F.struct(F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w")),
        )
    ).alias("e")
).select("e.*")

# warmup scan
t["lineitem"].limit(1).collect()

t0 = time.time()
ec = (
    edges.select("src", "dst", F.col("w").cast("long").alias("w"))
    .groupBy("src", "dst").agg(F.min("w").alias("w")).persist()
)
n = ec.count()
t1 = time.time()
print(f"ecols build+persist: {t1-t0:.2f}s  rows={n}")

srcs = t["supplier"].filter(F.col("s_nationkey") == 0).select(
    F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node")
)
best = srcs.distinct().withColumn("cost", F.lit(0).cast("long")).localCheckpoint()
t2 = time.time()
print(f"sources checkpoint: {t2-t1:.2f}s rows={best.count()}")

frontier = best
for hop in range(1, 4):
    h0 = time.time()
    cand = (
        frontier.join(ec, frontier["node"] == ec["src"])
        .select(F.col("dst").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
        .groupBy("node").agg(F.min("cost").alias("cost"))
    )
    merged = best.unionByName(cand).groupBy("node").agg(F.min("cost").alias("cost"))
    improved = (
        merged.join(best.withColumnRenamed("cost", "__old"), "node", "left")
        .filter(F.col("__old").isNull() | (F.col("cost") < F.col("__old")))
        .select("node", "cost").localCheckpoint()
    )
    ni = improved.count()
    h1 = time.time()
    best2 = merged.localCheckpoint()
    nb = best2.count()
    h2 = time.time()
    print(f"hop {hop}: improved={ni} ({h1-h0:.2f}s) best ckpt={nb} ({h2-h1:.2f}s)")
    if ni == 0:
        break
    best = best2
    frontier = improved
print("join plan for last hop cand:")
cand.explain()
