"""One-off phase breakdown for dedup_containment_pairs (guide §1) —
VERDICT r11 task 4: the most expensive query never touched by an
optimization round. Mirrors tools/phase_wjaccard.py."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry
from bullet_spark_spark import get_spark
from bullet_spark_spark.operators import dedup as dd
from bullet_spark_spark.operators.dedup import df_capped_postings, widen_thin_input, word_shingles
from pyspark import StorageLevel
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="phase-containment")
t = entry._t(spark, SF)
docs = t["documents"]
docs.limit(1).collect()  # warmup

t0 = time.time()
base = widen_thin_input(docs)
grams = (
    base.select(
        F.col("doc_id").alias("id"),
        F.explode(word_shingles(F.col("text"), 3)).alias("gram"),
    )
    .filter(F.length("gram") > 0)
    .distinct()
)
grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
ng = grams.count()
t1 = time.time()
print(f"grams cache fill (explode+distinct): {t1-t0:.2f}s rows={ng}")

n_docs = docs.select("doc_id").distinct().count()
t2 = time.time()
print(f"n_docs distinct count: {t2-t1:.2f}s n={n_docs}")

capped = df_capped_postings(
    grams, "gram", max_df=100_000, max_df_frac=0.5, n_docs=n_docs
)
nc = capped.count()
t3 = time.time()
print(f"df_capped (incl. eager drop count): {t3-t2:.2f}s rows={nc}")

a, b = capped.alias("a"), capped.alias("b")
shared = (
    a.join(
        b,
        (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")),
    )
    .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    .agg(F.count(F.lit(1)).alias("shared"))
)
npairs = shared.count()
t4 = time.time()
print(f"posting self-join + pair agg: {t4-t3:.2f}s pairs={npairs}")

qs = entry.queries()
full = qs["dedup_containment_pairs"](spark, SF)
nf = full.count()
t5 = time.time()
print(f"FULL query (fresh, incl. all of the above): {t5-t4:.2f}s rows={nf}")
grams.unpersist()
