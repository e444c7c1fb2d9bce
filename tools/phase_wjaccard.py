"""One-off phase breakdown for dedup_weighted_jaccard (guide §1)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry
from bullet_spark_spark import get_spark
from bullet_spark_spark.operators import dedup as dd
from bullet_spark_spark.operators.dedup import _gram_tf, _persist_sigs, df_capped_postings
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="phase-wjaccard")
t = entry._t(spark, SF)
docs = t["documents"]
docs.limit(1).collect()  # warmup

t0 = time.time()
tf = _persist_sigs(_gram_tf(docs, "doc_id", "text", 3))
ntf = tf.count()
t1 = time.time(); print(f"tf cache fill: {t1-t0:.2f}s rows={ntf}")

n_docs = docs.count()
t2 = time.time(); print(f"n_docs count: {t2-t1:.2f}s n={n_docs}")

tfc = df_capped_postings(tf, "gram", max_df=100_000, max_df_frac=0.5, n_docs=n_docs)
ntfc = tfc.count()
t3 = time.time(); print(f"df_capped: {t3-t2:.2f}s rows={ntfc}")

totals = tfc.groupBy("id").agg(F.sum("tf").alias("total"))
a, b = tfc.alias("a"), tfc.alias("b")
inter = (
    a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
    .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    .agg(F.sum(F.least(F.col("a.tf"), F.col("b.tf"))).alias("__im"))
)
ni = inter.count()
t4 = time.time(); print(f"self-join+agg: {t4-t3:.2f}s pairs={ni}")

ta = totals.select(F.col("id").alias("id_a"), F.col("total").alias("__ta"))
tb = totals.select(F.col("id").alias("id_b"), F.col("total").alias("__tb"))
out = (
    inter.join(ta, "id_a").join(tb, "id_b")
    .select("id_a", "id_b",
            F.round(F.col("__im") / (F.col("__ta") + F.col("__tb") - F.col("__im")), 6).alias("wjaccard"))
    .filter(F.col("wjaccard") >= 0.4)
)
no = out.count()
t5 = time.time(); print(f"totals joins+filter: {t5-t4:.2f}s rows={no}")
print(f"TOTAL: {t5-t0:.2f}s")
