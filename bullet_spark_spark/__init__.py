"""bullet_spark_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of bullet-db/bullet-spark.

Architecture (SURVEY.md §7): queries compile to DataFrame *plans* (Catalyst
optimizes them), not queries-as-data as in the reference's DStream topology
(cf. /root/reference FilterStreaming.scala:38-71). Batch queries execute
immediately; streaming queries run as independent StreamingQuery handles over
shared sources with an engine runtime for Bullet's query lifecycle.
"""

from bullet_spark_spark.session import get_spark
from bullet_spark_spark.sources.batch import load_table, load_tables, TABLES

__all__ = ["get_spark", "load_table", "load_tables", "TABLES"]
__version__ = "0.1.0"
