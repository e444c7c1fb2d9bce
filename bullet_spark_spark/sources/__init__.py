from bullet_spark_spark.sources.batch import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
