"""Batch source registry.

The reference's pluggable ``DataProducer``/DSL source stack
(DataProducer.scala:22-58, DSLDataProducer.scala:20-31) reduces, in a
Spark-first engine, to ``spark.read.format(...)`` plus a view registry:
Catalyst handles column pruning and predicate pushdown into the scan, which
the reference (a record-at-a-time interpreter) cannot do at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Footer-only metadata read — O(1), driver-side."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    schema = pq.read_schema(path)
    out = []
    for f in schema:
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            out.append(f.name)
    return out


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one synthetic table as a DataFrame (parquet scan, prunable).

    The driver-generated fixtures store timestamps as TIMESTAMP(NANOS);
    Spark has no nanosecond timestamp type, so we read them as epoch-nanos
    longs (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    microsecond TimestampType — the same truncation DuckDB applies, keeping
    the oracle comparison exact.
    """
    path = f"{sf_dir}/{name}.parquet"
    ns_cols = _nanos_ts_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # integer division — float division would lose precision on int64
        # epoch-nanos (~1.7e18 > 2^53)
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every table; optionally register each as a temp view so
    ``spark.sql`` queries (and the BQL-ish surface) can reference them."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if not os.path.exists(path):
            continue
        df = load_table(spark, name, sf_dir)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
