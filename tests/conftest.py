from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light

from bullet_spark_spark import get_spark, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="bullet-spark-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same tables registered as views — the
    oracle side of the differential tests (SURVEY §5.2)."""
    import duckdb

    conn = duckdb.connect()
    from bullet_spark_spark.sources.batch import TABLES

    for name in TABLES:
        path = f"{SF_DIR}/{name}.parquet"
        if os.path.exists(path):
            conn.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield conn
    conn.close()
