"""RocksDB state store smoke test (SURVEY §2.1 P12 "RocksDB state store at
scale"; VERDICT r4 task 3).

`spark.sql.streaming.stateStore.providerClass` is a per-query SQL conf: it is
read when a streaming query STARTS, so setting it on the shared test session
right before `.start()` exercises the exact code path `get_spark(
rocksdb_state=True)` configures globally. The test proves three things
locally: (1) the RocksDB JNI provider loads inside this Spark build, (2) a
stateful aggregation over it produces the same answer as batch, (3) the
checkpoint actually contains RocksDB artifacts (changelog/zip files), i.e.
state really went through RocksDB rather than silently falling back to the
on-heap HDFSBacked provider.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bullet_spark_spark.session import ROCKSDB_PROVIDER
from bullet_spark_spark.sources.streaming import file_drip

_ROCKS_CONFS = {
    "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def test_rocksdb_provider_runs_stateful_agg(spark, tables, tmp_path):
    prior = {}
    for k, v in _ROCKS_CONFS.items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
        spark.conf.set(k, v)
    try:
        src = tables["events"].select("event_type", "value").limit(4000)
        stream = file_drip(spark, src, str(tmp_path / "in"), chunks=2)
        agg = stream.groupBy("event_type").agg(
            F.count("*").alias("cnt"), F.sum("value").alias("sv")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("rocksdb_smoke")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = {
            r["event_type"]: (r["cnt"], r["sv"])
            for r in spark.sql("SELECT * FROM rocksdb_smoke").collect()
        }
        want = {
            r["event_type"]: (r["cnt"], r["sv"])
            for r in src.groupBy("event_type")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
            .collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            # double SUM accumulation order differs between the two plans
            assert abs(got[k][1] - want[k][1]) < 1e-6

        # proof the state went through RocksDB: changelog checkpointing
        # writes *.changelog deltas (+ periodic *.zip snapshots) instead of
        # the HDFSBacked provider's *.delta files
        state_files = [p.name for p in (tmp_path / "ck" / "state").rglob("*") if p.is_file()]
        assert any(n.endswith((".changelog", ".zip")) for n in state_files), state_files
        assert not any(n.endswith(".delta") for n in state_files), state_files
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_get_spark_rocksdb_flag_sets_conf():
    """The factory flag wires the provider + changelog + bounded-memory confs
    (asserted on the builder's conf map via a throwaway session handle —
    getOrCreate reuses the live test JVM, and SQL confs set at build time
    land in the session conf)."""
    from bullet_spark_spark import get_spark

    s = get_spark(app_name="rocksdb-flag-check", rocksdb_state=True)
    assert s.conf.get("spark.sql.streaming.stateStore.providerClass") == ROCKSDB_PROVIDER
    assert (
        s.conf.get(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )
        == "true"
    )
    # leave the shared session clean for other tests
    s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    s.conf.unset("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
