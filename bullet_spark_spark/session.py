"""SparkSession factory with scale-aware defaults.

Configuration posture (designed for a large cluster; exercised on local[N]):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic join-strategy switch — the knobs that keep a plan healthy when the
  same code moves from sf0.01 to 100 TB.
- Arrow on: every pandas UDF / applyInPandas crosses the JVM/Python boundary
  in columnar batches, not rows.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (naive timestamps).
- RocksDB state store (``rocksdb_state=True`` or
  ``SPARK_GRAFT_ROCKSDB_STATE=1``): every stateful streaming operator in
  this engine — stream-stream interval joins (operators/temporal.py),
  windowed quantile sketches (operators/sketch.py), per-key record windows
  (streaming/windows.py), and the dynamic multiplexer's routed aggregations
  (streaming/dynamic.py) — keeps per-key state between micro-batches. The
  default HDFSBackedStateStoreProvider holds that state ON-HEAP in every
  executor; at 100× key cardinality that is executor OOM, not a tuning
  note. RocksDBStateStoreProvider spills state to local SSD with changelog
  checkpointing, bounding heap usage by the RocksDB block cache instead of
  by key count (reference posture: SURVEY §2.1 P12 "RocksDB state store at
  scale"). Off by default locally because the tiny test states gain
  nothing from the native store's startup cost; flag it on for any real
  deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def get_spark(
    app_name: str = "bullet-spark-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    On a real cluster, ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let the planner choose shuffled-hash over sort-merge when its
        # size conditions hold, and let AQE rewrite SMJ->SHJ at runtime
        # when every post-shuffle partition fits the local-map threshold
        # (both from the optimization guide's baseline config; env-
        # parameterised so a cluster profile can flip them without code)
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", "0"),
        )
        # local mode: keep the UI off and the driver quiet
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if rocksdb_state is None:
        rocksdb_state = os.environ.get("SPARK_GRAFT_ROCKSDB_STATE", "") in ("1", "true")
    if rocksdb_state:
        builder = (
            builder.config("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
            # changelog checkpointing: upload per-batch deltas, not full
            # SST snapshots — the difference between O(changed keys) and
            # O(total state) per commit on a big stateful job
            .config(
                "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
                "true",
            )
            # bound the native memory RocksDB takes per executor
            .config("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
