"""Source-stack parity tests (SURVEY §2.1 P2-P4): deserialize+convert as a
typed projection, producer fan-in union, malformed-input behavior."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from bullet_spark_spark.plans import AggOp, GroupAgg, Query
from bullet_spark_spark.sources.streaming import decode_json, file_drip, union_sources
from bullet_spark_spark.streaming import EngineRuntime

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def test_decode_json(spark):
    raw = spark.createDataFrame(
        [
            ('{"event_id": 1, "event_type": "a"}',),
            ('{"event_id": 2, "event_type": "b"}',),
            ("not json at all",),  # malformed → null row (ref error path:
            # deserializer failures surface as errored data, not crashes)
        ],
        "value string",
    )
    rows = decode_json(raw, SCHEMA).collect()
    assert [tuple(r) for r in rows[:2]] == [(1, "a"), (2, "b")]
    assert tuple(rows[2]) == (None, None)


def test_union_sources_streaming(spark, tables, tmp_path):
    """P4: two producer streams unioned into one record stream, queried
    once (ref ssc.union, QueryDataUnioning.scala:85-91)."""
    ev = tables["events"].select("event_id", "event_type", "value")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    sa = file_drip(spark, a, str(tmp_path / "a"), chunks=2)
    sb = file_drip(spark, b, str(tmp_path / "b"), chunks=2)
    merged = union_sources([sa, sb])
    assert merged.isStreaming

    rt = EngineRuntime(spark)
    spec = Query(
        source="events",
        aggregation=GroupAgg(fields=[], operations=[(AggOp.COUNT, None, "cnt")]),
    )
    handle = rt.run_available(spec, merged, checkpoint_dir=str(tmp_path / "ck"))
    assert handle.final_result()[0][0] == ev.count()
