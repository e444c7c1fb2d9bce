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


def test_avro_roundtrip_batch(spark):
    """Avro-binary column → typed columns (the DSL deserializer stage for
    Avro payloads): encode with the spec codec, decode through the engine
    path, values round-trip exactly — incl. nullable unions."""
    from bullet_spark_spark.sources.avro import decode_avro, encode_avro_row

    schema = """{
      "type": "record", "name": "Ev",
      "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": ["null", "double"]},
        {"name": "ok", "type": "boolean"}
      ]}"""
    rows = [
        {"event_id": 1, "event_type": "click", "value": 3.5, "ok": True},
        {"event_id": -2, "event_type": "view", "value": None, "ok": False},
        {"event_id": 3_000_000_000, "event_type": "purchase", "value": -0.25, "ok": True},
    ]
    df = spark.createDataFrame(
        [(bytearray(encode_avro_row(r, schema)),) for r in rows], "value binary"
    )
    got = [r.asDict() for r in decode_avro(df, schema).collect()]
    assert got == rows


def test_avro_roundtrip_streaming(spark, tmp_path):
    """decode_avro works identically on an unbounded frame (DSL parity:
    deserialize+convert inside the stream, DSLDataProducer.scala:25-30)."""
    from bullet_spark_spark.sources.avro import decode_avro, encode_avro_row
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.sinks import MemorySink

    schema = """{
      "type": "record", "name": "Ev",
      "fields": [{"name": "k", "type": "string"}, {"name": "v", "type": "long"}]}"""
    batch = spark.createDataFrame(
        [(bytearray(encode_avro_row({"k": f"k{i}", "v": i}, schema)),) for i in range(50)],
        "value binary",
    )
    stream = file_drip(spark, batch, str(tmp_path), chunks=2)
    decoded = decode_avro(stream, schema)
    sink = MemorySink()
    q = (
        decoded.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(((r[0], r[1]) for r in sink.rows), key=lambda t: t[1]) == [
        (f"k{i}", i) for i in range(50)
    ]


def test_avro_rejects_nested(spark):
    from bullet_spark_spark.sources.avro import parse_avro_schema

    import pytest

    with pytest.raises(ValueError):
        parse_avro_schema(
            '{"type":"record","name":"X","fields":[{"name":"a","type":{"type":"array","items":"int"}}]}'
        )
