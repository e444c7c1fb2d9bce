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


def test_decode_json_with_dlq(spark, tmp_path):
    """Good rows decode; malformed AND schema-mismatched rows land in the
    dead-letter frame with their raw payload — no silent loss. Works on
    batch and streaming frames identically."""
    from bullet_spark_spark.sources.streaming import decode_json_with_dlq

    raw = spark.createDataFrame(
        [
            ('{"event_id": 1, "event_type": "a"}',),
            ("not json at all",),
            ('{"wrong_field": 9}',),   # parses but matches no schema field
            ('{"event_id": 3}',),      # partial: still good (one field set)
        ],
        "value string",
    )
    good, bad = decode_json_with_dlq(raw, SCHEMA)
    assert sorted(tuple(r) for r in good.collect()) == [(1, "a"), (3, None)]
    assert sorted(r["raw"] for r in bad.collect()) == [
        "not json at all", '{"wrong_field": 9}'
    ]

    # streaming: bad rows reach a quarantine sink via foreachBatch
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.sinks import MemorySink

    stream = file_drip(spark, raw, str(tmp_path), chunks=2)
    g, b = decode_json_with_dlq(stream, SCHEMA)
    sink = MemorySink()
    q = (
        b.select("raw").writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert sorted(r[0] for r in sink.rows) == ["not json at all", '{"wrong_field": 9}']


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


_LOGICAL_SCHEMA = """{
  "type": "record", "name": "Tx",
  "fields": [
    {"name": "id", "type": "long"},
    {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                "precision": 18, "scale": 4}},
    {"name": "amount_fx", "type": {"type": "fixed", "name": "Dec8", "size": 8,
                                   "logicalType": "decimal",
                                   "precision": 18, "scale": 2}},
    {"name": "day", "type": {"type": "int", "logicalType": "date"}},
    {"name": "at_ms", "type": {"type": "long", "logicalType": "timestamp-millis"}},
    {"name": "at_us", "type": {"type": "long", "logicalType": "timestamp-micros"}},
    {"name": "local_us", "type": {"type": "long",
                                  "logicalType": "local-timestamp-micros"}},
    {"name": "maybe_amt", "type": ["null", {"type": "bytes",
        "logicalType": "decimal", "precision": 9, "scale": 3}]},
    {"name": "t_ms", "type": {"type": "int", "logicalType": "time-millis"}}
  ]}"""


def test_avro_logical_types_roundtrip_batch(spark):
    """Logical types decode to the spark-avro mapping (decimal → Decimal,
    date → Date, timestamp-millis/micros → Timestamp, local-* → NTZ) and
    round-trip exactly; unknown/unsupported annotations (time-millis) fall
    back to the underlying type per the Avro spec."""
    import datetime as dt
    from decimal import Decimal

    from bullet_spark_spark.sources.avro import (
        avro_struct_type,
        decode_avro,
        encode_avro_row,
    )

    rows = [
        {
            "id": 1,
            "amount": Decimal("12345.6789"),
            "amount_fx": Decimal("-99.25"),
            "day": dt.date(2024, 2, 29),
            "at_ms": dt.datetime(2024, 2, 29, 12, 30, 45, 123000),
            "at_us": dt.datetime(2024, 2, 29, 12, 30, 45, 123456),
            "local_us": dt.datetime(1999, 12, 31, 23, 59, 59, 999999),
            "maybe_amt": Decimal("-0.001"),
            "t_ms": 86_399_000,
        },
        {
            "id": 2,
            "amount": Decimal("-0.0001"),
            "amount_fx": Decimal("0.01"),
            "day": dt.date(1969, 7, 20),
            "at_ms": dt.datetime(1969, 7, 20, 20, 17, 0),
            "at_us": dt.datetime(1901, 1, 1, 0, 0, 1),
            "local_us": dt.datetime(2038, 1, 19, 3, 14, 7),
            "maybe_amt": None,
            "t_ms": 0,
        },
    ]
    st = avro_struct_type(_LOGICAL_SCHEMA)
    assert str(st["amount"].dataType) == "DecimalType(18,4)"
    assert str(st["amount_fx"].dataType) == "DecimalType(18,2)"
    assert str(st["day"].dataType) == "DateType()"
    assert str(st["at_ms"].dataType) == "TimestampType()"
    assert str(st["local_us"].dataType) == "TimestampNTZType()"
    assert str(st["t_ms"].dataType) == "IntegerType()"  # annotation ignored

    df = spark.createDataFrame(
        [(bytearray(encode_avro_row(r, _LOGICAL_SCHEMA)),) for r in rows],
        "value binary",
    )
    got = [r.asDict() for r in decode_avro(df, _LOGICAL_SCHEMA).collect()]
    for g, e in zip(got, rows):
        assert g["id"] == e["id"]
        assert g["amount"] == e["amount"]
        assert g["amount_fx"] == e["amount_fx"]
        assert g["day"] == e["day"]
        assert g["at_ms"] == e["at_ms"]
        assert g["at_us"] == e["at_us"]
        assert g["local_us"] == e["local_us"]
        assert g["maybe_amt"] == e["maybe_amt"]
        assert g["t_ms"] == e["t_ms"]


def test_avro_logical_types_roundtrip_streaming(spark, tmp_path):
    """The logical-type codec works identically inside an unbounded frame."""
    import datetime as dt
    from decimal import Decimal

    from bullet_spark_spark.sources.avro import decode_avro, encode_avro_row
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.sinks import MemorySink

    rows = [
        {
            "id": i,
            "amount": Decimal(f"{i}.{i:04d}"),
            "amount_fx": Decimal(f"{i}.25"),
            "day": dt.date(2020, 1, 1) + dt.timedelta(days=i),
            "at_ms": dt.datetime(2020, 1, 1) + dt.timedelta(seconds=i),
            "at_us": dt.datetime(2020, 1, 1) + dt.timedelta(microseconds=i),
            "local_us": dt.datetime(2020, 6, 1) + dt.timedelta(minutes=i),
            "maybe_amt": None if i % 2 else Decimal(f"0.{i:03d}"),
            "t_ms": i * 1000,
        }
        for i in range(20)
    ]
    batch = spark.createDataFrame(
        [(bytearray(encode_avro_row(r, _LOGICAL_SCHEMA)),) for r in rows],
        "value binary",
    )
    stream = file_drip(spark, batch, str(tmp_path), chunks=2)
    sink = MemorySink()
    q = (
        decode_avro(stream, _LOGICAL_SCHEMA).writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((tuple(r) for r in sink.rows), key=lambda t: t[0])
    for g, e in zip(got, rows):
        assert g[1] == e["amount"] and g[3] == e["day"] and g[5] == e["at_us"]


def test_avro_rejects_multibranch_union(spark):
    """Multi-branch non-null unions have no stable columnar shape — the
    codec refuses them with a clear error (spark-avro maps them to member
    structs; out of scope here)."""
    from bullet_spark_spark.sources.avro import parse_avro_schema

    import pytest

    with pytest.raises(ValueError, match="union"):
        parse_avro_schema(
            '{"type":"record","name":"X","fields":[{"name":"a","type":["int","string"]}]}'
        )


_NESTED_SCHEMA = """{
  "type": "record", "name": "Doc",
  "fields": [
    {"name": "doc_id", "type": "long"},
    {"name": "meta", "type": {"type": "record", "name": "Meta", "fields": [
        {"name": "source", "type": "string"},
        {"name": "score", "type": ["null", "double"]}
    ]}},
    {"name": "tags", "type": {"type": "array", "items": "string"}},
    {"name": "counts", "type": {"type": "map", "values": "long"}},
    {"name": "nested_maps", "type": {"type": "map",
        "values": {"type": "map", "values": "long"}}},
    {"name": "list_of_maps", "type": {"type": "array",
        "items": {"type": "map", "values": "double"}}},
    {"name": "maybe_list", "type": ["null", {"type": "array",
        "items": ["null", "long"]}]},
    {"name": "kind", "type": {"type": "enum", "name": "Kind",
        "symbols": ["WEB", "BOOK", "CODE"]}},
    {"name": "digest", "type": {"type": "fixed", "name": "D8", "size": 4}}
  ]}"""

_NESTED_ROWS = [
    {
        "doc_id": 1,
        "meta": {"source": "crawl", "score": 0.5},
        "tags": ["a", "b"],
        "counts": {"en": 3, "fr": 1},
        "nested_maps": {"x": {"k1": 1, "k2": 2}, "y": {}},
        "list_of_maps": [{"p": 1.5}, {}],
        "maybe_list": [1, None, 3],
        "kind": "WEB",
        "digest": b"\x01\x02\x03\x04",
    },
    {
        "doc_id": 2,
        "meta": {"source": "books", "score": None},
        "tags": [],
        "counts": {},
        "nested_maps": {},
        "list_of_maps": [],
        "maybe_list": None,
        "kind": "CODE",
        "digest": b"\xff\x00\xff\x00",
    },
]


def test_avro_nested_roundtrip_batch(spark):
    """Nested records, arrays, maps, MAP-of-MAP and LIST-of-MAP composites
    (the reference record type system, SURVEY §1.2), enums, fixed, and
    nullable unions at depth all round-trip through the decode stage."""
    from bullet_spark_spark.sources.avro import decode_avro, encode_avro_row

    df = spark.createDataFrame(
        [(bytearray(encode_avro_row(r, _NESTED_SCHEMA)),) for r in _NESTED_ROWS],
        "value binary",
    )
    got = sorted(
        (r.asDict(recursive=True) for r in decode_avro(df, _NESTED_SCHEMA).collect()),
        key=lambda r: r["doc_id"],
    )
    assert got == [
        {**r, "digest": bytearray(r["digest"])} for r in _NESTED_ROWS
    ]


def test_avro_nested_roundtrip_streaming(spark, tmp_path):
    """The same nested schema decodes identically on an unbounded frame."""
    from bullet_spark_spark.sources.avro import decode_avro, encode_avro_row
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.sinks import MemorySink

    batch = spark.createDataFrame(
        [(bytearray(encode_avro_row(r, _NESTED_SCHEMA)),) for r in _NESTED_ROWS],
        "value binary",
    )
    stream = file_drip(spark, batch, str(tmp_path), chunks=2)
    decoded = decode_avro(stream, _NESTED_SCHEMA)
    sink = MemorySink()
    q = (
        decoded.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def to_plain(v):
        from pyspark.sql import Row

        if isinstance(v, Row):
            return {k: to_plain(x) for k, x in v.asDict().items()}
        if isinstance(v, list):
            return [to_plain(x) for x in v]
        if isinstance(v, dict):
            return {k: to_plain(x) for k, x in v.items()}
        return v

    got = sorted(
        ({c: to_plain(v) for c, v in zip(sink.columns, r)} for r in sink.rows),
        key=lambda r: r["doc_id"],
    )
    assert got == [{**r, "digest": bytearray(r["digest"])} for r in _NESTED_ROWS]


def test_avro_named_type_reference(spark):
    """A named record defined once and referenced again by name (Avro spec
    named-type reuse) parses and round-trips."""
    from bullet_spark_spark.sources.avro import decode_avro, encode_avro_row

    schema = """{
      "type": "record", "name": "Pair",
      "fields": [
        {"name": "a", "type": {"type": "record", "name": "Pt", "fields": [
            {"name": "x", "type": "long"}, {"name": "y", "type": "long"}]}},
        {"name": "b", "type": "Pt"}
      ]}"""
    rows = [{"a": {"x": 1, "y": 2}, "b": {"x": -3, "y": 4}}]
    df = spark.createDataFrame(
        [(bytearray(encode_avro_row(r, schema)),) for r in rows], "value binary"
    )
    got = [r.asDict(recursive=True) for r in decode_avro(df, schema).collect()]
    assert got == rows


def test_avro_union_branch_order_is_positional():
    """Avro encodes union values as BRANCH INDEX + value, so ["null","long"]
    and ["long","null"] differ on the wire. Pin the spec bytes directly:
    interop with spark-avro/Java Avro depends on this, and a shared
    encoder/decoder bug would be invisible to round-trip tests."""
    from bullet_spark_spark.sources.avro import decode_avro_row, encode_avro_row, parse_avro_schema

    null_first = '{"type":"record","name":"A","fields":[{"name":"x","type":["null","long"]}]}'
    null_second = '{"type":"record","name":"B","fields":[{"name":"x","type":["long","null"]}]}'

    # null-first: null → branch 0 (zigzag 0x00); value 1 → branch 1 (0x02) + zigzag(1)=0x02
    assert encode_avro_row({"x": None}, null_first) == b"\x00"
    assert encode_avro_row({"x": 1}, null_first) == b"\x02\x02"
    # null-second: value 1 → branch 0 (0x00) + zigzag(1); null → branch 1 (0x02)
    assert encode_avro_row({"x": 1}, null_second) == b"\x00\x02"
    assert encode_avro_row({"x": None}, null_second) == b"\x02"

    f1 = parse_avro_schema(null_first)
    f2 = parse_avro_schema(null_second)
    assert decode_avro_row(b"\x02\x02", f1) == {"x": 1}
    assert decode_avro_row(b"\x00", f1) == {"x": None}
    assert decode_avro_row(b"\x00\x02", f2) == {"x": 1}
    assert decode_avro_row(b"\x02", f2) == {"x": None}
