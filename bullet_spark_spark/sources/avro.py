"""Avro record path — the DSL deserializer stage for Avro-encoded sources.

The reference wires Avro records through its DSL stack (``LazyBulletAvro``
registered with Kryo, BulletSparkKryoRegistrator.scala:15; avro dependency
pom.xml:130-134; deserializers are pluggable ``BulletDeserializer``s,
DSLDataProducerTest.scala:25, MockDeserializer.scala:13-17). Spark-side the
native equivalent is ``from_avro`` (the spark-avro connector, JVM/codegen —
the production path on any real cluster). This container ships pyspark
without that connector, so ``decode_avro`` falls back to a pure-Python
binary decoder run through ``mapInPandas`` (Arrow-batched, never
row-at-a-time Python UDF) — the "custom deserializer" plug point of the
reference, with identical output schema either way.

Scope of the fallback codec (explicit, validated): Avro record schemas of
primitive fields — null/boolean/int/long/float/double/string/bytes, plus
2-branch nullable unions ``["null", T]``. That covers the flat
BulletRecord-style payloads the reference's converters produce (typed maps
of primitives, SURVEY §1.2); nested records/arrays/maps need the real
connector and raise a clear error here.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_PRIMITIVES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "string": StringType(),
    "bytes": BinaryType(),
}


def parse_avro_schema(schema_json: str) -> list[tuple[str, str, bool]]:
    """Avro record schema JSON → [(field, primitive_type, nullable)]."""
    schema = json.loads(schema_json)
    if schema.get("type") != "record":
        raise ValueError("decode_avro fallback supports record schemas")
    fields: list[tuple[str, str, bool]] = []
    for f in schema["fields"]:
        ftype = f["type"]
        nullable = False
        if isinstance(ftype, list):  # union — only ["null", T] supported
            branches = [t for t in ftype if t != "null"]
            if len(branches) != 1 or len(ftype) > 2:
                raise ValueError(f"unsupported union {ftype} for field {f['name']}")
            ftype, nullable = branches[0], True
        if not isinstance(ftype, str) or ftype not in _PRIMITIVES:
            raise ValueError(
                f"field {f['name']}: type {ftype!r} needs the spark-avro "
                "connector (fallback codec is primitives-only)"
            )
        fields.append((f["name"], ftype, nullable))
    return fields


def avro_struct_type(schema_json: str) -> StructType:
    return StructType(
        [
            StructField(name, _PRIMITIVES[t], nullable)
            for name, t, nullable in parse_avro_schema(schema_json)
        ]
    )


# -- binary codec (Avro spec: zigzag varints, little-endian IEEE754) --------

def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1), pos


def encode_avro_row(values: dict[str, Any], schema_json: str) -> bytes:
    """Encode one record to Avro binary (test/producer side)."""
    out = bytearray()
    for name, t, nullable in parse_avro_schema(schema_json):
        v = values.get(name)
        if nullable:
            if v is None:
                out += _zigzag_encode(0)  # union branch 0 = null
                continue
            out += _zigzag_encode(1)
        elif v is None:
            raise ValueError(f"null for non-nullable field {name}")
        if t in ("int", "long"):
            out += _zigzag_encode(int(v))
        elif t == "boolean":
            out.append(1 if v else 0)
        elif t == "float":
            out += struct.pack("<f", float(v))
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t in ("string", "bytes"):
            raw = v.encode() if t == "string" else bytes(v)
            out += _zigzag_encode(len(raw)) + raw
    return bytes(out)


def decode_avro_row(buf: bytes, fields: list[tuple[str, str, bool]]) -> dict[str, Any]:
    pos = 0
    row: dict[str, Any] = {}
    for name, t, nullable in fields:
        if nullable:
            branch, pos = _zigzag_decode(buf, pos)
            if branch == 0:
                row[name] = None
                continue
        if t in ("int", "long"):
            row[name], pos = _zigzag_decode(buf, pos)
        elif t == "boolean":
            row[name] = buf[pos] == 1
            pos += 1
        elif t == "float":
            row[name] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif t == "double":
            row[name] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif t in ("string", "bytes"):
            ln, pos = _zigzag_decode(buf, pos)
            raw = buf[pos : pos + ln]
            pos += ln
            row[name] = raw.decode() if t == "string" else bytes(raw)
    return row


# -- the decode stage --------------------------------------------------------

def decode_avro(df: DataFrame, schema_json: str, col: str = "value") -> DataFrame:
    """Avro-binary column → typed flattened columns, mirroring
    ``decode_json`` (sources.streaming): the deserialize+convert stage of the
    DSL path (DSLDataProducer.scala:25-30). Uses the spark-avro connector's
    ``from_avro`` when loaded (JVM, codegen); otherwise the Arrow-batched
    pure-Python codec above. Works on batch and streaming frames; BOTH paths
    return the same schema — passthrough (non-``col``) columns first, then
    the decoded record fields — so pipelines developed against one path
    deploy unchanged on the other."""
    passthrough = [c for c in df.columns if c != col]
    try:
        from pyspark.sql.avro.functions import from_avro

        decoded = df.select(
            *[F.col(c) for c in passthrough],
            from_avro(F.col(col), schema_json).alias("__r"),
        )
        decoded.schema  # forces analysis → raises if connector missing
        return decoded.select(*passthrough, "__r.*")
    except ImportError:
        pass  # no pyspark avro module at all → Python codec
    except Exception as e:
        # only a missing connector jar falls through; genuine analysis
        # errors (bad schema, wrong column type) must surface
        if "AVRO_DATA_SOURCE" not in str(e) and "avro" not in str(e).lower():
            raise

    fields = parse_avro_schema(schema_json)
    out_type = avro_struct_type(schema_json)
    other_cols = [c for c in df.columns if c != col]

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [decode_avro_row(b, fields) for b in pdf[col]]
            dec = pd.DataFrame(rows, columns=[n for n, _, _ in fields])
            yield pd.concat(
                [pdf[other_cols].reset_index(drop=True), dec], axis=1
            ) if other_cols else dec

    full_type = StructType(
        [df.schema[c] for c in other_cols] + list(out_type.fields)
    )
    return df.mapInPandas(decode_batches, schema=full_type)
