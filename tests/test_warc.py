"""WARC build/parse stage tests (operators/warc.py): spec layout,
binary-safe Content-Length parsing, multi-record files, malformed-tail
dead-lettering, and the corpus round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from bullet_spark_spark.operators import warc as wc


def _build(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, url string, body string")
    return df.select(
        "doc_id",
        "url",
        "body",
        wc.warc_record_col(
            F.col("url"), F.col("body"), F.col("doc_id").cast("string")
        ).alias("warc"),
    )


def test_warc_record_layout(spark):
    row = _build(spark, [(1, "http://a.example/x", "hello world")]).collect()[0]
    blob = bytes(row["warc"])
    assert blob.startswith(b"WARC/1.0\r\n")
    assert b"WARC-Target-URI: http://a.example/x\r\n" in blob
    assert b"Content-Length: 11\r\n\r\nhello world\r\n\r\n" in blob


def test_warc_roundtrip_single_records(spark):
    built = _build(
        spark,
        [(i, f"http://ex.com/{i}", f"payload {i} with unicode é{i}") for i in range(20)],
    )
    parsed = wc.parse_warc(built, "warc", keep_cols=["doc_id"])
    got = {r["doc_id"]: (r["warc_uri"], bytes(r["payload"]).decode(), r["warc_error"])
           for r in parsed.collect()}
    assert len(got) == 20
    for i in range(20):
        assert got[i] == (f"http://ex.com/{i}", f"payload {i} with unicode é{i}", None)


def test_warc_multi_record_file_and_binary_safety(spark):
    # payload containing the bytes "WARC/1.0" must NOT resync the parser
    tricky = "embedded WARC/1.0\r\nWARC-Type: fake\r\n\r\n marker"
    built = _build(
        spark,
        [(1, "http://e/1", tricky), (2, "http://e/2", "second"), (3, "http://e/3", "third")],
    ).withColumn("g", F.lit("file0"))
    packed = wc.pack_warc(built, "g", "warc")
    parsed = wc.parse_warc(packed, "warc_file", keep_cols=["g"])
    rows = parsed.collect()
    assert len(rows) == 3
    assert {bytes(r["payload"]).decode() for r in rows} == {tricky, "second", "third"}
    assert all(r["warc_error"] is None for r in rows)


def test_warc_truncated_tail_dead_letters(spark):
    built = _build(spark, [(1, "http://e/1", "full payload")])
    truncated = built.select(
        "doc_id", F.expr("substring(warc, 1, length(warc) - 10)").alias("warc")
    )
    rows = wc.parse_warc(truncated, "warc", keep_cols=["doc_id"]).collect()
    assert len(rows) == 1
    assert rows[0]["warc_error"] == "truncated payload"


def test_warc_corpus_roundtrip(spark, tables):
    docs = tables["documents"].limit(100)
    built = docs.select(
        "doc_id",
        wc.warc_record_col(
            F.concat(F.lit("http://corpus/"), F.col("doc_id").cast("string")),
            F.col("text"),
            F.col("doc_id").cast("string"),
        ).alias("warc"),
    )
    parsed = wc.parse_warc(built, "warc", keep_cols=["doc_id"])
    joined = parsed.select(
        "doc_id", F.decode(F.col("payload"), "UTF-8").alias("rt")
    ).join(docs.select("doc_id", "text"), "doc_id")
    assert joined.filter(F.col("rt") != F.col("text")).count() == 0
    assert joined.count() == 100


def test_warc_roundtrip_fuzz(spark):
    """Property fuzz: arbitrary unicode payloads — including CRLFs, fake
    'WARC/1.0' markers, and empty strings — survive compose→parse
    byte-exactly (Content-Length framing, not delimiter scanning)."""
    from hypothesis import given, settings, HealthCheck
    from hypothesis import strategies as st

    @settings(
        max_examples=15, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(
        payloads=st.lists(
            st.text(max_size=200), min_size=1, max_size=6
        )
    )
    def run(payloads):
        rows = [(i, f"http://f/{i}", p) for i, p in enumerate(payloads)]
        built = _build(spark, rows).withColumn("g", F.lit("f"))
        packed = wc.pack_warc(built, "g", "warc")
        got = {
            r["warc_uri"]: bytes(r["payload"]).decode("utf-8")
            for r in wc.parse_warc(packed, "warc_file", keep_cols=["g"]).collect()
        }
        assert got == {f"http://f/{i}": p for i, p in enumerate(payloads)}

    run()
