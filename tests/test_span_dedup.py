"""duplicated_spans: cross-document overlapping-k-gram span dedup.

Hand-computed fixtures (exact span geometry is the point: island merging,
adjacency, alignment-free detection that segment_dedup's grid misses) plus
a DuckDB differential on the real documents table — the same SQL replay the
dedup_span_exact oracle uses, on gram strings instead of xxhash64.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from bullet_spark_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_passage_merges_into_one_span(spark):
    # 12-token shared passage inside otherwise-unique 20-token docs:
    # positions 0..4 of the passage's 8-grams all duplicate and the
    # overlapping islands must merge into ONE span of 12 tokens.
    shared = " ".join(f"s{i}" for i in range(12))
    a = "a0 a1 a2 a3 " + shared + " a4 a5 a6 a7"
    b = "b0 b1 b2 b3 " + shared + " b4 b5 b6 b7"
    out = dd.duplicated_spans(_docs(spark, [(1, a), (2, b)]), k=8).collect()
    assert len(out) == 2
    for r in out:
        assert r.n_tokens == 20
        assert r.dup_spans == 1
        assert r.dup_grams == 5  # 12 - 8 + 1
        assert r.dup_tokens == 12
        assert abs(r.dup_frac - 12 / 20) < 1e-9


def test_alignment_free_where_segment_grid_misses(spark):
    # The same passage shifted by one word relative to a seg_words=10
    # grid: segment_dedup finds nothing (no identical grid cell), the
    # overlapping-gram pass still flags the full passage.
    shared = " ".join(f"s{i}" for i in range(10))
    a = shared + " " + " ".join(f"a{i}" for i in range(10))
    b = "x " + shared + " " + " ".join(f"b{i}" for i in range(9))
    docs = _docs(spark, [(1, a), (2, b)])
    seg = dd.segment_dedup(docs, seg_words=10).agg(F.sum("n_removed")).first()[0]
    assert seg == 0
    spans = {r.doc_id: r for r in
             dd.duplicated_spans(docs, k=8)
             .withColumnRenamed("id", "doc_id").collect()}
    assert spans[1].dup_tokens == 10 and spans[2].dup_tokens == 10


def test_within_doc_repeat_not_flagged_and_short_docs_skipped(spark):
    # max_df counts DISTINCT docs: a passage repeated twice inside ONE
    # doc is repeated_spans' job, not this operator's; docs under k
    # tokens produce no grams at all.
    rep = " ".join(f"r{i}" for i in range(9))
    rows = [(1, rep + " mid " + rep), (2, "tiny doc"), (3, "unrelated words only here")]
    assert dd.duplicated_spans(_docs(spark, rows), k=8).count() == 0


def test_two_disjoint_spans_stay_disjoint(spark):
    # Two shared 8-grams separated by >k unique tokens: two islands.
    s1 = " ".join(f"p{i}" for i in range(8))
    s2 = " ".join(f"q{i}" for i in range(8))
    gap_a = " ".join(f"a{i}" for i in range(10))
    gap_b = " ".join(f"b{i}" for i in range(10))
    a = s1 + " " + gap_a + " " + s2
    b = s1 + " " + gap_b + " " + s2
    out = {r.id: r for r in dd.duplicated_spans(_docs(spark, [(1, a), (2, b)]), k=8).collect()}
    assert out[1].dup_spans == 2 and out[1].dup_tokens == 16
    assert out[2].dup_spans == 2 and out[2].dup_tokens == 16


def test_duckdb_differential_on_documents(tables, duck):
    """Full-pipeline differential at sf0.001: Spark (xxhash64 grams)
    vs DuckDB (string grams) must agree tuple-for-tuple."""
    spark_rows = sorted(
        (r.id, r.n_tokens, r.dup_grams, r.dup_spans, r.dup_tokens,
         round(r.dup_frac, 6))
        for r in dd.duplicated_spans(tables["documents"], k=8).collect()
    )
    duck_rows = sorted(
        (r[0], r[1], r[2], r[3], r[4], round(r[5], 6))
        for r in duck.execute(r"""
            WITH t AS (
              SELECT doc_id,
                     string_split(regexp_replace(trim(lower(text)),
                                                 '\s+', ' ', 'g'), ' ') AS toks
              FROM documents),
            p AS (SELECT doc_id, len(toks) AS n_tokens,
                         unnest(range(1, len(toks) - 8 + 2)) AS pos, toks
                  FROM t WHERE len(toks) >= 8),
            g AS (SELECT doc_id, n_tokens, pos,
                         array_to_string(toks[pos:pos+7], ' ') AS gram
                  FROM p),
            d AS (SELECT gram FROM g GROUP BY gram
                  HAVING count(DISTINCT doc_id) > 1),
            h AS (SELECT g.doc_id, g.n_tokens, g.pos
                  FROM g JOIN d USING (gram)),
            i AS (SELECT doc_id, n_tokens, pos,
                         CASE WHEN pos <= lag(pos) OVER (
                                PARTITION BY doc_id ORDER BY pos) + 8
                              THEN 0 ELSE 1 END AS brk
                  FROM h),
            s AS (SELECT doc_id, n_tokens, pos,
                         sum(brk) OVER (
                           PARTITION BY doc_id ORDER BY pos) AS isl
                  FROM i),
            sp AS (SELECT doc_id, n_tokens, isl, count(*) AS n_grams,
                          max(pos) - min(pos) + 8 AS span_toks
                   FROM s GROUP BY doc_id, n_tokens, isl)
            SELECT doc_id, CAST(n_tokens AS BIGINT),
                   CAST(sum(n_grams) AS BIGINT), count(*),
                   CAST(sum(span_toks) AS BIGINT),
                   round(CAST(sum(span_toks) AS DOUBLE) / n_tokens, 6)
            FROM sp GROUP BY doc_id, n_tokens
        """).fetchall()
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) > 0  # the sf0.001 corpus does carry shared spans


def test_scrub_removes_span_from_all_docs(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    a = "a0 a1 " + shared + " a2 a3"
    b = "b0 b1 b2 " + shared
    c = "c0 c1 c2 c3 c4 c5 c6 c7 c8"  # unaffected, >= k tokens
    out = {r.id: r for r in
           dd.scrub_duplicated_spans(_docs(spark, [(1, a), (2, b), (3, c)]),
                                     k=8).collect()}
    assert out[1].text_clean == "a0 a1 a2 a3" and out[1].dup_tokens == 10
    assert out[2].text_clean == "b0 b1 b2" and out[2].dup_tokens == 10
    assert out[3].text_clean == c and out[3].dup_tokens == 0


def test_scrub_fully_duplicated_doc_empties(spark):
    t = " ".join(f"w{i}" for i in range(9))
    out = {r.id: r for r in
           dd.scrub_duplicated_spans(_docs(spark, [(1, t), (2, t)]), k=8).collect()}
    for r in out.values():
        assert r.text_clean == "" and r.dup_tokens == 9 and r.n_tokens == 9


# -- winnowing fingerprints (Schleimer/Wilkerson/Aiken) --------------------

def test_winnow_coverage_guarantee(tables):
    """Winnowing's defining property: every window of w consecutive gram
    positions contains at least one selected fingerprint position."""
    k, w = 5, 4
    docs = tables["documents"].limit(50)
    sel = {(r.id, r.pos) for r in
           dd.winnow_fingerprints(docs, k=k, w=w).collect()}
    toks = {r.doc_id: len(r.text.strip().lower().split()) for r in docs.collect()}
    for doc, n in toks.items():
        n_grams = n - k + 1
        if n_grams < w:
            continue
        pos_set = {p for d, p in sel if d == doc}
        for s in range(0, n_grams - w + 1):
            assert any(s <= p < s + w for p in pos_set), (doc, s)


def test_winnow_density_reduction(tables):
    """Selected density must sit well under 1 (expected 2/(w+1))."""
    k, w = 5, 7
    docs = tables["documents"].limit(100)
    n_sel = dd.winnow_fingerprints(docs, k=k, w=w).count()
    n_grams = sum(
        max(0, len(r.text.strip().lower().split()) - k + 1)
        for r in docs.collect()
        if len(r.text.strip().lower().split()) >= k + w - 1
    )
    assert 0 < n_sel < 0.6 * n_grams  # 2/(w+1) = 0.25 expected


def test_winnow_shared_passage_yields_shared_fingerprint(spark):
    """Guarantee: a shared passage of >= w+k-1 tokens always shares a
    fingerprint, regardless of alignment."""
    k, w = 5, 4
    shared = " ".join(f"s{i}" for i in range(k + w - 1))  # exactly w+k-1
    a = " ".join(f"a{i}" for i in range(6)) + " " + shared
    b = "x " + shared + " " + " ".join(f"b{i}" for i in range(7))
    pairs = dd.winnow_pairs(
        _docs(spark, [(1, a), (2, b)]), k=k, w=w, min_shared=1
    ).collect()
    assert len(pairs) == 1 and pairs[0].id_a == 1 and pairs[0].id_b == 2
    assert pairs[0].shared >= 1


def test_winnow_identical_docs_share_all(spark):
    t = " ".join(f"w{i}" for i in range(30))
    u = " ".join(f"u{i}" for i in range(30))
    pairs = {(r.id_a, r.id_b): r.shared for r in
             dd.winnow_pairs(_docs(spark, [(1, t), (2, t), (3, u)]),
                             k=5, w=4, min_shared=1).collect()}
    assert set(pairs) == {(1, 2)}
    n_fp = (dd.winnow_fingerprints(_docs(spark, [(1, t)]), k=5, w=4)
            .select("fp").distinct().count())
    assert pairs[(1, 2)] == n_fp


def test_scrub_keep_first_preserves_one_copy(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    a = "a0 a1 " + shared + " a2 a3"          # doc 1: keeper (min id)
    b = "b0 b1 b2 " + shared                  # doc 2: scrubbed
    c = shared + " c0 c1 c2"                  # doc 3: scrubbed
    out = {r.id: r for r in
           dd.scrub_duplicated_spans(_docs(spark, [(1, a), (2, b), (3, c)]),
                                     k=8, keep_first=True).collect()}
    assert out[1].text_clean == a and out[1].dup_tokens == 0
    assert out[2].text_clean == "b0 b1 b2" and out[2].dup_tokens == 10
    assert out[3].text_clean == "c0 c1 c2" and out[3].dup_tokens == 10


# ---------------------------------------------------------------------------
# Streaming span-scrub ingest: drip ≡ batch (VERDICT r6 task 6)
# ---------------------------------------------------------------------------

def _ordered_drip(spark, chunks, data_dir):
    """One parquet file per chunk with strictly increasing mtimes →
    FileStreamSource (maxFilesPerTrigger=1, oldest-first) replays the
    chunks as micro-batches IN ORDER — the deterministic drip the
    monotone-id parity contract needs (file_drip's repartition scatters)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(data_dir, exist_ok=True)
    t0 = time.time() - 10 * len(chunks)
    for i, chunk in enumerate(chunks):
        path = os.path.join(data_dir, f"chunk_{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in chunk], pa.int64()),
                    "text": pa.array([r[1] for r in chunk], pa.string()),
                }
            ),
            path,
        )
        os.utime(path, (t0 + 10 * i, t0 + 10 * i))
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(data_dir)
    )


def test_streaming_span_scrub_drip_equals_batch(spark, tmp_path):
    """Dripping the corpus through streaming_span_scrub_ingest in monotone-id
    micro-batches emits EXACTLY the batch
    scrub_duplicated_spans(keep_first=True, max_df=1) output — cross-epoch
    dups (via the gram store), within-epoch dups (min-id election), repeated
    passages spanning both, and untouched docs all replay identically."""
    import hashlib

    def w(tag, n):  # unique word streams, no accidental shared grams
        return " ".join(
            hashlib.md5(f"{tag}:{j}".encode()).hexdigest()[:10] for j in range(n)
        )

    p1, p2, p3 = w("P1", 10), w("P2", 12), w("P3", 9)
    docs = [
        (0, w("a", 6) + " " + p1),            # keeper of P1
        (1, p2 + " " + w("b", 5)),            # keeper of P2
        (2, w("c", 4) + " " + p1 + " " + w("d", 4)),  # P1 via store
        (3, p2),                               # fully scrubbed via store
        (4, w("e", 14)),                       # untouched
        (5, w("f", 3) + " " + p3),            # within-batch keeper of P3
        (6, p3 + " " + w("g", 6)),            # within-batch scrub
        (7, w("h", 2) + " " + p3 + " " + w("i", 3)),  # P3 via store
    ]
    chunks = [docs[0:2], docs[2:5], docs[5:7], docs[7:8]]

    stream = _ordered_drip(spark, chunks, str(tmp_path / "in"))
    q = dd.streaming_span_scrub_ingest(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        k=8,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(180)

    streamed = {
        (r["id"], r["n_tokens"], r["dup_tokens"], r["text_clean"])
        for r in spark.read.option("basePath", str(tmp_path / "out"))
        .parquet(str(tmp_path / "out"))
        .drop("epoch")
        .collect()
    }
    batch = {
        (r["id"], r["n_tokens"], r["dup_tokens"], r["text_clean"])
        for r in dd.scrub_duplicated_spans(
            _docs(spark, docs), k=8, keep_first=True, max_df=1
        ).collect()
    }
    assert streamed == batch
    # and the planted structure actually exercised every path
    by_id = {t[0]: t for t in streamed}
    assert by_id[0][2] == 0 and by_id[1][2] == 0      # keepers intact
    assert by_id[2][2] == 10 and by_id[3][2] == 12    # store-scrubbed
    assert by_id[4][2] == 0                           # untouched
    assert by_id[5][2] == 0 and by_id[6][2] == 9      # within-batch election
    assert by_id[7][2] == 9                           # store after election
