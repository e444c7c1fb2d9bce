"""Semantics tests for tfidf_keywords (text.py) and source_overlap_matrix
(dedup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import dedup as dd
from bullet_spark_spark.operators import text as tx


def test_tfidf_unique_term_beats_ubiquitous(spark):
    # 'common' is in every doc (idf = ln(1) = 0); each doc's unique term
    # must be its top keyword.
    df = spark.createDataFrame(
        [
            (1, "common alpha alpha"),
            (2, "common beta"),
            (3, "common gamma gamma gamma"),
        ],
        "doc_id long, text string",
    )
    top1 = {
        r["doc_id"]: r["term"]
        for r in tx.tfidf_keywords(df, "doc_id", "text", k=1).collect()
    }
    assert top1 == {1: "alpha", 2: "beta", 3: "gamma"}


def test_tfidf_ubiquitous_term_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, "common x"), (2, "common y")], "doc_id long, text string"
    )
    rows = tx.tfidf_keywords(df, "doc_id", "text", k=5).collect()
    by_term = {(r["doc_id"], r["term"]): r["tfidf"] for r in rows}
    assert by_term[(1, "common")] == 0.0
    assert by_term[(1, "x")] > 0.0


def test_tfidf_tie_breaks_by_term_asc(spark):
    # two equally-rare, equally-frequent terms: k=1 must pick the
    # lexicographically smaller one.
    df = spark.createDataFrame(
        [(1, "zed apple"), (2, "other words")], "doc_id long, text string"
    )
    (row,) = tx.tfidf_keywords(df, "doc_id", "text", k=1).filter(
        F.col("doc_id") == 1
    ).collect()
    assert row["term"] == "apple"


def test_source_overlap_ngram_counts_and_jaccard(spark):
    # src A and B share exactly the 2-gram "hello world"; C shares nothing.
    df = spark.createDataFrame(
        [
            ("A", "hello world from alpha"),
            ("B", "hello world from beta site"),
            ("C", "entirely different content here"),
        ],
        "source string, text string",
    )
    out = dd.source_overlap_matrix(
        df, tx.word_ngrams(F.col("text"), 2), "source"
    ).collect()
    assert len(out) == 1
    (row,) = out
    assert (row["source_a"], row["source_b"]) == ("A", "B")
    # shared 2-grams: "hello world", "world from" → 2; |A|=3, |B|=4
    assert row["n_shared"] == 2
    assert row["jaccard"] == pytest.approx(2 / (3 + 4 - 2), abs=1e-6)


def test_source_overlap_whole_doc_fingerprint_mode(spark):
    # normalization-insensitive full-doc duplication across sources.
    df = spark.createDataFrame(
        [
            ("A", "Same   Doc"),
            ("B", "same doc"),
            ("B", "only in b"),
            ("C", "unique c"),
        ],
        "source string, text string",
    )
    out = dd.source_overlap_matrix(
        df, F.array(tx.fingerprint(F.col("text"))), "source"
    ).collect()
    assert len(out) == 1
    (row,) = out
    assert (row["source_a"], row["source_b"], row["n_shared"]) == ("A", "B", 1)
    assert row["jaccard"] == pytest.approx(1 / (1 + 2 - 1), abs=1e-6)


def test_source_overlap_dedups_within_source(spark):
    # the same shingle appearing twice inside one source counts ONCE.
    df = spark.createDataFrame(
        [
            ("A", "dup shingle one"),
            ("A", "dup shingle two"),
            ("B", "dup shingle three"),
        ],
        "source string, text string",
    )
    (row,) = dd.source_overlap_matrix(
        df, tx.word_ngrams(F.col("text"), 2), "source"
    ).collect()
    # shared: "dup shingle" only; A's distinct 2-grams: {dup shingle,
    # shingle one, shingle two} = 3, B's = 2
    assert row["n_shared"] == 1
    assert row["jaccard"] == pytest.approx(1 / (3 + 2 - 1), abs=1e-6)


def test_split_sentences_edges(spark):
    df = spark.createDataFrame(
        [("One. Two! Three?",), ("no terminator",), ("",), (None,),
         ("...",), ("Tail. fragment",)],
        "text string",
    )
    rows = df.select(tx.split_sentences(F.col("text")).alias("s")).collect()
    assert rows[0]["s"] == ["One.", "Two!", "Three?"]
    assert rows[1]["s"] == ["no terminator"]
    assert rows[2]["s"] == []
    assert rows[3]["s"] is None
    assert rows[4]["s"] == []  # punctuation-only: no sentence content
    assert rows[5]["s"] == ["Tail.", "fragment"]


def test_chunk_by_sentences_respects_boundaries(spark):
    # 3 sentences of 4 tokens each, budget 8: sentences 1-2 (before=0,4)
    # land in chunk 0; sentence 3 (before=8) starts chunk 1. No sentence
    # is ever split across chunks.
    text = "a b c d. e f g h. i j k l."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        tx.chunk_by_sentences(df, "doc_id", "text", 8).collect(),
        key=lambda r: r["chunk"],
    )
    assert [(r["chunk"], r["text"], r["n_tokens"]) for r in rows] == [
        (0, "a b c d. e f g h.", 8),
        (1, "i j k l.", 4),
    ]


def test_chunk_by_sentences_oversized_sentence_gets_own_chunk(spark):
    text = "short one. " + " ".join(f"w{i}" for i in range(20)) + ". tail."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        tx.chunk_by_sentences(df, "doc_id", "text", 5).collect(),
        key=lambda r: r["chunk"],
    )
    texts = [r["text"] for r in rows]
    # the 21-token sentence appears intact in exactly one chunk
    assert sum("w0" in t and "w19" in t for t in texts) == 1
    # chunk ids strictly increase and reassembly preserves order
    assert " ".join(texts) == text
