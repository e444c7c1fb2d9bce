"""BPE vocabulary induction: differential against a pure-Python reference
implementation of Sennrich-et-al word-count BPE (exact merge-table and
segmentation equality), plus the train/encode consistency property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import bpe


def _ref_bpe(word_counts: dict[str, int], num_merges: int):
    """Sequential reference: pair counts over distinct words weighted by
    count; winner = max count, ties lexicographic; left-to-right
    non-overlapping merge."""
    words = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + word_counts[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest widest"),
    (4, "widest widest low newest"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_bpe_train_matches_reference(spark, corpus_df):
    wc = {}
    for _, text in CORPUS:
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    ref_merges, ref_words = _ref_bpe(wc, 12)

    merges, segmented = bpe.bpe_train(corpus_df, num_merges=12)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in segmented.collect()}
    assert got == ref_words


def test_bpe_encode_reproduces_training_segmentation(spark, corpus_df):
    merges, segmented = bpe.bpe_train(corpus_df, num_merges=8)
    seg = {r["word"]: list(r["syms"]) for r in segmented.collect()}
    enc = bpe.bpe_encode(corpus_df, merges).collect()
    for row in enc:
        toks = list(row["bpe_tokens"])
        expect = []
        for w in row["text"].split():
            expect.extend(seg[w])
        assert toks == expect, (row["text"], toks, expect)


def test_bpe_vocab_totals(spark, corpus_df):
    merges, segmented = bpe.bpe_train(corpus_df, num_merges=5)
    vocab = {r["token"]: r["total"] for r in bpe.bpe_vocab(segmented).collect()}
    # every token total is positive and the totals sum to the corpus's
    # total symbol count after 5 merges
    assert all(v > 0 for v in vocab.values())
    n_syms = segmented.select(
        F.sum(F.size("syms") * F.col("n")).alias("s")
    ).collect()[0]["s"]
    assert sum(vocab.values()) == n_syms


def test_bpe_early_stop_on_fully_merged(spark):
    df = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
    merges, segmented = bpe.bpe_train(df, num_merges=10)
    # 'ab' fully merges after one round; training stops instead of looping
    assert merges == [("a", "b")]
    assert segmented.collect()[0]["syms"] == ["ab"]
