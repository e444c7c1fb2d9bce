"""Round-8 operator tests: blocked edit-distance fuzzy dedup, shuffle-key
skew diagnostics, frozen-vocab OOV coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import dedup as dd
from bullet_spark_spark.operators import relational as rel
from bullet_spark_spark.operators import text as tx


# ---------------------------------------------------------------------------
# fuzzy_pairs_blocked
# ---------------------------------------------------------------------------

def _keys(spark, rows):
    return spark.createDataFrame(rows, "id long, k string")


def test_fuzzy_substitution_within_distance_found(spark):
    # 24-char keys; two substitutions (positions 2 and 20) -> dist 2,
    # middle segment (chars 9-16) intact -> pigeonhole guarantees recall
    a = "abcdefghijklmnopqrstuvwx"
    b = "aXcdefghijklmnopqrsYuvwx"
    out = dd.fuzzy_pairs_blocked(
        _keys(spark, [(1, a), (2, b)]), "id", "k", max_dist=2, key_width=24
    ).collect()
    assert len(out) == 1
    assert (out[0]["id_a"], out[0]["id_b"], out[0]["dist"]) == (1, 2, 2)


def test_fuzzy_all_segments_changed_not_candidate(spark):
    # one substitution in EVERY segment -> dist 3 > max_dist AND no shared
    # segment: not even a candidate (documented recall contract)
    a = "abcdefghijklmnopqrstuvwx"
    b = "Xbcdefgh" + "iXklmnop" + "qrXtuvwx"
    out = dd.fuzzy_pairs_blocked(
        _keys(spark, [(1, a), (2, b)]), "id", "k", max_dist=2, key_width=24
    ).collect()
    assert out == []


def test_fuzzy_identical_keys_distance_zero(spark):
    a = "the quick brown fox jump"
    out = dd.fuzzy_pairs_blocked(
        _keys(spark, [(7, a), (9, a)]), "id", "k", max_dist=2, key_width=24
    ).collect()
    assert len(out) == 1
    assert out[0]["dist"] == 0
    assert out[0]["id_a"] == 7 and out[0]["id_b"] == 9  # id_a < id_b


def test_fuzzy_short_keys_padded(spark):
    # keys shorter than key_width are rpad'ed -> same-length DP; "abc" vs
    # "abd" padded to 24 differ in 1 char
    out = dd.fuzzy_pairs_blocked(
        _keys(spark, [(1, "abc"), (2, "abd")]), "id", "k", max_dist=2,
        key_width=24,
    ).collect()
    assert len(out) == 1 and out[0]["dist"] == 1


def test_fuzzy_rejects_unaligned_width():
    with pytest.raises(ValueError, match="divisible"):
        dd.fuzzy_pairs_blocked(None, "id", "k", max_dist=2, key_width=25)


def test_fuzzy_candidate_join_deduplicates(spark):
    # pair shares ALL THREE segments (identical keys): the candidate join
    # produces 3 matches, the distinct() must collapse them to one pair row
    a = "aaaaaaaabbbbbbbbcccccccc"
    out = dd.fuzzy_pairs_blocked(
        _keys(spark, [(1, a), (2, a)]), "id", "k", max_dist=2, key_width=24
    ).collect()
    assert len(out) == 1


# ---------------------------------------------------------------------------
# key_skew_report
# ---------------------------------------------------------------------------

def test_skew_report_uniform_keys(spark):
    df = spark.createDataFrame([(i % 4,) for i in range(40)], "k long")
    out = {r["key"]: r for r in rel.key_skew_report(df, ["k"], top_n=10).collect()}
    assert set(out) == {"0", "1", "2", "3", "__TOTAL__"}
    for k in ("0", "1", "2", "3"):
        assert out[k]["cnt"] == 10
        assert out[k]["skew_ratio"] == 1.0
        assert out[k]["suggested_salt"] == 1
    assert out["__TOTAL__"]["cnt"] == 10


def test_skew_report_hot_key(spark):
    # key 0 has 60 rows, keys 1..4 have 10 each: mean = 100/5 = 20,
    # skew_ratio(0) = 3.0 -> suggested_salt 3
    rows = [(0,)] * 60 + [(k,) for k in (1, 2, 3, 4) for _ in range(10)]
    df = spark.createDataFrame(rows, "k long")
    out = {r["key"]: r for r in rel.key_skew_report(df, ["k"], top_n=2).collect()}
    assert out["0"]["cnt"] == 60
    assert out["0"]["skew_ratio"] == 3.0
    assert out["0"]["suggested_salt"] == 3
    assert out["0"]["frac"] == 0.6
    assert out["__TOTAL__"]["cnt"] == 60
    # top_n=2 -> only the 2 hottest keys + total
    assert len(out) == 3


def test_skew_report_composite_key(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], "s string, n long"
    )
    out = {r["key"]: r["cnt"] for r in
           rel.key_skew_report(df, ["s", "n"], top_n=5).collect()}
    assert out["a|1"] == 2 and out["b|2"] == 1


# ---------------------------------------------------------------------------
# top_vocab / vocab_coverage
# ---------------------------------------------------------------------------

def test_top_vocab_rank_ties_break_by_token(spark):
    df = spark.createDataFrame(
        [("b b a a c",), ("a b",)], "text string"
    )
    out = tx.top_vocab(df, "text", n=2).collect()
    ranked = [(r["token"], r["cnt"], r["rank"]) for r in out]
    assert ranked == [("a", 3, 1), ("b", 3, 2)]  # tie -> token asc


def test_vocab_coverage_counts(spark):
    docs = spark.createDataFrame(
        [("s1", "a a b unknown"), ("s2", "a zzz yyy")],
        "source string, text string",
    )
    vocab = spark.createDataFrame([("a",), ("b",)], "token string")
    out = {r["source"]: r for r in
           tx.vocab_coverage(docs, vocab, "text", "source").collect()}
    assert out["s1"]["n_tokens"] == 4
    assert out["s1"]["n_oov"] == 1
    assert out["s1"]["n_oov_types"] == 1
    assert out["s1"]["oov_rate"] == 0.25
    assert out["s2"]["n_oov"] == 2
    assert out["s2"]["n_oov_types"] == 2


def test_vocab_coverage_full_coverage_zero_oov(spark):
    docs = spark.createDataFrame([("s", "x y x")], "source string, text string")
    vocab = spark.createDataFrame([("x",), ("y",)], "token string")
    row = tx.vocab_coverage(docs, vocab, "text", "source").collect()[0]
    assert row["n_oov"] == 0 and row["oov_rate"] == 0.0 and row["n_oov_types"] == 0
