"""Deterministic sampling + repetition-metric operators (M5 additions),
differential-tested against DuckDB on the shared fixture tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import sampling as S
from bullet_spark_spark.operators import text as T

from tests.util import assert_match, spark_result


# ---------------------------------------------------------------- sampling


def test_hash_sample_matches_duckdb(tables, duck):
    df = S.hash_sample(tables["documents"], "doc_id", 0.25, seed=7).select(
        "doc_id", "lang"
    )
    pred = S.oracle_keep_sql("doc_id", 0.25, seed=7)
    assert_match(df, duck, f"SELECT doc_id, lang FROM documents WHERE {pred}")


def test_hash_sample_fraction_is_close(tables):
    total = tables["orders"].count()
    kept = S.hash_sample(tables["orders"], "o_orderkey", 0.5, seed=1).count()
    assert abs(kept / total - 0.5) < 0.1


def test_hash_sample_deterministic_and_nested(tables):
    """Same (key, seed, fraction) -> same rows; and a 0.1 sample is a strict
    subset of the 0.3 sample (threshold monotonicity) — the property that
    makes hash samples resumable across pipeline stages."""
    a = {r.doc_id for r in S.hash_sample(tables["documents"], "doc_id", 0.3).collect()}
    b = {r.doc_id for r in S.hash_sample(tables["documents"], "doc_id", 0.3).collect()}
    small = {r.doc_id for r in S.hash_sample(tables["documents"], "doc_id", 0.1).collect()}
    assert a == b
    assert small <= a


def test_stratified_sample_matches_duckdb(tables, duck):
    fr = {"en": 0.5, "zh": 1.0}
    df = S.stratified_sample(
        tables["documents"], "doc_id", "lang", fr, default_fraction=0.2, seed=3
    ).select("doc_id", "lang")
    case = (
        "CASE lang "
        f"WHEN 'en' THEN {S.oracle_keep_sql('doc_id', 0.5, 3)} "
        f"WHEN 'zh' THEN {S.oracle_keep_sql('doc_id', 1.0, 3)} "
        f"ELSE {S.oracle_keep_sql('doc_id', 0.2, 3)} END"
    )
    assert_match(df, duck, f"SELECT doc_id, lang FROM documents WHERE {case}")


def test_sample_exact_n(tables, duck):
    df = S.sample_exact_n(tables["customer"], "c_custkey", 17, seed=5).select(
        "c_custkey"
    )
    assert_match(
        df,
        duck,
        "SELECT c_custkey FROM customer "
        "ORDER BY md5(CAST(c_custkey AS VARCHAR) || ':5'), c_custkey LIMIT 17",
    )


def test_split_train_holdout_disjoint_exhaustive(tables):
    train, hold = S.split_train_holdout(tables["documents"], "doc_id", 0.2, seed=2)
    t = {r.doc_id for r in train.select("doc_id").collect()}
    h = {r.doc_id for r in hold.select("doc_id").collect()}
    assert t.isdisjoint(h)
    assert len(t) + len(h) == tables["documents"].count()


def test_fraction_bounds():
    with pytest.raises(ValueError):
        S._threshold_hex(1.5)
    assert S._threshold_hex(0.0) == "00000000"


# ---------------------------------------------------- repetition metrics


REP_ORACLE = """
WITH base AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), arr AS (
  SELECT doc_id,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         len(list_distinct(toks)) / len(toks) AS uniq_word_ratio,
         1 - len(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                FOR i IN range(1, len(toks) - 1)]))
             / (len(toks) - 2) AS dup_trigram_frac,
         [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))] AS grams
  FROM base
), g AS (
  SELECT doc_id, unnest(grams) AS gram FROM arr
), c AS (
  SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram
), tops AS (
  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
  FROM c GROUP BY doc_id
)
SELECT arr.doc_id, n_tokens, uniq_word_ratio, dup_trigram_frac, top_bigram_frac
FROM arr JOIN tops ON arr.doc_id = tops.doc_id
"""


def test_repetition_metrics_match_duckdb(tables, duck):
    df = T.repetition_metrics(tables["documents"])
    assert_match(df, duck, REP_ORACLE)


def test_repetition_metrics_explode_variant_same(tables):
    """The shuffle-based (explode=True) and array-expression forms agree."""
    a = spark_result(T.repetition_metrics(tables["documents"]))
    b = spark_result(T.repetition_metrics(tables["documents"], explode=True))
    ka = {r[0]: r[1:] for r in a[1]}
    kb = {r[0]: r[1:] for r in b[1]}
    assert set(a[0]) == set(b[0])
    # column order may differ between the two forms — compare by name
    ia = [a[0].index(c) for c in ["n_tokens", "uniq_word_ratio", "dup_trigram_frac", "top_bigram_frac"]]
    ib = [b[0].index(c) for c in ["n_tokens", "uniq_word_ratio", "dup_trigram_frac", "top_bigram_frac"]]
    a_by_id = {r[a[0].index("doc_id")]: tuple(r[i] for i in ia) for r in a[1]}
    b_by_id = {r[b[0].index("doc_id")]: tuple(r[i] for i in ib) for r in b[1]}
    assert a_by_id.keys() == b_by_id.keys()
    for k in a_by_id:
        for x, y in zip(a_by_id[k], b_by_id[k]):
            assert x == pytest.approx(y, abs=1e-12), (k, a_by_id[k], b_by_id[k])


def test_repetition_flags_templated_doc(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "buy now buy now buy now buy now buy now buy now buy now buy now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.asDict() for r in T.repetition_metrics(df).collect()}
    assert out[2]["top_bigram_frac"] > out[1]["top_bigram_frac"]
    assert out[2]["uniq_word_ratio"] < out[1]["uniq_word_ratio"]
    assert out[2]["dup_trigram_frac"] > 0.8


def test_pack_sequences_invariants(spark, tables):
    """Bins are contiguous in order, sizes within budget + one document,
    offsets are the running sum — the dataloader contract."""
    from bullet_spark_spark.operators.sampling import pack_sequences

    budget = 2000
    out = pack_sequences(tables["documents"], "doc_id", "n_chars", budget).collect()
    rows = sorted(out, key=lambda r: r["doc_id"])
    cum = 0
    prev_bin = 0
    for r in rows:
        assert r["stream_offset"] == cum
        cum += r["n_chars"]
        assert r["bin_id"] == (cum - 1) // budget
        assert r["bin_id"] >= prev_bin  # bins never go backwards in order
        prev_bin = r["bin_id"]
    from collections import defaultdict
    bins = defaultdict(int)
    for r in rows:
        bins[r["bin_id"]] += r["n_chars"]
    max_doc = max(r["n_chars"] for r in rows)
    for b, size in bins.items():
        assert size <= budget + max_doc  # within one document of budget


def test_curation_funnel_first_rule_wins(spark):
    from bullet_spark_spark.operators import text as tx

    rows = [
        (1, "tiny"),                                        # too_short
        (2, "x" * 30000),                                   # too_long
        (3, "1234 5678 9012 3456 7890 1234 5678 9012"),     # low_alpha
        (4, ("spam ham " * 40).strip()),                    # repetitive
        (5, "a perfectly ordinary sentence about engines and data quality"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r["id"]: r["verdict"] for r in tx.curate(df).collect()}
    assert got == {1: "too_short", 2: "too_long", 3: "low_alpha", 4: "repetitive", 5: "keep"}


def test_temperature_mixture_rates_and_determinism(spark):
    from bullet_spark_spark.operators import sampling as smp

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(25)]
    df = spark.createDataFrame(rows, ["doc_id", "src"])

    out = smp.temperature_mixture_sample(df, "doc_id", "src", alpha=0.5, seed=3)
    got = out.groupBy("src").count().collect()
    by_src = {r["src"]: r["count"] for r in got}
    rates = {r["src"]: r["rate"] for r in out.select("src", "rate").distinct().collect()}

    # smallest source keeps rate 1 (all rows); dominant source ~ sqrt ratio
    assert rates["small"] == 1.0
    assert by_src["small"] == 25
    expected_big_rate = round(400 ** -0.5 / 25 ** -0.5, 8)  # = (25/400)^0.5 = 0.25
    assert rates["big"] == expected_big_rate
    assert abs(by_src["big"] - 400 * expected_big_rate) < 40  # md5 binomial slack

    # deterministic: identical output on rerun
    again = smp.temperature_mixture_sample(df, "doc_id", "src", alpha=0.5, seed=3)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )

    # alpha=1 keeps everything
    assert smp.temperature_mixture_sample(df, "doc_id", "src", alpha=1.0).count() == 425
