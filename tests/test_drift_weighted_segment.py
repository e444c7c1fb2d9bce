"""Round-4 continuation operators: PSI drift report, Efraimidis-Spirakis
weighted sampling, cross-document segment dedup, interpolated bigram LM.

Each gets (a) a semantic unit test and (b) a DuckDB differential where the
operator is SQL-expressible — the same harness the driver runs.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from bullet_spark_spark.operators import dedup as dd
from bullet_spark_spark.operators import quality as ql
from bullet_spark_spark.operators import sampling as smp
from bullet_spark_spark.operators import text as tx


# ---------------------------------------------------------------------------
# drift_report
# ---------------------------------------------------------------------------

def test_drift_identical_distribution_is_zero(spark, tables):
    ev = tables["events"]
    b = ql.bucketize(F.col("value"), [10.0, 50.0, 100.0])
    rep = ql.drift_report(ev, ev, b).collect()
    assert len(rep) >= 2
    assert all(abs(r["psi"]) < 1e-9 for r in rep)
    assert all(r["ref_count"] == r["cur_count"] for r in rep)


def test_drift_detects_shift(spark, tables):
    ev = tables["events"]
    ref = ev.filter(F.col("value") < 60)
    cur = ev.filter(F.col("value") >= 40)
    rep = ql.drift_report(ref, cur, ql.bucketize(F.col("value"), [20.0, 40.0, 60.0, 80.0]))
    total = rep.agg(F.sum("psi")).collect()[0][0]
    assert total > 0.25  # disjoint-ish halves = a major shift


def test_drift_categorical_and_empty_bucket_floor(spark, tables):
    ev = tables["events"]
    ref = ev.filter(F.col("event_type") != "view")
    rep = ql.drift_report(ref, ev, F.col("event_type"))
    rows = {r["bucket"]: r for r in rep.collect()}
    if "view" in rows:
        r = rows["view"]
        assert r["ref_count"] == 0 and r["cur_count"] > 0
        assert math.isfinite(r["psi"]) and r["psi"] > 0  # eps floor, not inf


def test_drift_oracle_differential(spark, tables, duck):
    edges = [10.0, 50.0, 100.0]
    b = ql.bucketize(F.col("value"), edges)
    ev = tables["events"]
    got = {
        r["bucket"]: (r["ref_count"], r["cur_count"], r["psi"])
        for r in ql.drift_report(
            ev.filter(F.col("user_id") % 2 == 0),
            ev.filter(F.col("user_id") % 2 == 1),
            b,
        ).collect()
    }
    bsql = ql.oracle_bucketize_sql("value", edges)
    oracle = duck.execute(f"""
        WITH r AS (SELECT {bsql} AS bucket, count(*) c FROM events
                   WHERE user_id % 2 = 0 AND {bsql} IS NOT NULL GROUP BY 1),
             c AS (SELECT {bsql} AS bucket, count(*) c FROM events
                   WHERE user_id % 2 = 1 AND {bsql} IS NOT NULL GROUP BY 1),
             j AS (SELECT coalesce(r.bucket, c.bucket) bucket,
                          coalesce(r.c, 0) rc, coalesce(c.c, 0) cc
                   FROM r FULL OUTER JOIN c ON r.bucket = c.bucket),
             f AS (SELECT bucket, rc, cc,
                          greatest(rc / sum(rc) OVER (), 1e-6) rf,
                          greatest(cc / sum(cc) OVER (), 1e-6) cf
                   FROM j)
        SELECT bucket, rc, cc, round((cf - rf) * ln(cf / rf), 6) FROM f
    """).fetchall()
    assert len(oracle) == len(got)
    for bucket, rc, cc, psi in oracle:
        grc, gcc, gpsi = got[bucket]
        assert (grc, gcc) == (rc, cc)
        assert abs(gpsi - psi) < 1e-9


# ---------------------------------------------------------------------------
# weighted_sample_n
# ---------------------------------------------------------------------------

def test_weighted_sample_exact_n_and_determinism(spark, tables):
    docs = tables["documents"]
    s1 = smp.weighted_sample_n(docs, "doc_id", "n_chars", 40)
    s2 = smp.weighted_sample_n(docs.repartition(7), "doc_id", "n_chars", 40)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    assert len(ids1) == 40 and ids1 == ids2  # partition-layout independent


def test_weighted_sample_biases_toward_weight(spark):
    # two strata: weight 100 vs weight 1, equal counts — the heavy stratum
    # must dominate any fixed-size sample
    rows = [(i, 100.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = smp.weighted_sample_n(df, "id", "w", 100).collect()
    heavy = sum(1 for r in got if r["w"] == 100.0)
    assert heavy > 85


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 5.0)], ["id", "w"]
    )
    got = [r["id"] for r in smp.weighted_sample_n(df, "id", "w", 10).collect()]
    assert got == [4]


def test_weighted_sample_oracle_differential(spark, tables, duck):
    got = sorted(
        r["doc_id"]
        for r in smp.weighted_sample_n(
            tables["documents"], "doc_id", "n_chars", 25
        ).collect()
    )
    key = smp.oracle_weighted_key_sql("doc_id", "n_chars")
    oracle = sorted(
        r[0]
        for r in duck.execute(f"""
            SELECT doc_id FROM documents
            WHERE n_chars IS NOT NULL AND n_chars > 0
            ORDER BY {key} DESC, doc_id LIMIT 25
        """).fetchall()
    )
    assert got == oracle


# ---------------------------------------------------------------------------
# segment_dedup
# ---------------------------------------------------------------------------

def test_segment_dedup_removes_cross_doc_boilerplate(spark):
    boiler = "all rights reserved subscribe to our newsletter for more updates today"
    rows = [
        (1, boiler + " unique alpha content one two three four five six seven"),
        (2, boiler + " different beta words eight nine ten eleven twelve thirteen x"),
        (3, "entirely original gamma text with no shared ten word segments at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in dd.segment_dedup(df, seg_words=10).collect()}
    assert got[1]["n_removed"] == 1 and got[2]["n_removed"] == 1
    assert boiler not in got[1]["text_clean"]
    assert "unique alpha content" in got[1]["text_clean"]
    assert got[3]["n_removed"] == 0
    assert got[3]["text_clean"] == rows[2][1]


def test_segment_dedup_keeps_within_doc_repeats(spark):
    seg = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame([(1, f"{seg} {seg}")], ["doc_id", "text"])
    got = dd.segment_dedup(df, seg_words=10).collect()[0]
    assert got["n_removed"] == 0  # distinct-doc frequency is 1


def test_segment_dedup_oracle_differential(spark, tables, duck):
    got = {
        r["doc_id"]: (r["n_segments"], r["n_removed"], r["text_clean"])
        for r in dd.segment_dedup(tables["documents"], seg_words=5).collect()
    }
    oracle = duck.execute("""
        WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') words
                   FROM documents),
             s AS (SELECT doc_id, i,
                          array_to_string(words[(i*5+1):(i*5+5)], ' ') seg
                   FROM w, UNNEST(generate_series(0,
                        greatest(CAST(ceil(len(words)/5.0) AS INT), 1) - 1)) t(i)),
             dup AS (SELECT seg FROM s GROUP BY seg
                     HAVING count(DISTINCT doc_id) > 1)
        SELECT s.doc_id, count(*) n_segments,
               sum(CASE WHEN dup.seg IS NOT NULL THEN 1 ELSE 0 END) n_removed,
               coalesce(string_agg(CASE WHEN dup.seg IS NULL THEN s.seg END,
                                   ' ' ORDER BY s.i), '') text_clean
        FROM s LEFT JOIN dup ON s.seg = dup.seg
        GROUP BY s.doc_id
    """).fetchall()
    assert len(oracle) == len(got)
    for doc_id, n_seg, n_rm, clean in oracle:
        assert got[doc_id] == (n_seg, n_rm, clean), doc_id


# ---------------------------------------------------------------------------
# bigram_logprob_scores
# ---------------------------------------------------------------------------

def test_bigram_lm_orders_fluent_above_shuffled(spark):
    fluent = "the cat sat on the mat and the dog sat on the rug " * 4
    # same unigram profile, scrambled order — the bigram term must separate
    shuffled = "mat the on dog sat the and rug cat the on sat the the " * 4
    df = spark.createDataFrame(
        [(1, fluent), (2, shuffled)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["logprob"] for r in tx.bigram_logprob_scores(df).collect()}
    assert got[1] > got[2]


def test_bigram_lm_skips_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "word"), (2, "two words")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["n_bigrams"] for r in tx.bigram_logprob_scores(df).collect()}
    assert 1 not in got and got[2] == 1


def test_bigram_lm_oracle_differential(spark, tables, duck):
    docs = tables["documents"].limit(120)
    docs.createOrReplaceTempView("__docs120")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob"])
        for r in tx.bigram_logprob_scores(docs, lam=0.8).collect()
    }
    oracle = duck.execute("""
        WITH d AS (SELECT doc_id, text FROM documents
                   ORDER BY doc_id LIMIT 120),
             t AS (SELECT doc_id,
                          string_split_regex(trim(lower(text)), '\\s+') tk
                   FROM d),
             p AS (SELECT doc_id, tk[i] w1, tk[i+1] w2
                   FROM t, UNNEST(generate_series(1, len(tk)-1)) g(i)),
             cb AS (SELECT w1, w2, count(*) cb FROM p GROUP BY 1, 2),
             cc AS (SELECT w1, sum(cb) cc FROM cb GROUP BY 1),
             cu AS (SELECT w2 w, count(*) cu FROM p GROUP BY 1),
             tot AS (SELECT CAST(sum(cu) AS DOUBLE) total FROM cu)
        SELECT p.doc_id, count(*) n_bigrams,
               round(CAST(sum(CAST(round(ln(
                     0.8 * cb.cb / cc.cc + 0.2 * cu.cu / tot.total
                  ), 8) AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) logprob
        FROM p JOIN cb USING (w1, w2) JOIN cc USING (w1)
               JOIN cu ON cu.w = p.w2, tot
        GROUP BY p.doc_id
    """).fetchall()
    assert len(oracle) == len(got)
    for doc_id, nb, lp in oracle:
        gnb, glp = got[doc_id]
        assert gnb == nb
        assert abs(glp - lp) < 1e-9, doc_id
