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


# ---------------------------------------------------------------------------
# gopher_verdict
# ---------------------------------------------------------------------------

def _verdict(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(tx.gopher_verdict(F.col("text"), **kw).alias("v")).collect()[0]["v"]


def test_gopher_too_few_words(spark):
    assert _verdict(spark, "just a few words here") == "too_few_words"


def test_gopher_keep_prose(spark):
    prose = ("the quick brown fox jumps over that lazy dog and runs to be "
             "with friends of every kind have fun ") * 5
    assert _verdict(spark, prose) == "keep"


def test_gopher_short_words(spark):
    # 60 one-char words -> mean len 1 < 3
    assert _verdict(spark, " ".join(["a"] * 60)) == "short_words"


def test_gopher_long_words(spark):
    assert _verdict(spark, " ".join(["pneumonoultramicroscopic"] * 60)) == "long_words"


def test_gopher_symbol_heavy(spark):
    base = ["word"] * 60
    text = " ".join(base) + " " + "#" * 20
    assert _verdict(spark, text) == "symbol_heavy"


def test_gopher_low_alpha_words(spark):
    # 60 tokens, 30 numeric -> alpha frac 0.5 < 0.8 (mean len kept in [3,10])
    toks = ["word"] * 30 + ["1234"] * 30
    assert _verdict(spark, " ".join(toks)) == "low_alpha_words"


def test_gopher_few_stopwords(spark):
    # alphabetic words, good lengths, but no stopwords from the Gopher set
    toks = ["apple", "banana", "cherry"] * 20
    assert _verdict(spark, " ".join(toks)) == "few_stopwords"


def test_gopher_rule_order_first_failure_wins(spark):
    # short AND symbol-heavy -> word-count rule fires first
    assert _verdict(spark, "### # #") == "too_few_words"


# ---------------------------------------------------------------------------
# energy_segments (audio VAD)
# ---------------------------------------------------------------------------

def _wav_df(spark, clips):
    """clips: list of (media_id, numpy int16 samples, rate)."""
    from bullet_spark_spark.operators import multimodal as mm

    rows = [(mid, mm.encode_wav(x, rate)) for mid, x, rate in clips]
    raw = spark.createDataFrame(rows, "media_id long, bytes binary")
    return mm.decode_wav(raw)


def test_vad_finds_two_bursts_with_silence_gap(spark):
    import numpy as np

    rate = 16000
    tone = (np.sin(np.arange(rate // 2) * 0.3) * 12000).astype(np.int16)  # 0.5s
    silence = np.zeros(rate // 2, dtype=np.int16)
    clip = np.concatenate([silence, tone, silence, tone, silence])
    from bullet_spark_spark.operators import multimodal as mm

    segs = mm.energy_segments(_wav_df(spark, [(1, clip, rate)])).collect()
    assert len(segs) == 2
    s0, s1 = sorted(segs, key=lambda r: r["seg_idx"])
    assert abs(s0["start_sec"] - 0.5) < 0.05 and abs(s0["end_sec"] - 1.0) < 0.05
    assert abs(s1["start_sec"] - 1.5) < 0.05 and abs(s1["end_sec"] - 2.0) < 0.05
    assert s0["mean_rms"] > 0.02


def test_vad_silence_only_clip_yields_no_segments(spark):
    import numpy as np
    from bullet_spark_spark.operators import multimodal as mm

    clip = np.zeros(16000, dtype=np.int16)
    segs = mm.energy_segments(_wav_df(spark, [(5, clip, 16000)])).collect()
    assert segs == []


def test_vad_min_frames_drops_short_blips(spark):
    import numpy as np
    from bullet_spark_spark.operators import multimodal as mm

    rate = 16000
    flen = rate * 20 // 1000  # one 20ms frame
    blip = (np.sin(np.arange(flen) * 0.3) * 12000).astype(np.int16)  # 1 frame
    clip = np.concatenate([np.zeros(flen * 5, dtype=np.int16), blip,
                           np.zeros(flen * 5, dtype=np.int16)])
    segs = mm.energy_segments(
        _wav_df(spark, [(9, clip, rate)]), min_frames=2
    ).collect()
    assert segs == []
    segs1 = mm.energy_segments(
        _wav_df(spark, [(9, clip, rate)]), min_frames=1
    ).collect()
    assert len(segs1) == 1


# ---------------------------------------------------------------------------
# token_budget_plan
# ---------------------------------------------------------------------------

def test_token_budget_plan_epochs_and_caps(spark):
    from bullet_spark_spark.operators import sampling as smp

    # src a: 100 tokens; src b: 1000 tokens; src c: unweighted
    docs = spark.createDataFrame(
        [("a", 60), ("a", 40), ("b", 1000), ("c", 10)],
        "source string, toks long",
    )
    plan = {r["source"]: r for r in smp.token_budget_plan(
        docs, "source", F.col("toks"),
        budget_tokens=1000, weights={"a": 0.5, "b": 0.5}, max_epochs=4.0,
    ).collect()}
    # a: target 500 over 100 tokens -> raw 5 epochs -> capped at 4
    assert plan["a"]["n_tokens"] == 100
    assert plan["a"]["target_tokens"] == 500.0
    assert plan["a"]["epochs"] == 4.0
    assert plan["a"]["capped"] is True
    assert plan["a"]["sample_rate"] == 1.0
    assert plan["a"]["planned_tokens"] == 400.0
    # b: target 500 over 1000 tokens -> 0.5 epochs -> sample_rate 0.5
    assert plan["b"]["epochs"] == 0.5
    assert plan["b"]["capped"] is False
    assert plan["b"]["sample_rate"] == 0.5
    assert plan["b"]["planned_tokens"] == 500.0
    # c: unweighted -> planned to zero, not silently kept
    assert plan["c"]["weight"] == 0.0
    assert plan["c"]["planned_tokens"] == 0.0
    assert plan["c"]["capped"] is False


# ---------------------------------------------------------------------------
# pair_eval_metrics
# ---------------------------------------------------------------------------

def test_pair_eval_metrics_counts(spark):
    pred = spark.createDataFrame(
        [(1, 2), (3, 4), (6, 5)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame(
        [(2, 1), (5, 6), (7, 8)], "id_a long, id_b long"
    )
    r = dd.pair_eval_metrics(pred, truth).collect()[0]
    # orientation canonicalized: (1,2) and (5,6) match
    assert (r["n_pred"], r["n_true"], r["tp"]) == (3, 3, 2)
    assert r["precision"] == round(2 / 3, 6)
    assert r["recall"] == round(2 / 3, 6)
    assert r["f1"] == round(2 / 3, 6)


def test_pair_eval_metrics_empty_prediction(spark):
    pred = spark.createDataFrame([], "id_a long, id_b long")
    truth = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = dd.pair_eval_metrics(pred, truth).collect()[0]
    assert (r["n_pred"], r["tp"]) == (0, 0)
    assert r["precision"] == 0.0 and r["recall"] == 0.0 and r["f1"] == 0.0


def test_pair_eval_metrics_duplicate_orientations_collapse(spark):
    pred = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = dd.pair_eval_metrics(pred, truth).collect()[0]
    assert (r["n_pred"], r["n_true"], r["tp"]) == (1, 1, 1)
    assert r["f1"] == 1.0


# ---------------------------------------------------------------------------
# weighted_jaccard_pairs
# ---------------------------------------------------------------------------

def test_weighted_jaccard_exact_value(spark):
    # doc1: "a b c" x2 -> grams {"a b c": 2}? n=3 over 6 tokens "a b c a b c"
    # grams: "a b c","b c a","c a b","a b c" -> tf{"a b c":2, "b c a":1, "c a b":1}, T=4
    # doc2: "a b c x y z" -> grams "a b c","b c x","c x y","x y z" tf 1 each, T=4
    # shared: "a b c" min(2,1)=1 -> wJ = 1/(4+4-1) = 1/7
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c x y z")],
        "doc_id long, text string",
    )
    out = dd.weighted_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0, max_df_frac=None
    ).collect()
    assert len(out) == 1
    assert out[0]["wjaccard"] == round(1 / 7, 6)


def test_weighted_jaccard_sees_repetition_mass(spark):
    # identical gram SETS, different multiplicities: set Jaccard = 1,
    # weighted must be < 1
    # doc1 grams: tf{p q r:3, q r p:2, r p q:2}; doc2: tf 1 each — same SET
    docs = spark.createDataFrame(
        [(1, "p q r p q r p q r"), (2, "p q r p q")],
        "doc_id long, text string",
    )
    out = dd.weighted_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0, max_df_frac=None
    ).collect()
    assert len(out) == 1
    assert 0.0 < out[0]["wjaccard"] < 1.0
    setj = dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0
    ).collect()
    assert setj[0]["jaccard"] == 1.0  # the measure this family flattens


def test_weighted_jaccard_identical_docs_one(spark):
    docs = spark.createDataFrame(
        [(1, "m n o p q"), (2, "m n o p q")], "doc_id long, text string"
    )
    out = dd.weighted_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0, max_df_frac=None
    ).collect()
    assert out[0]["wjaccard"] == 1.0


def test_cws_estimates_exact_weighted_jaccard(spark):
    """Ioffe CWS differential vs the exact operator (r9 verdict task):
    with 64 hashes the estimate of each pair's multiset Jaccard must sit
    within the binomial band of weighted_jaccard_pairs' exact value."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta " * 4),
            (2, "alpha beta gamma delta epsilon zeta " * 4 + "eta theta iota"),
            (3, "totally different words here now okay"),
        ],
        "doc_id long, text string",
    )
    exact = {
        (r["id_a"], r["id_b"]): r["wjaccard"]
        for r in dd.weighted_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.0,
            max_df=None, max_df_frac=None,
        ).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dd.weighted_minhash_dedup_pairs_cws(
            docs, "doc_id", "text", threshold=0.0, num_hashes=64, bands=32
        ).collect()
    }
    assert (1, 2) in exact and (1, 2) in est
    assert abs(est[(1, 2)] - exact[(1, 2)]) < 0.2  # ~3 se at k=64
    assert (1, 3) not in est and (2, 3) not in est


def _cws_pair_estimate(spark, postings, num_hashes):
    """Signature-level collision fraction for ids 1 and 2 of a direct
    (id, gram, tf) posting frame — bypasses text so tests control weights."""
    tf = spark.createDataFrame(postings, "id long, gram string, tf double")
    sigs = dd.weighted_minhash_signatures_cws(tf, "id", "gram", "tf", num_hashes)
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    return dd.minhash_similarity(sigs, cands, "id").collect()[0]["est_jaccard"]


def test_cws_heavy_tail_weight_no_expansion(spark):
    """THE reason CWS exists: a gram at tf=100_000 costs the same
    O(num_hashes) as tf=1 (the integer-expansion variant would explode
    100k hash inputs for it). A{x:1e5, y:1e5} vs B{x:1e5}: exact
    weighted Jaccard = 1e5 / 2e5 = 0.5."""
    est = _cws_pair_estimate(
        spark,
        [(1, "x", 100_000.0), (1, "y", 100_000.0), (2, "x", 100_000.0)],
        num_hashes=128,
    )
    assert abs(est - 0.5) < 0.15  # ~3 se at k=128, J=0.5


def test_cws_real_valued_weights(spark):
    """Real weights (the multiset reduction cannot express these):
    A{x:1.0} vs B{x:0.5} -> generalized Jaccard = 0.5/1.0 = 0.5."""
    est = _cws_pair_estimate(
        spark, [(1, "x", 1.0), (2, "x", 0.5)], num_hashes=128
    )
    assert abs(est - 0.5) < 0.15


def test_cws_identical_weights_collide_always(spark):
    """Identical (gram, weight) multisets must produce IDENTICAL
    signatures (consistency property — the sampling is deterministic in
    the weights), so the estimate is exactly 1."""
    est = _cws_pair_estimate(
        spark,
        [(1, "x", 3.0), (1, "y", 7.0), (2, "x", 3.0), (2, "y", 7.0)],
        num_hashes=32,
    )
    assert est == 1.0


def test_cws_drops_nonpositive_weights(spark):
    """Zero/negative/NULL weights carry no mass: a gram at weight 0 must
    not influence the signature (ln w would be undefined)."""
    tf = spark.createDataFrame(
        [(1, "x", 2.0), (1, "junk", 0.0), (2, "x", 2.0), (2, "junk", -1.0)],
        "id long, gram string, tf double",
    )
    sigs = dd.weighted_minhash_signatures_cws(tf, "id", "gram", "tf", 16)
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    est = dd.minhash_similarity(sigs, cands, "id").collect()[0]["est_jaccard"]
    assert est == 1.0  # junk ignored on both sides


def test_posting_join_absolute_df_cap_bounds_candidates(spark):
    """r9 verdict task: the exact posting-join family must honor an
    ABSOLUTE df cap (the fractional cap alone admits (f·N)² candidate
    pairs — quadratic at web scale). Four docs all share one hot gram
    (df=4); with max_df=3 and the fraction disabled, pairs through that
    gram must vanish from all three operators."""
    # "h1 h2 h3" is the only gram every doc shares (df=4); each doc also
    # carries private grams so it still has postings after the prune
    docs = spark.createDataFrame(
        [(i, f"h1 h2 h3 u{i}a u{i}b u{i}c") for i in range(4)],
        "doc_id long, text string",
    )
    wj = dd.weighted_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0,
        max_df=3, max_df_frac=None,
    ).collect()
    assert wj == []  # the hot gram was the only shared one
    cp = dd.containment_pairs(
        docs, "doc_id", "text", n=3, min_containment=0.0,
        max_df=3, max_df_frac=None,
    ).collect()
    assert cp == []
    tc = dd.tfidf_cosine_pairs(
        docs, "doc_id", "text", min_cos=0.0,
        max_df=3, max_df_frac=None,
    ).collect()
    # tokens (not grams) here: h1/h2/h3 each have df=4 > 3 — pruned;
    # private tokens never join across docs
    assert tc == []
    # with the cap relaxed the pairs reappear (6 pairs from 4 docs)
    wj_all = dd.weighted_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0,
        max_df=None, max_df_frac=None,
    ).collect()
    assert len(wj_all) == 6
    # and the effective cap is min(absolute, fractional): frac=1.0 with
    # max_df=3 must still prune (absolute wins)
    wj_min = dd.weighted_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0,
        max_df=3, max_df_frac=1.0,
    ).collect()
    assert wj_min == []


def test_weighted_minhash_estimates_exact_weighted_jaccard(spark):
    """Estimator sanity: with 64 hashes, the weighted-minhash estimate of
    each pair tracks the exact multiset Jaccard within the binomial
    band (se = sqrt(J(1-J)/64) ~ 0.06)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta " * 4),
            (2, "alpha beta gamma delta epsilon zeta " * 4 + "eta theta iota"),
            (3, "totally different words here now okay"),
        ],
        "doc_id long, text string",
    )
    exact = {
        (r["id_a"], r["id_b"]): r["wjaccard"]
        for r in dd.weighted_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.0, max_df_frac=None
        ).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dd.weighted_minhash_dedup_pairs_md5(
            docs, "doc_id", "text", threshold=0.0, num_hashes=64, bands=32
        ).collect()
    }
    assert (1, 2) in exact and (1, 2) in est
    assert abs(est[(1, 2)] - exact[(1, 2)]) < 0.2  # ~3 se
    # the disjoint doc never pairs in either
    assert (1, 3) not in exact and (1, 3) not in est


def test_weighted_minhash_multiplicity_changes_estimate(spark):
    """Same gram SET, different multiplicities: the weighted signature
    must differ (copies gram#k exist only on the heavier side)."""
    docs = spark.createDataFrame(
        [(1, "p q r p q r p q r"), (2, "p q r p q")],
        "doc_id long, text string",
    )
    est = dd.weighted_minhash_dedup_pairs_md5(
        docs, "doc_id", "text", threshold=0.0, num_hashes=64, bands=32
    ).collect()
    assert len(est) == 1
    assert est[0]["est_jaccard"] < 1.0


# ---------------------------------------------------------------------------
# round-8 self-review fixes
# ---------------------------------------------------------------------------

def test_gopher_null_text_rejected(spark):
    df = spark.createDataFrame([(None,)], "text string")
    v = df.select(tx.gopher_verdict(F.col("text")).alias("v")).collect()[0]["v"]
    assert v == "too_few_words"  # a prefilter must not 'keep' missing docs


def test_pair_eval_metrics_both_empty_zero_counts(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    r = dd.pair_eval_metrics(empty, empty).collect()[0]
    assert (r["n_pred"], r["n_true"], r["tp"]) == (0, 0, 0)  # not NULL
    assert r["precision"] == 0.0 and r["recall"] == 0.0 and r["f1"] == 0.0


def test_skew_report_null_key_component_distinct(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("a", "")], "s string, t string"
    )
    out = {r["key"]: r["cnt"] for r in
           rel.key_skew_report(df, ["s", "t"], top_n=5).collect()}
    # NULL and empty-string components must NOT merge
    assert out["a|<null>"] == 2
    assert out["a|"] == 1


# ---------------------------------------------------------------------------
# column_stats
# ---------------------------------------------------------------------------

def test_column_stats_exact_values(spark):
    df = spark.createDataFrame(
        [(1.0, None), (2.0, 5.0), (2.0, 5.0), (4.0, 7.0)],
        "a double, b double",
    )
    out = {r["column"]: r for r in rel.column_stats(df, ["a", "b"]).collect()}
    assert out["a"]["n"] == 4 and out["a"]["n_null"] == 0
    assert out["a"]["ndv"] == 3
    assert out["a"]["min_v"] == 1.0 and out["a"]["max_v"] == 4.0
    # ranks: [1.0, 2.0, 2.0, 4.0]; ceil(.25*4)=1 -> 1.0; ceil(.5*4)=2 -> 2.0;
    # ceil(.75*4)=3 -> 2.0
    assert (out["a"]["q25"], out["a"]["q50"], out["a"]["q75"]) == (1.0, 2.0, 2.0)
    assert out["b"]["n"] == 4 and out["b"]["n_null"] == 1
    assert out["b"]["ndv"] == 2
    assert out["b"]["q50"] == 5.0  # quantiles over the 3 non-null values


def test_column_stats_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "a double")
    r = rel.column_stats(df, ["a"]).collect()[0]
    assert (r["n"], r["n_null"], r["ndv"]) == (2, 2, 0)
    assert r["min_v"] is None and r["q50"] is None


def test_column_stats_distributed_rank_exact(spark):
    # r9 advisory: quantile ranks now come from a range-partitioned global
    # rank (offset + per-slice row_number), not a per-column single-reducer
    # window. Pin exact percentile-disc values over a column large enough
    # to span many range partitions: v = 1..1000 -> ceil(p*n) ranks.
    df = spark.range(1, 1001).select(
        F.col("id").cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
    )
    out = {r["column"]: r for r in rel.column_stats(df, ["a", "b"]).collect()}
    assert out["a"]["n"] == 1000 and out["a"]["ndv"] == 1000
    assert (out["a"]["q25"], out["a"]["q50"], out["a"]["q75"]) == (
        250.0,
        500.0,
        750.0,
    )
    assert out["b"]["ndv"] == 7 and out["b"]["min_v"] == 0.0
    # the row-scale rank window partitions by (column, __pid) — the only
    # column-alone windows left run over the column×partition METADATA
    # frame (offsets/__n), never the melted rows; pin that the rank path
    # is range-partitioned by checking the plan carries a RangePartitioning
    plan = (
        rel.column_stats(df, ["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower(), plan


# ---------------------------------------------------------------------------
# chi2_gof
# ---------------------------------------------------------------------------

def test_chi2_gof_uniform_exact(spark):
    from bullet_spark_spark.operators import distribution as dist

    # counts 30/10: expected 20 each -> chi2 = 100/20 + 100/20 = 10
    rows = [("a",)] * 30 + [("b",)] * 10
    df = spark.createDataFrame(rows, "cat string")
    r = dist.chi2_gof(df, "cat").collect()[0]
    assert (r["n"], r["k"], r["dof"]) == (40, 2, 1)
    assert r["chi2"] == 10.0


def test_chi2_gof_expected_probs_and_missing_category(spark):
    from bullet_spark_spark.operators import distribution as dist

    # observed 'a'x9, 'b'x3; expected p(a)=.5 p(b)=.25 p(c)=.25 over n=12:
    # e = (6, 3, 3); chi2 = 9/6 + 0 + 9/3 = 4.5; c unobserved -> full penalty
    rows = [("a",)] * 9 + [("b",)] * 3
    df = spark.createDataFrame(rows, "cat string")
    r = dist.chi2_gof(df, "cat", {"a": 0.5, "b": 0.25, "c": 0.25}).collect()[0]
    assert (r["n"], r["k"], r["dof"]) == (12, 3, 2)
    assert r["chi2"] == 4.5


def test_chi2_gof_rejects_uncovered_observed_category(spark):
    from bullet_spark_spark.operators import distribution as dist

    # r9 advisory: an observed category missing from `expected` is the
    # strongest drift signal — it must raise, not silently drop from n
    # and the statistic
    rows = [("a",)] * 5 + [("b",)] * 5 + [("NEW",)] * 3
    df = spark.createDataFrame(rows, "cat string")
    with pytest.raises(ValueError, match="missing from `expected`"):
        dist.chi2_gof(df, "cat", {"a": 0.5, "b": 0.5}).collect()


def test_chi2_gof_rejects_nonpositive_probability(spark):
    from bullet_spark_spark.operators import distribution as dist

    df = spark.createDataFrame([("a",), ("b",)], "cat string")
    with pytest.raises(ValueError, match="must be positive"):
        dist.chi2_gof(df, "cat", {"a": 1.0, "b": 0.0})


def test_chi2_gof_perfect_fit_zero(spark):
    from bullet_spark_spark.operators import distribution as dist

    rows = [("x",)] * 5 + [("y",)] * 5
    r = dist.chi2_gof(spark.createDataFrame(rows, "cat string"), "cat").collect()[0]
    assert r["chi2"] == 0.0


# ---------------------------------------------------------------------------
# holt_linear_forecast
# ---------------------------------------------------------------------------

def test_holt_forecast_exact_recurrence(spark):
    import math

    from bullet_spark_spark.operators import temporal as tmp_ops

    vals = [10.0, 12.0, 11.0, 15.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = {r["h"]: r for r in tmp_ops.holt_linear_forecast(
        df, "t", "v", alpha=0.5, beta=0.25, horizon=2, key_cols=["k"]
    ).collect()}

    def q(y):
        return math.floor(y * 1e9) / 1e9

    l, b = vals[0], 0.0
    for x in vals[1:]:
        nl = q(0.5 * x + 0.5 * (l + b))
        nb = q(0.25 * (nl - l) + 0.75 * b)
        l, b = nl, nb
    assert out[1]["level"] == math.floor(l * 1e6) / 1e6
    assert out[1]["trend"] == math.floor(b * 1e6) / 1e6
    for h in (1, 2):
        assert out[h]["forecast"] == math.floor(q(l + h * b) * 1e6) / 1e6
    # upward-trending series forecasts higher ahead
    assert out[2]["forecast"] > out[1]["forecast"]


def test_holt_forecast_single_point_series(spark):
    from bullet_spark_spark.operators import temporal as tmp_ops

    df = spark.createDataFrame([(1, 0, 7.0)], "k long, t long, v double")
    out = tmp_ops.holt_linear_forecast(
        df, "t", "v", horizon=2, key_cols=["k"]
    ).collect()
    assert len(out) == 2
    assert all(r["level"] == 7.0 and r["trend"] == 0.0 and r["forecast"] == 7.0
               for r in out)
