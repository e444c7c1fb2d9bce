"""Round-7 operator tests: frozen release gate, md5-portable CMS,
exact overlap matrix (the oracle-row backing operators)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import sketch as sk
from bullet_spark_spark.operators import quality_model as qm


# ---------------------------------------------------------------------------
# frozen_release_gate
# ---------------------------------------------------------------------------

def test_frozen_artifact_loads_and_is_pinned():
    m = qm.load_frozen_release()
    assert m["version"] == "quality-release-v1"
    assert set(m["weights"]) == {"alpha_ratio", "punct_ratio", "stop_ratio", "log_len"}
    assert m["threshold"] == 0.5
    assert len(m["stopwords_en"]) == 10


def test_frozen_release_gate_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was good for everyone involved"),
            (2, "!!!???;;;:::###$$$%%%^^^&&&***((()))___+++===~~~```|||"),
            (3, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        ],
        "doc_id long, text string",
    )
    out = qm.frozen_release_gate(docs).collect()
    got = {r["doc_id"]: (r["score"], r["kept"]) for r in out}
    # stopword-rich alpha text scores high; punctuation wall scores low
    assert got[1][0] > 0.5 and got[1][1] is True
    assert got[2][0] < 0.5 and got[2][1] is False
    # the kept flag is a pure function of the ROUNDED published score
    for score, kept in got.values():
        assert kept == (score >= 0.5)


def test_frozen_release_gate_matches_python_replica(spark):
    """Differential vs a plain-Python sigmoid over the same features."""
    import math
    import re

    m = qm.load_frozen_release()
    text = "the quick brown fox jumps over the lazy dog and it was fine"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = qm.frozen_release_gate(docs).collect()[0]

    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    alpha = len(re.sub(r"[^a-zA-Z]", "", text)) / len(text)
    punct = len([c for c in text if not c.isalnum() and not c.isspace()]) / len(text)
    stop = sum(1 for t in toks if t in set(m["stopwords_en"])) / len(toks)
    z = (
        m["intercept"]
        + m["weights"]["alpha_ratio"] * alpha
        + m["weights"]["punct_ratio"] * punct
        + m["weights"]["stop_ratio"] * stop
        + m["weights"]["log_len"] * math.log(len(text))
    )
    expect = round(1.0 / (1.0 + math.exp(-z)), 6)
    assert abs(r["score"] - expect) < 1e-9
    assert r["kept"] == (expect >= 0.5)


def test_frozen_release_gate_no_shuffle(spark):
    """The gate is one narrow codegen map — no Exchange in the plan."""
    import contextlib
    import io

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        qm.frozen_release_gate(docs).explain("formatted")
    assert "Exchange" not in buf.getvalue()


# ---------------------------------------------------------------------------
# md5-portable CMS
# ---------------------------------------------------------------------------

def _md5_pos(i: int, key, w: int) -> int:
    h = hashlib.md5(f"{i}:{key}".encode()).hexdigest()
    return int(h[:8], 16) % w


def test_cms_portable_matches_python_replica(spark):
    keys = [1, 2, 2, 3, 3, 3, 7, 7, 7, 7]
    w, d = 64, 3
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    cms = sk.cms_build(df, "k", w=w, d=d, portable=True)
    got = {(r["row"], r["col"]): r["cnt"] for r in cms.collect()}
    expect: dict = {}
    for k in keys:
        for i in range(d):
            cell = (i, _md5_pos(i, k, w))
            expect[cell] = expect.get(cell, 0) + 1
    assert got == expect

    probe = spark.createDataFrame([(k,) for k in {1, 2, 3, 7, 99}], "k long")
    est = {
        r["k"]: r["freq_est"]
        for r in sk.cms_lookup(probe, "k", cms, w=w, d=d, portable=True).collect()
    }
    truth = {1: 1, 2: 2, 3: 3, 7: 4, 99: 0}
    for k, t in truth.items():
        assert est[k] >= t  # never underestimates
    exp_est = {
        k: min(
            sum(v for cell, v in expect.items() if cell == (i, _md5_pos(i, k, w)))
            for i in range(d)
        )
        for k in truth
    }
    assert est == exp_est


def test_cms_portable_and_engine_hash_disagree_on_cells(spark):
    """Sanity: portable=True actually switches the hash."""
    df = spark.createDataFrame([(12345,)], "k long")
    a = {(r["row"], r["col"]) for r in sk.cms_build(df, "k", w=1 << 20, d=3).collect()}
    b = {
        (r["row"], r["col"])
        for r in sk.cms_build(df, "k", w=1 << 20, d=3, portable=True).collect()
    }
    assert a != b


# ---------------------------------------------------------------------------
# overlap_matrix_exact
# ---------------------------------------------------------------------------

def test_overlap_matrix_exact_hand_computed(spark):
    rows = [
        ("a", 1), ("a", 2), ("a", 3),
        ("b", 2), ("b", 3), ("b", 4),
        ("c", 9),  # zero overlap with both
        ("a", None),  # NULL keys skipped
    ]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in sk.overlap_matrix_exact(df, "g", "k").collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["n_a_est"], ab["n_b_est"]) == (3, 3)
    assert ab["n_overlap_est"] == 2.0 and ab["n_union_est"] == 4
    assert ab["jaccard_est"] == 0.5
    ac = out[("a", "c")]  # zero-overlap pairs surface with jaccard 0
    assert ac["n_overlap_est"] == 0.0 and ac["jaccard_est"] == 0.0
    assert ac["n_union_est"] == 4


def test_overlap_matrix_exact_surface_matches_hll(spark):
    """Same output columns as hll_overlap_matrix — the panels union."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2)], "g string, k long"
    )
    exact = sk.overlap_matrix_exact(df, "g", "k")
    approx = sk.hll_overlap_matrix(df, "g", "k")
    assert exact.columns == approx.columns
    # same names and types (nullability is a plan artifact, not a contract)
    assert [(f.name, f.dataType) for f in exact.schema] == [
        (f.name, f.dataType) for f in approx.schema
    ]
