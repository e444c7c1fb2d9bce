"""Property-based differentials for the round-4 text operators: random
small corpora (tiny vocabulary to force span collisions; empty docs,
1-word docs, full-duplicate docs) through Spark's scrub_repeated_spans
and unigram_logprob_scores vs sequential Python references — rebuild
indices, OOV floors and decimal summation pinned on adversarial shapes
the fixture corpus can't cover."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal


def _round_half_up(x, n):
    """Spark/DuckDB round(): decimal HALF_UP on the shortest repr of the
    double (Python's round() is banker's HALF_EVEN — differs exactly at
    .5 boundaries, which hypothesis finds)."""
    q = Decimal(1).scaleb(-n)
    return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bullet_spark_spark.operators import text as tx


def _toks(t):
    """Engine tokenization convention: split(trim(lower(text)), '\\s+').
    Both Spark and DuckDB yield [''] for empty text — one empty token."""
    import re as _re

    return _re.split(r"\s+", t.strip().lower())


_WORDS = ["a", "bb", "ccc", "scan", "row"]


@st.composite
def corpus(draw):
    n = draw(st.integers(2, 7))
    docs = []
    for i in range(n):
        words = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10))
        docs.append((i, " ".join(words)))
    if n >= 2:
        docs[-1] = (docs[-1][0], docs[0][1])  # force one exact duplicate
    return docs


def _ref_scrub(docs, w, min_docs):
    toks = {i: _toks(t) for i, t in docs}
    span_docs: dict[str, set[int]] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - w + 1):
            span_docs.setdefault(" ".join(ts[p : p + w]), set()).add(i)
    frequent = {s for s, ds in span_docs.items() if len(ds) >= min_docs}
    out = {}
    for i, ts in toks.items():
        covered = set()
        for p in range(len(ts) - w + 1):
            if " ".join(ts[p : p + w]) in frequent:
                covered.update(range(p, p + w))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (" ".join(kept), len(ts), len(covered))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus())
def test_scrub_spans_random_corpora(spark, data):
    w = 3
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in tx.scrub_repeated_spans(
            spark.createDataFrame(data, ["doc_id", "text"]), w=w, min_docs=2
        ).collect()
    }
    assert got == _ref_scrub(data, w, 2)


def _ref_unigram(docs, vocab_size, floor):
    counts: dict[str, int] = {}
    for _, t in docs:
        for w in _toks(t):
            counts[w] = counts.get(w, 0) + 1
    total = float(sum(counts.values()))
    vocab = dict(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size])
    out = {}
    for i, t in docs:
        ws = _toks(t)
        s = sum(_round_half_up(math.log(vocab.get(w, floor) / total), 8) for w in ws)
        out[i] = (len(ws), float(_round_half_up(float(s) / len(ws), 6)))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus())
def test_unigram_logprob_random_corpora(spark, data):
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob"])
        for r in tx.unigram_logprob_scores(
            spark.createDataFrame(data, ["doc_id", "text"]),
            vocab_size=3, floor_count=0.5,
        ).collect()
    }
    assert got == _ref_unigram(data, 3, 0.5)


def _ref_sessionize(rows, gap_minutes):
    """Sequential reference: per user, sorted by (ts, event_id), new
    session when gap > gap_minutes (strictly)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, eid, ts in rows:
        by_user[uid].append((ts, eid))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        idx = -1
        prev = None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap_minutes * 60:
                idx += 1
            out[eid] = idx
            prev = ts
    return out


@st.composite
def event_sets(draw):
    import datetime as dt

    n = draw(st.integers(2, 25))
    base = dt.datetime(2024, 5, 1)
    rows = []
    for eid in range(n):
        uid = draw(st.integers(0, 2))
        # minute offsets cluster around session-gap boundaries (30 min)
        mins = draw(st.sampled_from([0, 1, 29, 30, 31, 60, 90, 1440]))
        extra = draw(st.integers(0, 3))
        rows.append((uid, eid, base + dt.timedelta(minutes=mins + extra)))
    return rows


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(event_sets())
def test_sessionize_random_events(spark, rows):
    from bullet_spark_spark.operators import behavior as bh

    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    got = {
        r["event_id"]: r["session_idx"]
        for r in bh.sessionize(
            df, gap_minutes=30, tiebreak_col="event_id"
        ).collect()
    }
    assert got == _ref_sessionize(rows, 30)
