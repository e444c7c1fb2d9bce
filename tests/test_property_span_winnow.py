"""Property-based differentials for the span-dedup family: random small
corpora (tiny vocabulary → forced gram collisions, duplicated passages,
degenerate lengths) run through the Spark operators AND an independent
pure-Python reference, and must agree exactly — span geometry
(gaps-and-islands merge), scrub token masks (both postures), and the
winnowing selection (window-min with leftmost tie-break) all pinned at
once on adversarial shapes the fixture corpus can't cover."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bullet_spark_spark.operators import dedup as dd

_WORDS = ["a", "b", "c", "d", "e"]


@st.composite
def corpus(draw):
    n = draw(st.integers(2, 6))
    docs = []
    for i in range(n):
        words = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20))
        docs.append((i, " ".join(words)))
    return docs


def _toks(text):
    return text.strip().lower().split()


def _ref_dup_positions(docs, k, max_df=1):
    """positions of k-grams present in > max_df distinct docs."""
    from collections import defaultdict

    where = defaultdict(set)
    grams = {}
    for i, text in docs:
        t = _toks(text)
        grams[i] = [tuple(t[p : p + k]) for p in range(len(t) - k + 1)]
        for g in grams[i]:
            where[g].add(i)
    return {
        i: [p for p, g in enumerate(gs) if len(where[g]) > max_df]
        for i, gs in grams.items()
    }, where, grams


def _ref_spans(positions, k):
    """gaps-and-islands merge of duplicated positions."""
    spans = []
    cur = None
    for p in sorted(positions):
        if cur is not None and p <= cur[1] + k:
            cur = (cur[0], p)
        else:
            if cur is not None:
                spans.append(cur)
            cur = (p, p)
    if cur is not None:
        spans.append(cur)
    return spans  # list of (first_pos, last_pos)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_duplicated_spans_matches_reference(spark, data):
    k = 3
    got = {
        r.id: (r.n_tokens, r.dup_grams, r.dup_spans, r.dup_tokens)
        for r in dd.duplicated_spans(
            spark.createDataFrame(data, "doc_id long, text string"), k=k
        ).collect()
    }
    pos, _, _ = _ref_dup_positions(data, k)
    want = {}
    for i, text in data:
        ps = pos.get(i, [])
        if not ps:
            continue
        spans = _ref_spans(ps, k)
        want[i] = (
            len(_toks(text)),
            len(ps),
            len(spans),
            sum(last - first + k for first, last in spans),
        )
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus(), st.booleans())
def test_scrub_matches_reference(spark, data, keep_first):
    k = 3
    got = {
        r.id: (r.n_tokens, r.dup_tokens, r.text_clean)
        for r in dd.scrub_duplicated_spans(
            spark.createDataFrame(data, "doc_id long, text string"),
            k=k,
            keep_first=keep_first,
        ).collect()
    }
    pos, where, grams = _ref_dup_positions(data, k)
    want = {}
    for i, text in data:
        t = _toks(text)
        if len(t) < k:
            continue
        covered = set()
        for p in pos.get(i, []):
            if keep_first and i == min(where[grams[i][p]]):
                continue
            covered.update(range(p, p + k))
        keep = [t[j] for j in range(len(t)) if j not in covered]
        want[i] = (len(t), len(covered), " ".join(keep))
    assert got == want


def _ref_winnow(text, k, w):
    """Reference winnowing: each complete window of w consecutive gram
    md5 hashes selects its min (leftmost on ties)."""
    t = _toks(text)
    grams = [" ".join(t[p : p + k]) for p in range(len(t) - k + 1)]
    hashes = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    sel = set()
    for s in range(0, len(grams) - w + 1):
        window = hashes[s : s + w]
        m = min(window)
        sel.add((s + window.index(m), m))
    return sel


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_winnow_selection_matches_reference(spark, data):
    k, w = 3, 3
    got = {
        (r.id, r.pos, r.fp)
        for r in dd.winnow_fingerprints(
            spark.createDataFrame(data, "doc_id long, text string"), k=k, w=w
        ).collect()
    }
    want = {
        (i, p, h)
        for i, text in data
        if len(_toks(text)) >= k + w - 1
        for p, h in _ref_winnow(text, k, w)
    }
    assert got == want
