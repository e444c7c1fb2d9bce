"""Property-based differentials for the round-8 families:

- weighted_jaccard_pairs vs a pure-Python multiset-Jaccard reference on
  random small corpora (repetition-heavy inputs the fixture can't cover);
- fuzzy_pairs_blocked recall/precision contracts: every reported pair
  truly has Levenshtein <= d (precision, via a Python DP), and every
  planted substitution-edit pair within d IS reported (the pigeonhole
  recall guarantee on equal-width keys).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bullet_spark_spark.operators import dedup as dd

_WORDS = ["alpha", "beta", "gamma", "delta", "join", "scan", "row", "batch"]


def _py_weighted_jaccard(text_a: str, text_b: str, n: int) -> float | None:
    def tf(text):
        toks = text.lower().split()
        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    ca, cb = tf(text_a), tf(text_b)
    if not ca or not cb:
        return None
    inter = sum(min(ca[g], cb[g]) for g in ca.keys() & cb.keys())
    union = sum(ca.values()) + sum(cb.values()) - inter
    return round(inter / union, 6) if union else None


@st.composite
def corpus(draw):
    n = draw(st.integers(3, 6))
    docs = []
    for i in range(n):
        words = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14))
        docs.append((i, " ".join(words)))
    if docs[0][1]:
        docs[-1] = (docs[-1][0], docs[0][1] + " " + docs[0][1])  # repetition
    return docs


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_weighted_jaccard_matches_python_reference(spark, docs):
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["wjaccard"]
        for r in dd.weighted_jaccard_pairs(
            sdf, "doc_id", "text", n=2, threshold=0.0, max_df_frac=None
        ).collect()
    }
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1 :]:
            ref = _py_weighted_jaccard(ta, tb, 2)
            if ref is None:
                assert (ia, ib) not in got
            elif ref == 0.0:
                # no shared gram -> no posting-join row at all
                assert (ia, ib) not in got or got[(ia, ib)] == 0.0
            else:
                assert got.get((ia, ib)) == ref, (ta, tb)


def _py_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, dp[j] = dp[j], cur
    return dp[len(b)]


@st.composite
def keyset(draw):
    """Random 24-char keys + one planted pair with <=2 substitutions."""
    alphabet = "abcdef"
    n = draw(st.integers(2, 5))
    keys = []
    for i in range(n):
        keys.append(
            (i, "".join(draw(st.lists(st.sampled_from(alphabet),
                                      min_size=24, max_size=24))))
        )
    # plant: copy key 0 with k substitutions at random positions
    k = draw(st.integers(0, 2))
    pos = draw(
        st.lists(st.integers(0, 23), min_size=k, max_size=k, unique=True)
    )
    base = list(keys[0][1])
    for p in pos:
        base[p] = "Z"
    keys.append((100, "".join(base)))
    return keys


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keyset())
def test_fuzzy_pairs_precision_and_planted_recall(spark, keys):
    sdf = spark.createDataFrame(keys, "id long, k string")
    out = dd.fuzzy_pairs_blocked(sdf, "id", "k", max_dist=2, key_width=24)
    rows = out.collect()
    by_id = dict(keys)
    for r in rows:
        # precision: every reported pair truly within distance (Python DP)
        assert _py_lev(by_id[r["id_a"]], by_id[r["id_b"]]) == r["dist"] <= 2
    # recall: the planted substitution pair (0, 100) is always found
    assert any((r["id_a"], r["id_b"]) == (0, 100) for r in rows), rows
