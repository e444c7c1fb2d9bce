"""Blocked-GEMM exact cosine pairs + banded LSH (the r6 scale-safe
near-dup certification, VERDICT r5 task 4).

The certified semantic-dedup queries used to run the n²-row crossJoin
(`exact=True`); they now run `cosine_pairs_blocked` — same exact result
set, grid-partitioned GEMM layout (n×B shuffle, BLAS per block pair).
These tests pin blocked ≡ crossJoin on the fixture, and the banded-LSH
high-threshold contract (candidates ⊆ exact, recall ≥ target, exact-path
sim values).
"""

from __future__ import annotations

import numpy as np
import pytest

from bullet_spark_spark.operators import similarity as sim


def _pairs(df):
    return {(r.id_a, r.id_b, r.sim) for r in df.collect()}


def test_blocked_equals_crossjoin_on_fixture(tables):
    emb = tables["embeddings"]
    exact = _pairs(sim.cosine_near_dup_pairs(emb, threshold=0.42, exact=True))
    blocked = _pairs(sim.cosine_pairs_blocked(emb, 0.42))
    assert exact == blocked
    assert len(exact) > 0


def test_blocked_block_count_invariance(tables):
    """The grid size is a layout knob, not a semantics knob."""
    emb = tables["embeddings"]
    b4 = _pairs(sim.cosine_pairs_blocked(emb, 0.42, n_blocks=4))
    b13 = _pairs(sim.cosine_pairs_blocked(emb, 0.42, n_blocks=13))
    assert b4 == b13


def test_blocked_block_count_invariance_sf01(spark):
    """VERDICT r6 task 4: blocking invariance AT THE DRIVER-CERTIFIED
    SCALE (sf0.1, the bench corpus; same threshold as the driver-green
    sim_cosine_neardup row) — n_blocks=3 and n_blocks=8 produce the
    identical (id_a, id_b, sim) set, so B is provably output-invariant
    and can be retuned for a 100× corpus without re-certification."""
    import os

    sf01 = "/root/testdata/sf0.1"
    if not os.path.exists(f"{sf01}/embeddings.parquet"):
        pytest.skip("sf0.1 testdata not present")
    from bullet_spark_spark.sources.batch import load_table

    emb = load_table(spark, "embeddings", sf01)
    b3 = _pairs(sim.cosine_pairs_blocked(emb, 0.42, n_blocks=3))
    b8 = _pairs(sim.cosine_pairs_blocked(emb, 0.42, n_blocks=8))
    assert b3 == b8
    assert len(b3) > 100  # the sf0.1 corpus has ~441 qualifying pairs


def test_near_dup_default_routes_to_blocked(tables):
    emb = tables["embeddings"]
    default = _pairs(sim.cosine_near_dup_pairs(emb, threshold=0.42))
    exact = _pairs(sim.cosine_near_dup_pairs(emb, threshold=0.42, exact=True))
    assert default == exact


@pytest.fixture(scope="module")
def neardup_corpus(spark):
    """80 random 32-dim vectors + a 0.05-σ perturbed near-dup for every
    4th — the high-similarity regime banded LSH is built for."""
    rng = np.random.RandomState(7)
    base = rng.randn(80, 32)
    rows, vid = [], 0
    for i in range(80):
        rows.append((vid, base[i].tolist()))
        vid += 1
        if i % 4 == 0:
            rows.append((vid, (base[i] + 0.05 * rng.randn(32)).tolist()))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_banded_subset_and_recall(neardup_corpus):
    exact = _pairs(sim.cosine_near_dup_pairs(neardup_corpus, threshold=0.9, exact=True))
    lsh = _pairs(sim.cosine_pairs_lsh_banded(neardup_corpus, threshold=0.9))
    assert lsh <= exact  # precision 1.0: re-rank uses the exact fold dot
    assert len(exact) >= 15
    assert len(lsh & exact) / len(exact) >= 0.95  # r=12, L=24 → ~0.98 @ s=0.9


def test_lsh_banded_sims_bit_identical_to_exact(neardup_corpus):
    """Re-rank uses the same ordered-fold dot as the exact path, so any
    emitted (pair, sim) matches the exact path's value exactly."""
    exact = dict(
        ((a, b), s)
        for a, b, s in _pairs(
            sim.cosine_near_dup_pairs(neardup_corpus, threshold=0.9, exact=True)
        )
    )
    for a, b, s in _pairs(sim.cosine_pairs_lsh_banded(neardup_corpus, threshold=0.9)):
        assert exact[(a, b)] == s


def test_mmr_rerank_string_ids(spark):
    """ADVICE r5: output id dtypes derive from the candidates schema —
    string doc ids must round-trip."""
    rows = [
        ("q1", "docB", [1.0, 0.0], 0.9),
        ("q1", "docA", [0.9, 0.1], 0.8),
        ("q1", "docC", [0.0, 1.0], 0.7),
    ]
    cands = spark.createDataFrame(
        rows, "query_id string, vec_id string, embedding array<double>, sim double"
    )
    out = sim.mmr_rerank(cands, k=2, lam=0.5).collect()
    assert {r.query_id for r in out} == {"q1"}
    assert all(isinstance(r.vec_id, str) for r in out)
    assert len(out) == 2


def test_cosine_join_blocked_equals_broadcast_crossjoin(tables):
    """The cross-corpus grid join (decontam scale path) reproduces the
    broadcast-crossJoin result set exactly on the fixture."""
    emb = tables["embeddings"]
    corpus = emb.filter("vec_id % 2 = 0")
    evals = emb.filter("vec_id % 2 = 1").selectExpr(
        "vec_id as eval_id", "embedding as eval_vec"
    )
    bc = {
        (r.vec_id, r.eval_id, r.sim)
        for r in sim.semantic_decontaminate(corpus, evals, threshold=0.42).collect()
    }
    gr = {
        (r.vec_id, r.eval_id, r.sim)
        for r in sim.semantic_decontaminate(
            corpus, evals, threshold=0.42, blocked=True
        ).collect()
    }
    assert bc == gr
    assert len(bc) > 0


def test_cosine_join_blocked_plan_no_cartesian(spark, tables):
    emb = tables["embeddings"]
    evals = emb.selectExpr("vec_id as eval_id", "embedding as eval_vec")
    df = sim.cosine_join_blocked(emb, evals, 0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hard_negatives_excludes_self_and_positives(spark):
    """Constructed geometry: anchor 0's nearest neighbors in order are
    1 (its labeled positive), then 2, 3, 4. Hard negatives at k=2 must
    be exactly [2, 3] — self and the positive excluded, order by sim."""
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.01]),   # positive of 0 (nearest)
        (2, [0.99, 0.1]),     # hardest negative
        (3, [0.9, 0.3]),
        (4, [0.0, 1.0]),      # far
    ]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    pos = spark.createDataFrame([(0, 1)], "anchor_id long, positive_id long")
    got = sim.hard_negatives(corpus, pos, k=2).collect()
    assert [(r.anchor_id, r.vec_id, r.rank) for r in got] == [(0, 2, 1), (0, 3, 2)]


def test_hard_negatives_matches_numpy_replica(spark):
    """Random corpus + random positive sets: the mined negatives equal a
    numpy argsort replica with the same exclusions and tie-breaks."""
    import numpy as np

    rng = np.random.RandomState(7)
    n, dim, k = 40, 8, 5
    mat = rng.randn(n, dim)
    corpus = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    pos_pairs = [(0, 3), (0, 7), (11, 2)]
    pos = spark.createDataFrame(pos_pairs, "anchor_id long, positive_id long")
    got = {
        (r.anchor_id, r.rank): r.vec_id
        for r in sim.hard_negatives(corpus, pos, k=k).collect()
    }
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T
    for a in {p[0] for p in pos_pairs}:
        banned = {a} | {p for q, p in pos_pairs if q == a}
        # replicate the operator's 6-dp sim rounding before ordering
        order = sorted(
            (i for i in range(n) if i not in banned),
            key=lambda i: (-round(float(sims[a, i]), 6), i),
        )[:k]
        for rank, i in enumerate(order, 1):
            assert got[(a, rank)] == i, (a, rank, got[(a, rank)], i)


def test_retrieval_metrics_hand_computed(spark):
    """Hand-checked panel: q1 hits 2 of 3 relevant at ranks 1 and 3;
    q2 retrieves nothing relevant; q3 is in truth but absent from
    results (must score 0, not vanish)."""
    import math as m

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)],
        "query_id long, vec_id long, rank long",
    )
    truth = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 77), (3, 5)],
        "query_id long, vec_id long",
    )
    out = {r.query_id: r for r in sim.retrieval_metrics(results, truth, k=3).collect()}
    q1 = out[1]
    assert (q1.n_rel, q1.n_hit) == (3, 2)
    assert q1.recall_at_k == round(2 / 3, 6)
    assert q1.precision_at_k == round(2 / 3, 6)
    assert q1.mrr == 1.0
    dcg = 1 / m.log2(2) + 1 / m.log2(4)
    idcg = 1 / m.log2(2) + 1 / m.log2(3) + 1 / m.log2(4)
    assert abs(q1.ndcg_at_k - dcg / idcg) < 1e-6
    assert (out[2].n_hit, out[2].mrr, out[2].ndcg_at_k) == (0, 0.0, 0.0)
    assert (out[3].n_rel, out[3].recall_at_k, out[3].ndcg_at_k) == (1, 0.0, 0.0)


def test_retrieval_metrics_perfect_retriever(spark):
    """A retriever returning exactly the relevant set in any order has
    recall 1 and ndcg 1."""
    truth = spark.createDataFrame(
        [(1, i) for i in range(5)], "query_id long, vec_id long"
    )
    results = spark.createDataFrame(
        [(1, i, r + 1) for r, i in enumerate([4, 2, 0, 3, 1])],
        "query_id long, vec_id long, rank long",
    )
    r = sim.retrieval_metrics(results, truth, k=5).collect()[0]
    assert (r.recall_at_k, r.precision_at_k, r.mrr, r.ndcg_at_k) == (
        1.0, 1.0, 1.0, 1.0,
    )
