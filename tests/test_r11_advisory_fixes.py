"""Round-11 advisory fixes (ADVICE.md r10):

1. ``kcore`` raises instead of returning a non-converged (invariant-
   violating) subgraph when ``max_iterations`` is exhausted.
2. ``persist_generation`` is thread-safe — concurrent same-slot calls
   leave exactly ONE live persisted generation (no orphaned
   InMemoryRelation).
3. ``df_capped_postings``' identical-call memo is scoped to a
   caller-supplied ``data_epoch`` and clearable via
   ``invalidate_cap_memo`` (the sameResult fast path assumes immutable
   inputs; mutable sources need the epoch).
4. ``apportion_largest_remainder`` raises when ``total_n > 0`` but no
   stratum has positive weight (the budget must never silently vanish).
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import dedup as dd
from bullet_spark_spark.operators import graph as gr
from bullet_spark_spark.operators import sampling as smp
from bullet_spark_spark.operators import _cache


# ---------------------------------------------------------------------------
# 1. kcore non-convergence
# ---------------------------------------------------------------------------

def _path_edges(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )


def test_kcore_raises_when_iterations_exhausted(spark):
    # A 12-node path peels 2 edges/round under k=2 -> needs ~7 rounds;
    # max_iterations=3 must RAISE, not return endpoints of degree 1.
    df = _path_edges(spark, 12)
    with pytest.raises(RuntimeError, match="fixpoint"):
        gr.kcore(df, k=2, max_iterations=3)


def test_kcore_path_converges_to_empty_core(spark):
    # Same path with enough budget: the 2-core of a path is empty, and
    # the peeled-to-empty fixpoint counts as CONVERGED (no raise).
    df = _path_edges(spark, 12)
    assert gr.kcore(df, k=2, max_iterations=10).collect() == []


# ---------------------------------------------------------------------------
# 2. persist_generation thread safety
# ---------------------------------------------------------------------------

def test_persist_generation_concurrent_single_survivor(spark):
    slot = "__test_r11_threadsafety__"
    n_threads, n_iters = 8, 6
    frames = [
        spark.range(100 + t * n_iters + i).select(
            (F.col("id") * (t * n_iters + i + 2)).alias("v")
        )
        for t in range(n_threads)
        for i in range(n_iters)
    ]
    barrier = threading.Barrier(n_threads)
    errors: list[Exception] = []

    def worker(t):
        try:
            barrier.wait(timeout=30)
            for i in range(n_iters):
                _cache.persist_generation(slot, frames[t * n_iters + i])
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=60)
    assert not errors
    jvm_none = spark._jvm.org.apache.spark.storage.StorageLevel.NONE()
    live = [f for f in frames if not f._jdf.storageLevel().equals(jvm_none)]
    # exactly the registry's single live generation remains persisted —
    # any extra entry is an orphaned InMemoryRelation (the leak the lock
    # prevents)
    assert len(live) == 1
    assert _cache._live[slot] == live
    _cache.persist_generation(slot, spark.range(1))  # release
    _cache._live.pop(slot, None)


# ---------------------------------------------------------------------------
# 3. cap-memo epoch scoping
# ---------------------------------------------------------------------------

def _postings(spark):
    rows = [("d%d" % i, "hot") for i in range(5)] + [
        ("d0", "rare"),
        ("d1", "cold"),
    ]
    return spark.createDataFrame(rows, "doc_id string, gram string")


def test_cap_memo_respects_data_epoch_and_invalidate(spark):
    dd.invalidate_cap_memo()
    p = _postings(spark)
    out1 = dd.df_capped_postings(p, max_df=3, data_epoch="v1")
    assert {r["gram"] for r in out1.collect()} == {"rare", "cold"}
    drop_v1 = dd._cap_memo["gram"][3]

    # same plan + same epoch -> memo HIT (drop frame object reused)
    dd.df_capped_postings(p, max_df=3, data_epoch="v1")
    assert dd._cap_memo["gram"][3] is drop_v1

    # same plan, DIFFERENT data epoch -> recompute (fresh drop frame)
    dd.df_capped_postings(p, max_df=3, data_epoch="v2")
    assert dd._cap_memo["gram"][3] is not drop_v1
    assert dd._cap_memo["gram"][4] == (dd._cap_memo_epoch, "v2")

    # invalidate releases every pinned reference and bumps the epoch
    epoch_before = dd._cap_memo_epoch
    dd.invalidate_cap_memo()
    assert dd._cap_memo == {}
    assert dd._cap_memo_epoch == epoch_before + 1


# ---------------------------------------------------------------------------
# 4. apportionment empty-base guard
# ---------------------------------------------------------------------------

def test_apportion_raises_on_all_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [("a", 0.0), ("b", -1.0), ("c", None)], "g string, w double"
    )
    with pytest.raises(ValueError, match="positive"):
        smp.apportion_largest_remainder(df, ["g"], "w", 10)
    # total_n == 0 with an empty base is a legitimate no-op, not an error
    assert smp.apportion_largest_remainder(df, ["g"], "w", 0).collect() == []
