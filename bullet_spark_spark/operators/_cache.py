"""Per-call-site persist registry for analytical operators.

Several operators persist intermediate frames that the RETURNED (lazy)
frame still references — unpersisting before the caller's action would
force each consuming branch to recompute the shared intermediate, so the
caches must outlive the call. But a long-lived session calling the same
operator in a loop then accumulates one orphaned InMemoryRelation per
call until LRU eviction pressure (ADVICE r9): mapInPandas/expression-id
churn means the CacheManager can never dedupe them.

:func:`persist_generation` bounds that to ONE live generation per call
site: registering a new generation unpersists the previous one. A frame
returned by an EARLIER call that is re-executed afterwards simply
recomputes through its lineage — slower, never wrong (the
dedup._persist_sigs contract).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_live: dict[str, list[DataFrame]] = {}
# One global lock: the read-unpersist-persist-update sequence below is not
# atomic, and two concurrent calls on the same slot (a long-lived
# multi-threaded driver server) would otherwise both read `prev`, both
# persist, and the loser's generation would stay persisted forever with no
# registry reference — the exact orphan leak this module exists to bound.
# persist()/unpersist() only mark plans (no job runs under the lock), so a
# single module-level lock costs microseconds, not serialization of work.
_lock = threading.Lock()


def same_plan(old: DataFrame, new: DataFrame) -> bool:
    """True when the two frames compute the same result (analyzed-plan
    ``sameResult``) — cache-state-independent."""
    try:
        return old._jdf.queryExecution().analyzed().sameResult(
            new._jdf.queryExecution().analyzed()
        )
    except Exception:
        return False


def _same_cached(old: DataFrame, new: DataFrame) -> bool:
    """True when ``old`` is still materialized in the cache AND computes
    the same result as ``new`` (analyzed-plan equality via sameResult)."""
    try:
        jdf_old = old._jdf
        if jdf_old.storageLevel().equals(
            old.sparkSession._jvm.org.apache.spark.storage.StorageLevel.NONE()
        ):
            return False
        return jdf_old.queryExecution().analyzed().sameResult(
            new._jdf.queryExecution().analyzed()
        )
    except Exception:
        return False


def persist_generation(
    slot: str, *frames: DataFrame, storage_level=None
) -> tuple[DataFrame, ...]:
    """Persist ``frames`` as the current generation of call site ``slot``,
    releasing the previous generation. Returns the persisted frames in
    order (PySpark's ``persist`` marks the plan in place, so downstream
    frames already built from these objects hit the cache too — the
    CacheManager matches by analyzed plan, not object identity).

    IDENTICAL-CALL fast path: when every new frame computes the same
    result as its still-cached predecessor (sameResult on the analyzed
    plans), the PREVIOUS generation is returned untouched — a server
    re-running the same query hits the warm cache instead of
    re-materializing it, exactly as the pre-registry inline persists
    did via CacheManager plan matching (measured: the triangle/AA panel
    repeated-call medians tripled without this)."""
    with _lock:
        prev = _live.get(slot)
        if (
            prev is not None
            and len(prev) == len(frames)
            and all(_same_cached(o, n) for o, n in zip(prev, frames))
        ):
            return tuple(prev)
        if prev is not None:
            for old in prev:
                try:
                    old.unpersist()
                except Exception:
                    pass  # session torn down; nothing to release
        out = [
            f.persist(storage_level)
            if storage_level is not None
            else f.persist()
            for f in frames
        ]
        _live[slot] = out
        return tuple(out)
