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

from pyspark.sql import DataFrame

_live: dict[str, list[DataFrame]] = {}


def persist_generation(
    slot: str, *frames: DataFrame, storage_level=None
) -> tuple[DataFrame, ...]:
    """Persist ``frames`` as the current generation of call site ``slot``,
    releasing the previous generation. Returns the persisted frames in
    order (PySpark's ``persist`` marks the plan in place, so downstream
    frames already built from these objects hit the cache too — the
    CacheManager matches by analyzed plan, not object identity)."""
    for old in _live.get(slot, []):
        try:
            old.unpersist()
        except Exception:
            pass  # session torn down; nothing to release
    out = [
        f.persist(storage_level) if storage_level is not None else f.persist()
        for f in frames
    ]
    _live[slot] = out
    return tuple(out)
