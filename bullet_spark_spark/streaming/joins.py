"""Stream-stream joins and streaming deduplication — the two built-in
stateful Structured Streaming capabilities the engine exposes as
first-class recipes beside the custom monitors.

The reference's only join is the keyed partial-aggregate merge
(JoinStreaming.scala:20-27 — combining partials of ONE query, not joining
two record streams); true stream × stream record joins and cross-batch
record dedup are capabilities the Spark runtime adds. What this module
contributes is the STATE-BOUNDING discipline: an un-watermarked
stream-stream join or dropDuplicates buffers every row forever, so both
recipes here take explicit event-time horizons and compile them into the
watermark + range-condition form Spark's state eviction actually honors
(the documented requirement for state cleanup in stream-stream joins).

Both are FULL-DRAIN deterministic (inner join = a set intersection of
matches; dedup keeps one row per key), so their drained output equals the
batch equivalent — which makes them oracle-checkable end-to-end, the
streaming_static_enrich_parity precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    max_lag_sec: float,
    watermark_sec: float | None = None,
) -> DataFrame:
    """Watermarked stream × stream INNER equi-join: rows match when their
    keys are equal AND the right event lands within ``[-max_lag_sec,
    +max_lag_sec]`` of the left event — the correlation join (click ×
    purchase, request × response, impression × conversion) that a
    training-data pipeline runs on live event streams.

    The range condition is not decoration: Spark evicts join state ONLY
    when a watermark plus an event-time bound proves a buffered row can
    never match again. Both sides get ``withWatermark(watermark_sec)``
    (default: ``2·max_lag_sec``) and the join condition carries the
    explicit time-range conjunct, so per-side state is bounded by
    rate × (watermark + lag) instead of the whole stream. At 100 TB/day
    that is the difference between a join and an OOM.

    Pick ``watermark_sec`` ≥ the stream's real out-of-orderness, not just
    2·lag: rows older than the advanced watermark are EVICTED AS LATE by
    design (correct semantics — a replayed/backfilled source needs the
    horizon widened, which costs exactly that much more state)."""
    wm = float(watermark_sec if watermark_sec is not None else 2 * max_lag_sec)
    l = left.withWatermark(left_ts, f"{wm} seconds")
    r = right.withWatermark(right_ts, f"{wm} seconds")
    lag = float(max_lag_sec)
    cond = None
    for k in key_cols:
        c = l[k] == r[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {lag} SECONDS"))
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {lag} SECONDS"))
    )
    # drop the right side's duplicate key columns from the output surface
    out = l.join(r, cond, "inner")
    for k in key_cols:
        out = out.drop(r[k])
    return out


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark_sec: float | None = None,
) -> DataFrame:
    """Streaming EXACT deduplication: keep the first arrival per key
    across micro-batches — the ingest-side twin of the batch
    ``dedup.exact`` family (drop replayed/duplicate events BEFORE they
    land, instead of in the next day's batch dedup pass).

    With ``ts_col`` + ``watermark_sec``, uses
    ``dropDuplicatesWithinWatermark`` so the key store EVICTS once the
    watermark passes a key's event time — bounded state, the only shape
    that survives an unbounded stream (duplicates in real pipelines are
    retries/replays that arrive close together, so a horizon of minutes
    covers them). Without a watermark, falls back to plain
    ``dropDuplicates`` — exact forever, state grows with distinct keys
    (fixture/test scale only; the docstring IS the warning)."""
    if ts_col is not None and watermark_sec is not None:
        return df.withWatermark(
            ts_col, f"{float(watermark_sec)} seconds"
        ).dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)
