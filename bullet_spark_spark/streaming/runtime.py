"""Engine runtime: query registry + lifecycle on Structured Streaming.

The reference multiplexes every live query over each record inside one static
DStream DAG (queries-as-data: FilterStreaming.scala:38-71 collects and
re-broadcasts the query list every batch; JoinStreaming.scala:34-58 merges
partial state per query id). Here each registered query IS a Catalyst plan
running as its own StreamingQuery over a shared source (SURVEY §7.0
queries-as-plans inversion), and this runtime recreates bullet's lifecycle
semantics around those handles:

- duration expiry  → COMPLETE + stop           (ref isTimedOut,
  QueryDataUnioning.scala:71)
- RAW limit done   → COMPLETE + stop           (ref querier.isDone,
  JoinStreaming.scala:142-146; JoinStreamingTest.scala:55-67)
- kill signal      → KILLED + stop             (ref Metadata.Signal.KILL,
  JoinStreaming.scala:144-158)
- rate limit       → FAIL + stop               (ref RateLimitError,
  FilterStreaming.scala:129-133, JoinStreaming.scala:152-159)
- status feedback  → status log entries        (ref feedback publisher,
  ResultPublisher.scala:35-45)

Unlike the reference, finished queries leave NO state behind (the reference
tombstones them forever — JoinStreaming.scala:60-62; SURVEY §7.3 flags this
as a leak we must not copy).

Scale posture: N queries = N concurrent StreamingQuery handles sharing the
scheduler; the state store is per-query and keyed by its own group-by keys,
so state volume is output-cardinality, not input-cardinality. A
broadcast-predicate multiplexer (single pass for very high query counts) is
the documented follow-up, per the Structured Streaming SIGMOD'18 design.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bullet_spark_spark.plans.spec import (
    DistributionAgg,
    GroupAgg,
    Query,
    RawAgg,
    TopKAgg,
    WindowUnit,
)
from bullet_spark_spark.plans.compiler import compile_query
from bullet_spark_spark.streaming.sinks import MemorySink


class QueryState(str, Enum):
    RUNNING = "RUNNING"
    COMPLETED = "COMPLETED"
    KILLED = "KILLED"
    FAILED = "FAILED"


class Signal(str, Enum):
    """Lifecycle signals (ref Metadata.Signal, BulletSparkUtils.scala:32-34)."""

    COMPLETE = "COMPLETE"
    KILL = "KILL"
    FAIL = "FAIL"


@dataclass
class RateLimit:
    """Max emissions per interval (ref bullet.query.rate.limit.*,
    FilterStreamingTest.scala:278-280)."""

    max_emits: int
    interval_ms: int


@dataclass
class QueryHandle:
    query_id: str
    spec: Query
    sink: MemorySink
    state: QueryState = QueryState.RUNNING
    stream: Any = None  # StreamingQuery
    shared_stream: bool = False  # multiplexed: stream serves other queries too
    started_at: float = field(default_factory=time.time)
    emit_times: list[float] = field(default_factory=list)
    raw_rows_seen: int = 0
    error: str | None = None
    _dead_sweeps: int = 0  # consecutive sweeps observing a dead stream

    def is_active(self) -> bool:
        return self.state is QueryState.RUNNING

    def final_result(self) -> list[tuple]:
        """Final result at query end — bullet's one-shot window (W1: default
        `new Window()` emits only on completion, ref
        QueryDataUnioningTest.scala:93).

        Update-mode group aggregations emit only the *changed* groups each
        micro-batch, so the final result merges across all emissions keyed by
        the group columns (latest emission wins per group). Other modes
        (append/complete) return the last non-empty emission."""
        agg = self.spec.aggregation
        if isinstance(agg, GroupAgg) and _output_mode(self.spec) == "update":
            if self.shared_stream:
                # multiplexed rows are (keys_dict, *aggs) — one key column
                key_len = 1 if agg.fields else 0
            else:
                w = self.spec.window
                windowed = (
                    w.emit_unit is WindowUnit.TIME and w.event_time_field is not None
                )
                key_len = (1 if windowed else 0) + len(agg.fields)
            merged: dict[tuple, tuple] = {}
            for batch in self.sink.batches:
                for row in batch:
                    merged[tuple(str(x) for x in row[:key_len])] = row
            if key_len:
                return [merged[k] for k in sorted(merged)]
            return list(merged.values())
        for batch in reversed(self.sink.batches):
            if batch:
                return batch
        return []


def _output_mode(spec: Query) -> str:
    """Emission-window → Structured Streaming output mode (SURVEY §2.4):
    RAW → append; additive (include=ALL) → complete; TOP K / DISTRIBUTION →
    complete (their sort/limit/explode shapes need the full result each
    trigger); other aggregations → update (changed groups ≈ window close)."""
    agg = spec.aggregation
    if isinstance(agg, RawAgg):
        return "append"
    if isinstance(agg, (TopKAgg, DistributionAgg)):
        return "complete"
    if spec.window.include is WindowUnit.ALL:
        return "complete"
    return "update"


class EngineRuntime:
    """Query registry + lifecycle supervisor (the engine's control plane)."""

    def __init__(
        self, spark: SparkSession, sweep_interval_s: float | None = None,
        config: "EngineConfig | None" = None,
    ) -> None:
        from bullet_spark_spark.config import EngineConfig

        self.spark = spark
        self.config = config or EngineConfig()
        self.queries: dict[str, QueryHandle] = {}
        self.status_log: list[tuple[str, Signal, float]] = []
        self._lock = threading.Lock()
        self._sweep_interval_s = sweep_interval_s or self.config.sweep_interval_s
        self._sweeper: threading.Thread | None = None
        self._stop_sweeper = threading.Event()

    # -- registration -------------------------------------------------------

    def register(
        self,
        spec: Query,
        stream_df: DataFrame,
        query_id: str | None = None,
        rate_limit: RateLimit | None = None,
        trigger_ms: int | None = None,
        checkpoint_dir: str | None = None,
    ) -> QueryHandle:
        """Compile the spec against an unbounded DataFrame and launch it.

        Output mode follows the window spec (SURVEY §2.4): group aggregations
        run in ``update`` mode (per-trigger emission of changed groups ≈
        bullet window close), ``complete`` for additive include=ALL windows;
        RAW runs in ``append`` with the limit enforced by the runtime (limit
        is not a streaming-supported plan node)."""
        qid = query_id or uuid.uuid4().hex[:12]
        trigger_ms = trigger_ms or self.config.trigger_ms
        with self._lock:
            existing = self.queries.get(qid)
            if existing is not None and existing.is_active():
                # duplicate registration is ignored, returning the live handle
                # (ref query dedup in the union state, QueryDataUnioning.scala:60-83)
                return existing
            n_active = sum(1 for h in self.queries.values() if h.is_active())
            if n_active >= self.config.max_concurrent_queries:
                raise RuntimeError(
                    f"max_concurrent_queries ({self.config.max_concurrent_queries}) reached"
                )
        if rate_limit is None and self.config.rate_limit_enable:
            rate_limit = RateLimit(
                self.config.rate_limit_max_emits, self.config.rate_limit_interval_ms
            )
        if checkpoint_dir is None and self.config.checkpoint_root:
            checkpoint_dir = f"{self.config.checkpoint_root}/{qid}"
        # processing-time TIME window (no event-time field) = emit cadence →
        # becomes the micro-batch trigger interval (ref batch-duration-driven
        # window close, JoinStreaming.scala:118-122)
        w = spec.window
        if (
            w.emit_unit is WindowUnit.TIME
            and w.event_time_field is None
            and w.emit_every
        ):
            trigger_ms = w.emit_every
        sink = MemorySink()
        handle = QueryHandle(query_id=qid, spec=spec, sink=sink)

        # streaming CDF: the cumulative window step is not a streaming plan
        # node — run the PMF in complete mode and accumulate in the sink
        cdf_post = False
        compile_spec = spec
        if (
            isinstance(spec.aggregation, DistributionAgg)
            and spec.aggregation.type.value == "CDF"
        ):
            from dataclasses import replace as _replace
            from bullet_spark_spark.plans.spec import DistributionType

            cdf_post = True
            compile_spec = _replace(
                spec, aggregation=_replace(spec.aggregation, type=DistributionType.PMF)
            )

        df = compile_query(self.spark, compile_spec, df=stream_df, streaming=True)
        mode = _output_mode(spec)
        raw_limit = spec.aggregation.limit if isinstance(spec.aggregation, RawAgg) else None

        def emit(batch_df, epoch_id):  # runs on the stream-execution thread
            if handle.state is not QueryState.RUNNING:
                return
            if raw_limit is not None:
                remaining = raw_limit - handle.raw_rows_seen
                if remaining <= 0:
                    return
                batch_df = batch_df.limit(remaining)
            rows_before = len(sink.rows)
            if cdf_post:
                # PMF (complete) → cumulative counts, tiny driver-side pass
                pmf = sorted((r["bucket"], r["count"]) for r in batch_df.collect())
                total = 0
                out = []
                for bucket, cnt in pmf:
                    total += cnt
                    out.append((bucket, total))
                with sink._lock:
                    if sink.columns is None:
                        sink.columns = ["bucket", "cum_count"]
                    sink.batches.append(out)
            else:
                sink(batch_df, epoch_id)
            emitted = len(sink.rows) - rows_before
            now = time.time()
            if emitted > 0:
                handle.emit_times.append(now)
            if raw_limit is not None:
                handle.raw_rows_seen += emitted
            if rate_limit is not None and emitted > 0:
                window_start = now - rate_limit.interval_ms / 1000.0
                recent = sum(1 for t in handle.emit_times if t >= window_start)
                if recent > rate_limit.max_emits:
                    handle.error = (
                        f"rate limit exceeded: {recent} emits in "
                        f"{rate_limit.interval_ms}ms (max {rate_limit.max_emits})"
                    )

        writer = df.writeStream.outputMode(mode).foreachBatch(emit)
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        writer = writer.trigger(processingTime=f"{trigger_ms} milliseconds")
        handle.stream = writer.start()

        with self._lock:
            self.queries[qid] = handle
        self._ensure_sweeper()
        return handle

    def run_available(
        self,
        spec: Query,
        stream_df: DataFrame,
        query_id: str | None = None,
        checkpoint_dir: str | None = None,
        timeout_s: float = 120,
    ) -> QueryHandle:
        """Drain-everything-then-stop variant (Trigger.AvailableNow): used for
        deterministic tests and bounded backfills."""
        qid = query_id or uuid.uuid4().hex[:12]
        sink = MemorySink()
        handle = QueryHandle(query_id=qid, spec=spec, sink=sink)
        df = compile_query(self.spark, spec, df=stream_df, streaming=True)
        writer = df.writeStream.outputMode(_output_mode(spec)).foreachBatch(sink)
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        handle.stream = writer.trigger(availableNow=True).start()
        handle.stream.awaitTermination(timeout_s)
        handle.state = QueryState.COMPLETED
        self._log(qid, Signal.COMPLETE)
        with self._lock:
            self.queries[qid] = handle
        return handle

    def register_multiplexed(
        self,
        specs: dict[str, Query],
        stream_df: DataFrame,
        trigger_ms: int | None = None,
        checkpoint_dir: str | None = None,
        available_now: bool = False,
        timeout_s: float = 120,
    ) -> dict[str, QueryHandle]:
        """Run N (filter + GROUP BY count) queries as ONE streaming stage —
        the reference's FilterStreaming multiplexing (FilterStreaming.scala:
        54-67) without the per-batch driver re-broadcast: predicates are baked
        into a single plan (operators.multiplex), the shared aggregation is
        keyed by (query_id, group keys), and the sink routes each micro-batch
        row to its query's handle.

        Use when query cardinality is high enough that plan-per-query's N
        source subscriptions dominate. Trade-off (documented; bullet has the
        same): the query set is fixed per multiplexer incarnation — register/
        expire requires restarting the one stage (checkpointed state is keyed
        by query_id, so a restart with overlapping specs resumes cleanly).
        Lifecycle (duration expiry, kill) is enforced sink-side: expired
        queries stop receiving results immediately and are marked terminal."""
        from bullet_spark_spark.operators.multiplex import multiplex_group_agg

        trigger_ms = trigger_ms or self.config.trigger_ms
        handles: dict[str, QueryHandle] = {}
        for qid, spec in specs.items():
            if not isinstance(spec.aggregation, GroupAgg):
                raise ValueError(
                    f"{qid}: multiplexed queries support GroupAgg (got "
                    f"{type(spec.aggregation).__name__}) — use register() for others"
                )
            handles[qid] = QueryHandle(
                query_id=qid, spec=spec, sink=MemorySink(), shared_stream=True
            )

        routed = multiplex_group_agg(
            stream_df, {qid: (s.filter, s.aggregation) for qid, s in specs.items()}
        )

        # per-query output projection from the shared aggs map: the op list
        # the spec asked for, or a bare count when it declared none
        out_plan: dict[str, list[tuple[str, str]]] = {}
        for qid, spec in specs.items():
            ops = spec.aggregation.operations
            if ops:
                out_plan[qid] = [(f"{op.value.lower()}_{fld or ''}", out) for op, fld, out in ops]
            else:
                out_plan[qid] = [("count_", "cnt")]

        def emit(batch_df, epoch_id):
            rows = batch_df.collect()
            by_qid: dict[str, list] = {}
            for r in rows:
                by_qid.setdefault(r["query_id"], []).append(r)
            now = time.time()
            for qid, handle in handles.items():
                if handle.state is not QueryState.RUNNING:
                    continue  # sink-side lifecycle: expired/killed get nothing
                cols = out_plan[qid]
                batch_rows = [
                    (dict(r["keys"] or {}), *[r["aggs"][name] for name, _ in cols])
                    for r in by_qid.get(qid, [])
                ]
                if batch_rows:
                    with handle.sink._lock:
                        if handle.sink.columns is None:
                            handle.sink.columns = ["keys", *[out for _, out in cols]]
                        handle.sink.batches.append(batch_rows)
                    handle.emit_times.append(now)

        writer = routed.writeStream.outputMode("update").foreachBatch(emit)
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if available_now:
            stream = writer.trigger(availableNow=True).start()
            stream.awaitTermination(timeout_s)
            for handle in handles.values():
                handle.stream = stream
                if handle.state is QueryState.RUNNING:
                    handle.state = QueryState.COMPLETED
                    self._log(handle.query_id, Signal.COMPLETE)
        else:
            stream = writer.trigger(processingTime=f"{trigger_ms} milliseconds").start()
            for handle in handles.values():
                handle.stream = stream

        with self._lock:
            self.queries.update(handles)
        if not available_now:
            self._ensure_sweeper()
        return handles

    # -- lifecycle ----------------------------------------------------------

    def kill(self, query_id: str) -> None:
        """External KILL signal (ref JoinStreaming.scala:144-158)."""
        handle = self.queries[query_id]
        if handle.is_active():
            self._finish(handle, QueryState.KILLED, Signal.KILL)

    def stop_all(self) -> None:
        for h in list(self.queries.values()):
            if h.is_active():
                self._finish(h, QueryState.KILLED, Signal.KILL)
        self._stop_sweeper.set()

    def active(self) -> list[QueryHandle]:
        return [h for h in self.queries.values() if h.is_active()]

    def metrics(self) -> dict[str, int]:
        """Engine counters (ref BulletSparkMetrics accumulators,
        BulletSparkMetrics.scala:14-103): received/running/done/killed/failed
        plus total emissions."""
        states = [h.state for h in self.queries.values()]
        return {
            "queries_received": len(states),
            "queries_running": sum(s is QueryState.RUNNING for s in states),
            "queries_done": sum(s is QueryState.COMPLETED for s in states),
            "queries_killed": sum(s is QueryState.KILLED for s in states),
            "queries_failed": sum(s is QueryState.FAILED for s in states),
            "emissions": sum(h.sink.num_emissions for h in self.queries.values()),
        }

    # -- internals ----------------------------------------------------------

    def _ensure_sweeper(self) -> None:
        if self._sweeper is None or not self._sweeper.is_alive():
            self._stop_sweeper.clear()
            self._sweeper = threading.Thread(target=self._sweep_loop, daemon=True)
            self._sweeper.start()

    def _sweep_loop(self) -> None:
        """Registry sweep: duration expiry, RAW-limit completion, rate-limit
        failure (the reference's per-batch lifecycle checks,
        QueryDataUnioning.scala:60-83 + JoinStreaming.scala:139-161)."""
        while not self._stop_sweeper.is_set():
            for h in list(self.queries.values()):
                if not h.is_active():
                    continue
                if h.error is not None:
                    self._finish(h, QueryState.FAILED, Signal.FAIL)
                    continue
                # stream died underneath us (source error / natural drain):
                # reconcile handle state instead of leaving it RUNNING —
                # the reference's ErrorData path (BulletSparkUtils.scala:38-44)
                try:
                    stream_dead = h.stream is not None and not h.stream.isActive
                except Exception:
                    stream_dead = True
                h._dead_sweeps = h._dead_sweeps + 1 if stream_dead else 0
                if h._dead_sweeps >= 2:  # debounce startup races
                    exc = None
                    try:
                        exc = h.stream.exception()
                    except Exception:
                        pass
                    if exc is not None:
                        h.error = str(exc)[:500]
                        self._finish(h, QueryState.FAILED, Signal.FAIL)
                    else:
                        self._finish(h, QueryState.COMPLETED, Signal.COMPLETE)
                    continue
                spec = h.spec
                if (
                    isinstance(spec.aggregation, RawAgg)
                    and h.raw_rows_seen >= spec.aggregation.limit
                ):
                    self._finish(h, QueryState.COMPLETED, Signal.COMPLETE)
                    continue
                if (
                    spec.duration_ms is not None
                    and (time.time() - h.started_at) * 1000 >= spec.duration_ms
                ):
                    self._finish(h, QueryState.COMPLETED, Signal.COMPLETE)
            if not any(h.is_active() for h in self.queries.values()):
                break
            self._stop_sweeper.wait(self._sweep_interval_s)

    def _finish(self, handle: QueryHandle, state: QueryState, signal: Signal) -> None:
        # log before state flips/stop: observers that see the query inactive
        # must also see its terminal signal (stop() can block for a batch)
        self._log(handle.query_id, signal)
        handle.state = state
        if handle.shared_stream:
            # multiplexed: the stream serves other queries — lifecycle is
            # sink-side (this handle stops receiving results); the shared
            # stage stops when its last query finishes
            if any(
                h.is_active() and h.stream is handle.stream
                for h in self.queries.values()
            ):
                return
        try:
            if handle.stream is not None and handle.stream.isActive:
                handle.stream.stop()
        except Exception:  # stream may already be terminating
            pass

    def _log(self, query_id: str, signal: Signal) -> None:
        with self._lock:
            self.status_log.append((query_id, signal, time.time()))
