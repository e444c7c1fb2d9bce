"""Dynamic multiplexer: the reference's queries-as-data mode, re-expressed.

bullet-spark re-collects and re-broadcasts the live query list every batch
and runs each query's partition-local Querier over the records
(FilterStreaming.scala:46-67), merging partials keyed by query id
(JoinStreaming.scala:34-58). The Structured Streaming equivalent: inside
``foreachBatch`` each micro-batch is a *batch* DataFrame, so the CURRENT
registry's specs compile and run against it directly — add/remove queries
between batches with no stage restart. Partial results merge into per-query
driver state (counts/sums/mins/maxs are trivially mergeable, exactly the
partial-aggregation contract the reference's byte blobs carried).

Trade-offs vs the other two modes (all three are supported — SURVEY §7.0):
- plan-per-query (EngineRuntime.register): maximal Catalyst specialization,
  isolated lifecycle; N source subscriptions.
- static multiplexer (register_multiplexed): one scan, one shuffle for all
  queries; query set fixed per incarnation.
- dynamic multiplexer (this): one scan, per-batch spec evaluation, fully
  dynamic registry; per-batch plan compilation cost (~ms) and driver-side
  final merge (fine for bullet-sized bounded results, which is the
  reference's own constraint — results return through a message bus).
  ALL live queries run as ONE conditional-aggregation job per batch:
  filters compile into when(pred, ...) guards and the distinct group-by
  field sets become GROUPING SETS of a single aggregation (grouping_id()
  routes output rows back to their queries) — one scan + one shuffle per
  batch regardless of query or field-set count.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bullet_spark_spark.functions.exprs import Expr
from bullet_spark_spark.plans.spec import AggOp, GroupAgg, Query
from bullet_spark_spark.streaming.runtime import QueryState, RateLimit, Signal

_MERGEABLE = {
    AggOp.COUNT: lambda a, b: a + b,
    AggOp.COUNT_FIELD: lambda a, b: a + b,
    AggOp.SUM: lambda a, b: a + b,
    AggOp.MIN: min,
    AggOp.MAX: max,
}


@dataclass
class DynamicHandle:
    query_id: str
    spec: Query
    state: QueryState = QueryState.RUNNING
    # group-key tuple -> [op outputs] (merged partials across batches)
    groups: dict[tuple, list] = field(default_factory=dict)
    started_at: float = field(default_factory=time.time)
    rate_limit: RateLimit | None = None
    emit_times: list[float] = field(default_factory=list)
    error: str | None = None

    def result(self) -> list[tuple]:
        """Current merged result rows: key columns + agg outputs."""
        return [(*k, *v) for k, v in sorted(self.groups.items(), key=lambda kv: str(kv[0]))]


class DynamicMultiplexer:
    """Per-batch query evaluation over one shared stream (add/remove live)."""

    def __init__(
        self, spark: SparkSession, rate_limit: RateLimit | None = None
    ) -> None:
        self.spark = spark
        self.queries: dict[str, DynamicHandle] = {}
        self.status_log: list[tuple[str, Signal, float]] = []
        self.rate_limit = rate_limit  # default for every registered query
        self._lock = threading.Lock()
        self._stream: Any = None

    def register(
        self, query_id: str, spec: Query, rate_limit: RateLimit | None = None
    ) -> DynamicHandle:
        agg = spec.aggregation
        if not isinstance(agg, GroupAgg):
            raise ValueError("dynamic multiplexer supports GroupAgg specs")
        for op, _, _ in agg.operations or [(AggOp.COUNT, None, "count")]:
            if op not in _MERGEABLE:
                raise ValueError(f"{op} is not mergeable across batches")
        handle = DynamicHandle(
            query_id=query_id, spec=spec, rate_limit=rate_limit or self.rate_limit
        )
        with self._lock:
            if query_id in self.queries and self.queries[query_id].state is QueryState.RUNNING:
                return self.queries[query_id]  # dedup, as in the union state
            self.queries[query_id] = handle
        return handle

    def kill(self, query_id: str) -> None:
        with self._lock:
            h = self.queries[query_id]
            if h.state is QueryState.RUNNING:
                h.state = QueryState.KILLED
                self.status_log.append((query_id, Signal.KILL, time.time()))

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """The FilterStreaming.transformWith analogue: snapshot the registry,
        run every live spec against this micro-batch, merge partials.

        ALL live queries run as ONE aggregation job per micro-batch: each
        query's filter becomes a ``when(pred, ...)`` guard inside its
        aggregate expressions, and the distinct group-by field sets become
        GROUPING SETS of one shared aggregation — one scan, one shuffle per
        batch regardless of query count or field-set count, with group keys
        keeping their native types. ``grouping_id()`` routes each output row
        to exactly the queries of its field set. This is the
        Spark-expression form of the reference's 'one pass over the records
        for all queries' (FilterStreaming.scala:54-67)."""
        with self._lock:
            live = [
                (h, h.spec)
                for h in self.queries.values()
                if h.state is QueryState.RUNNING
            ]
        if not live:
            return
        by_fields: dict[tuple[str, ...], list[tuple[DynamicHandle, Query]]] = {}
        for handle, spec in live:
            # key by MEMBERSHIP (sorted), not declaration order: GROUP BY a,b
            # and GROUP BY b,a are the same grouping set, and emitting both
            # would return every group twice with the same grouping_id —
            # the merge loop would then double-count each matching query
            by_fields.setdefault(tuple(sorted(spec.aggregation.fields)), []).append(
                (handle, spec)
            )
        self._run_grouping_sets(batch_df, by_fields)
        now = time.time()
        with self._lock:
            for handle, spec in live:
                # duration expiry checked at batch boundaries (the
                # reference's clock is the batch too,
                # JoinStreaming.scala:118-122)
                if (
                    handle.state is QueryState.RUNNING
                    and spec.duration_ms is not None
                    and (now - handle.started_at) * 1000 >= spec.duration_ms
                ):
                    handle.state = QueryState.COMPLETED
                    self.status_log.append((handle.query_id, Signal.COMPLETE, now))

    def _run_grouping_sets(
        self,
        batch_df: DataFrame,
        by_fields: dict[tuple[str, ...], list[tuple["DynamicHandle", Query]]],
    ) -> None:
        """One aggregation job for EVERY live query across all field sets."""
        all_fields: list[str] = []
        for fields in by_fields:
            for f in fields:
                if f not in all_fields:
                    all_fields.append(f)
        n = len(all_fields)

        exprs = []
        # handle, ops, col offset, its field set, its grouping_id
        plans: list[tuple[DynamicHandle, list, int, tuple[str, ...], int]] = []
        offset = 0
        for fields, members in by_fields.items():
            # grouping_id bitmask: bit per groupBy column (groupBy order,
            # MSB first), 1 = aggregated away in this grouping set
            gid = sum(
                1 << (n - 1 - i) for i, c in enumerate(all_fields) if c not in fields
            )
            for handle, spec in members:
                agg: GroupAgg = spec.aggregation
                ops = list(agg.operations) or [(AggOp.COUNT, None, "count")]
                pred = spec.filter.col() if spec.filter is not None else F.lit(True)
                for i, (op, fld, _out) in enumerate(ops):
                    if op in (AggOp.COUNT, AggOp.COUNT_FIELD):
                        src = F.lit(1) if op is AggOp.COUNT else F.col(fld)
                        col = F.count(F.when(pred, src))
                    elif op is AggOp.SUM:
                        col = F.sum(F.when(pred, F.col(fld)))
                    elif op is AggOp.MIN:
                        col = F.min(F.when(pred, F.col(fld)))
                    else:  # MAX (register() rejects anything non-mergeable)
                        col = F.max(F.when(pred, F.col(fld)))
                    exprs.append(col.alias(f"c{offset + i}"))
                # explicit matched-row sentinel per query: inferring "the
                # filter matched" from the agg outputs drops groups whose
                # matched rows have only NULL agg inputs (COUNT_FIELD=0 /
                # MIN=NULL), which a plan-per-query run would emit
                exprs.append(
                    F.count(F.when(pred, F.lit(1))).alias(f"c{offset + len(ops)}")
                )
                # each query keeps ITS OWN declared field order for output
                # keys, independent of the canonical grouping-set key
                plans.append((handle, ops, offset, tuple(spec.aggregation.fields), gid))
                offset += len(ops) + 1

        if not all_fields:  # only the global field set is live
            rows = [(*r, 0) for r in batch_df.agg(*exprs).collect()]
        elif len(by_fields) == 1:
            # single field set: plain groupBy — GROUPING SETS would add an
            # Expand operator (and grouping_id computation) for no routing
            # benefit; measured ~30% faster on the control-plane bench
            only_gid = plans[0][4]
            rows = [
                (*r, only_gid)
                for r in batch_df.groupBy(*[F.col(c) for c in all_fields])
                .agg(*exprs)
                .collect()
            ]
        else:
            rows = (
                batch_df.groupingSets(
                    [list(fields) for fields in by_fields], *all_fields
                )
                .agg(*exprs, F.grouping_id().alias("__gid"))
                .collect()
            )

        field_pos = {c: i for i, c in enumerate(all_fields)}
        # merge under the registry lock: the control-plane publisher thread
        # snapshots handle.groups concurrently, and dict insertion during
        # its iteration would raise there
        with self._lock:
            matched: set[str] = set()
            for r in rows:
                raw = list(r)
                gid = raw[-1]
                for handle, ops, off, fields, fgid in plans:
                    if fgid != gid:
                        continue  # row belongs to another field set
                    vals = raw[n + off : n + off + len(ops)]
                    # sentinel: rows matched by this query's filter in this
                    # group/batch — zero means the group exists only because
                    # of OTHER queries in the shared job; skip to keep
                    # groups result-sized (bullet's bounded-result posture)
                    if raw[n + off + len(ops)] == 0:
                        continue
                    matched.add(handle.query_id)
                    key = tuple(raw[field_pos[c]] for c in fields)
                    cur = handle.groups.get(key)
                    if cur is None:
                        handle.groups[key] = vals
                    else:
                        # None-safe merge: a nullable agg field can yield a
                        # NULL partial for an existing group — never feed
                        # None into sum/min/max
                        handle.groups[key] = [
                            b if a is None else (a if b is None else _MERGEABLE[op](a, b))
                            for (op, _, _), a, b in zip(ops, cur, vals)
                        ]
            # per-query emit-rate guard, enforced in the shared stage too —
            # the reference checks in BOTH stages (FilterStreaming.scala:
            # 129-133, JoinStreaming.scala:152-159): a batch that updated a
            # query's state counts as one emission
            now = time.time()
            for handle, _ops, _off, _fields, _gid in plans:
                if (
                    handle.rate_limit is None
                    or handle.query_id not in matched
                    or handle.state is not QueryState.RUNNING
                ):
                    continue
                handle.emit_times.append(now)
                err = handle.rate_limit.check(handle.emit_times, now)
                if err is not None:
                    handle.error = err
                    handle.state = QueryState.FAILED
                    self.status_log.append((handle.query_id, Signal.FAIL, now))

    def start(
        self,
        stream_df: DataFrame,
        trigger_ms: int = 500,
        checkpoint_dir: str | None = None,
        available_now: bool = False,
        timeout_s: float = 120,
    ):
        writer = stream_df.writeStream.foreachBatch(self._process_batch)
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if available_now:
            self._stream = writer.trigger(availableNow=True).start()
            self._stream.awaitTermination(timeout_s)
            for h in self.queries.values():
                if h.state is QueryState.RUNNING:
                    h.state = QueryState.COMPLETED
                    self.status_log.append((h.query_id, Signal.COMPLETE, time.time()))
        else:
            self._stream = writer.trigger(processingTime=f"{trigger_ms} milliseconds").start()
        return self._stream

    def stop(self) -> None:
        if self._stream is not None and self._stream.isActive:
            self._stream.stop()
