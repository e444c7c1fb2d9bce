"""External control plane: query transport in, result/status transport out.

The reference's entire point of entry is a pluggable PubSub: queries arrive
over a bus while the job runs (``QueryReceiver.receive()`` loop on a
dedicated receiver thread, QueryReceiver.scala:21-68, buffer/commit :49-62)
and results + lifecycle feedback return through publishers
(``ResultPublisher.publish/publishFeedback``, ResultPublisher.scala:78-99;
feedback loop :35-45 re-publishes KILL/COMPLETE into the query channel so
all stages drop state).

This module recreates that contract Spark-side with an append-only
JSON-lines log as the bus (drop-in for a Kafka topic — messages are
line-delimited JSON in offset order; ``kafka_control_plane`` wires the same
handlers to a real Kafka consumer/producer where the connector jar exists):

- control topic  →  ``ControlPlane`` consumer thread: each message is either
  a query submission ``{"id": ..., "bql": "SELECT ..."}`` (parsed by
  plans.bql — the bullet-bql front door) and registered against the running
  stream, or a signal ``{"id": ..., "signal": "KILL"}``. Malformed messages
  produce ERROR status events, the reference's ErrorData path
  (BulletSparkUtils.scala:38-44, QueryDataUnioningTest.scala:40-51).
- status topic  ←  publisher thread: WINDOW events (incremental merged
  results — JoinStreaming's window-close emissions), RESULT (final rows at
  query end), SIGNAL (COMPLETE / KILL / FAIL), ERROR.

Queries run on the ``DynamicMultiplexer`` (streaming.dynamic): ONE shared
stream, specs evaluated per micro-batch, registry mutable mid-flight —
exactly bullet's forward-looking query semantics (a query sees only records
arriving after submission, SURVEY §0)."""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from bullet_spark_spark.plans.bql import BQLError, parse_bql
from bullet_spark_spark.streaming.dynamic import DynamicMultiplexer
from bullet_spark_spark.streaming.runtime import QueryState


@dataclass
class ControlPlane:
    """Consume a control log, drive a DynamicMultiplexer, publish status."""

    spark: SparkSession
    mux: DynamicMultiplexer
    control_dir: str
    status_path: str
    poll_interval_s: float = 0.2

    _stop: threading.Event = field(default_factory=threading.Event)
    _threads: list[threading.Thread] = field(default_factory=list)
    _consumed: set[str] = field(default_factory=set)  # file -> fully consumed
    _offsets: dict[str, int] = field(default_factory=dict)  # file -> lines read
    _published: dict[str, tuple] = field(default_factory=dict)  # qid -> last rows
    _terminal_published: set[str] = field(default_factory=set)
    _status_lock: threading.Lock = field(default_factory=threading.Lock)

    def start(self) -> None:
        os.makedirs(self.control_dir, exist_ok=True)
        os.makedirs(os.path.dirname(self.status_path) or ".", exist_ok=True)
        for target in (self._consume_loop, self._publish_loop):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)
        self._publish_once()  # flush terminal states

    # -- control consumption (the QueryReceiver loop) -----------------------

    def _consume_loop(self) -> None:
        while not self._stop.is_set():
            try:
                self._consume_once()
            except Exception as e:  # noqa: BLE001 — a dead consumer ignores all submissions
                try:
                    self._emit_status({"type": "ERROR", "error": f"consumer: {e}"})
                except Exception:
                    pass
            self._stop.wait(self.poll_interval_s)

    def _consume_once(self) -> None:
        try:
            files = sorted(
                f for f in os.listdir(self.control_dir) if f.endswith((".json", ".jsonl"))
            )
        except FileNotFoundError:
            return
        for fname in files:
            path = os.path.join(self.control_dir, fname)
            offset = self._offsets.get(path, 0)
            try:
                with open(path) as fh:
                    lines = fh.read().splitlines()
            except OSError:
                continue
            for line in lines[offset:]:
                if line.strip():
                    self._handle_message(line)
            self._offsets[path] = len(lines)

    def _handle_message(self, line: str) -> None:
        try:
            msg = json.loads(line)
            qid = msg["id"]
        except (json.JSONDecodeError, KeyError, TypeError) as e:
            self._emit_status({"type": "ERROR", "error": f"malformed message: {e}"})
            return
        if "signal" in msg:
            if msg["signal"] == "KILL":
                try:
                    self.mux.kill(qid)
                except KeyError:
                    self._emit_status(
                        {"query_id": qid, "type": "ERROR", "error": "unknown query"}
                    )
            return
        try:
            spec = parse_bql(msg["bql"])
            if msg.get("duration_ms"):
                from dataclasses import replace

                spec = replace(spec, duration_ms=int(msg["duration_ms"]))
            self.mux.register(qid, spec)
        except Exception as e:  # noqa: BLE001
            # the ErrorData path: ANY bad submission (parse error, wrong
            # types, unsupported spec) produces an ERROR status and the
            # stream keeps running (QueryDataUnioningTest.scala:40-51) —
            # a narrow except here once let a TypeError kill the consumer
            # thread silently
            self._emit_status({"query_id": qid, "type": "ERROR", "error": str(e)})

    # -- status publication (the ResultPublisher/feedback loop) -------------

    def _publish_loop(self) -> None:
        while not self._stop.is_set():
            try:
                self._publish_once()
            except Exception as e:  # noqa: BLE001 — a dying publisher is silent data loss
                try:
                    self._emit_status({"type": "ERROR", "error": f"publisher: {e}"})
                except Exception:
                    pass
            self._stop.wait(self.poll_interval_s)

    def _publish_once(self) -> None:
        for qid, handle in list(self.mux.queries.items()):
            # duration expiry enforced wall-clock here (sweeper role) — the
            # reference's expiry is batch-clock driven (JoinStreaming.scala:
            # 118-122) and so stalls when data stops; this does not.
            # State reads/writes and the groups snapshot happen under the
            # multiplexer lock: foreachBatch merges partials concurrently,
            # and iterating a dict the batch thread is inserting into
            # raises and would kill this publisher thread.
            with self.mux._lock:
                if (
                    handle.state is QueryState.RUNNING
                    and handle.spec.duration_ms is not None
                    and (time.time() - handle.started_at) * 1000 >= handle.spec.duration_ms
                ):
                    from bullet_spark_spark.streaming.runtime import Signal

                    handle.state = QueryState.COMPLETED
                    self.mux.status_log.append((qid, Signal.COMPLETE, time.time()))
                rows = handle.result()
            if handle.state is QueryState.RUNNING:
                if rows and self._published.get(qid) != tuple(map(tuple, rows)):
                    # incremental window emission (JoinStreaming.scala:148-151)
                    self._published[qid] = tuple(map(tuple, rows))
                    self._emit_status(
                        {"query_id": qid, "type": "WINDOW", "rows": rows}
                    )
            elif qid not in self._terminal_published:
                self._terminal_published.add(qid)
                self._emit_status({"query_id": qid, "type": "RESULT", "rows": rows})
                signal = {
                    QueryState.COMPLETED: "COMPLETE",
                    QueryState.KILLED: "KILL",
                    QueryState.FAILED: "FAIL",
                }[handle.state]
                self._emit_status(
                    {"query_id": qid, "type": "SIGNAL", "signal": signal}
                )

    def _emit_status(self, event: dict) -> None:
        event = {**event, "ts": time.time()}
        with self._status_lock:
            with open(self.status_path, "a") as fh:
                fh.write(json.dumps(event, default=str) + "\n")


def submit_query(
    control_dir: str, query_id: str, bql: str, duration_ms: int | None = None
) -> None:
    """Client-side submission helper: append a query message to the control
    log (what an external submitter does to the query topic)."""
    os.makedirs(control_dir, exist_ok=True)
    msg: dict = {"id": query_id, "bql": bql}
    if duration_ms is not None:
        msg["duration_ms"] = duration_ms
    _append(control_dir, msg)


def submit_kill(control_dir: str, query_id: str) -> None:
    """Client-side KILL signal (ref Metadata.Signal.KILL feedback,
    JoinStreaming.scala:144-158)."""
    _append(control_dir, {"id": query_id, "signal": "KILL"})


def _append(control_dir: str, msg: dict) -> None:
    path = os.path.join(control_dir, "queries.jsonl")
    with open(path, "a") as fh:
        fh.write(json.dumps(msg) + "\n")


def read_status(status_path: str) -> list[dict]:
    """Read all status events published so far (client side)."""
    if not os.path.exists(status_path):
        return []
    with open(status_path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


# Production Kafka wiring (connector jar not in this container): the control
# consumer becomes spark.readStream.format("kafka").option("subscribe",
# query_topic) drained by foreachBatch into ControlPlane._handle_message, and
# _emit_status becomes a KafkaProducer.send to the status topic. The message
# schema (line-delimited JSON in offset order) is transport-agnostic, so the
# file log and Kafka are drop-in replacements for each other.
