"""External control plane: query transport in, result/status transport out.

The reference's entire point of entry is a pluggable PubSub: queries arrive
over a bus while the job runs (``QueryReceiver.receive()`` loop on a
dedicated receiver thread, QueryReceiver.scala:21-68, buffer/commit :49-62)
and results + lifecycle feedback return through publishers
(``ResultPublisher.publish/publishFeedback``, ResultPublisher.scala:78-99;
feedback loop :35-45 re-publishes KILL/COMPLETE into the query channel so
all stages drop state). The transport itself is config-selected
(bullet_spark_defaults.yaml:94-97) — the same pluggability lives here as
``ControlTransport`` implementations:

- ``FileLogTransport`` — an append-only JSON-lines log as the bus
  (offset-ordered line-delimited JSON, the Kafka-topic shape). The default,
  and the one exercised end-to-end in tests.
- ``KafkaTransport`` — the same handler interface over a real Kafka
  consumer/producer (kafka-python, imported lazily; construct via
  ``kafka_control_plane``). Client factories are injectable so the glue is
  testable without a broker; the live test skips when kafka-python or a
  broker is absent.

Message schema (transport-agnostic, pinned by the interface-conformance
test): control messages are either a submission ``{"id": ..., "bql":
"SELECT ...", "duration_ms"?: N, "quantile_width"?: W}`` (parsed by
plans.bql — the bullet-bql front door; ``quantile_width`` supplies the
mergeable linear bucketing a dynamically-multiplexed QUANTILE needs) or a
signal ``{"id": ..., "signal": "KILL"}``. Status events
are ``{"type": WINDOW|RESULT|SIGNAL|ERROR, "ts": ..., ...}`` — WINDOW for
incremental merged results (JoinStreaming's window-close emissions), RESULT
for final rows, SIGNAL for COMPLETE/KILL/FAIL, ERROR for malformed input
(the reference's ErrorData path, BulletSparkUtils.scala:38-44).

Queries run on the ``DynamicMultiplexer`` (streaming.dynamic): ONE shared
stream, specs evaluated per micro-batch, registry mutable mid-flight —
exactly bullet's forward-looking query semantics (a query sees only records
arriving after submission, SURVEY §0).

Restart recovery: a new ``ControlPlane`` over an existing bus replays the
control log from offset 0 (the reference recovers its whole DAG including
registered queries from checkpoint, BulletSparkStreamingBaseJob.scala:30-38
``getOrCreate``). Replay semantics: queries whose terminal SIGNAL already
exists on the status topic are NOT re-registered and their terminal events
are NOT re-emitted; still-running queries re-register and resume.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from bullet_spark_spark.plans.bql import parse_bql
from bullet_spark_spark.streaming.dynamic import DynamicMultiplexer
from bullet_spark_spark.streaming.runtime import QueryState


class ControlTransport:
    """The pluggable bus: poll control messages in, emit status events out.

    Implementations must return control messages in offset order (per
    partition/file) from ``poll`` and publish JSON-serializable status
    events from ``emit``. ``replay_status`` returns every status event
    published so far (used for restart recovery); transports that cannot
    replay may return []."""

    def poll(self) -> list[str]:
        raise NotImplementedError

    def emit(self, event: dict) -> None:
        raise NotImplementedError

    def replay_status(self) -> list[dict]:
        return []

    def close(self) -> None:
        pass


class FileLogTransport(ControlTransport):
    """Append-only JSON-lines control/status logs (Kafka-topic shape)."""

    def __init__(self, control_dir: str, status_path: str) -> None:
        self.control_dir = control_dir
        self.status_path = status_path
        self._offsets: dict[str, int] = {}  # file -> lines consumed
        self._status_lock = threading.Lock()
        os.makedirs(control_dir, exist_ok=True)
        os.makedirs(os.path.dirname(status_path) or ".", exist_ok=True)

    def poll(self) -> list[str]:
        try:
            files = sorted(
                f for f in os.listdir(self.control_dir) if f.endswith((".json", ".jsonl"))
            )
        except FileNotFoundError:
            return []
        out: list[str] = []
        for fname in files:
            path = os.path.join(self.control_dir, fname)
            offset = self._offsets.get(path, 0)
            try:
                with open(path) as fh:
                    lines = fh.read().splitlines()
            except OSError:
                continue
            out.extend(line for line in lines[offset:] if line.strip())
            self._offsets[path] = len(lines)
        return out

    def emit(self, event: dict) -> None:
        with self._status_lock:
            with open(self.status_path, "a") as fh:
                fh.write(json.dumps(event, default=str) + "\n")

    def replay_status(self) -> list[dict]:
        return read_status(self.status_path)


class KafkaTransport(ControlTransport):
    """The same handler interface over a real Kafka consumer/producer.

    Control messages are consumed from ``query_topic`` (earliest offset, so
    a restarted plane replays the full registration history — the recovery
    contract above), status events are produced to ``status_topic``, and
    ``replay_status`` drains the status topic from the beginning through a
    throwaway consumer so the replayed registrations dedupe against
    already-terminal queries exactly as on the file transport.
    ``consumer_factory``/``producer_factory``/``status_replay_factory``
    default to kafka-python clients and are injectable for tests; with
    injected clients and no ``status_replay_factory``, replay returns []
    (recovery off).

    ORDERING CONTRACT: Kafka guarantees offset order only WITHIN a
    partition, so a multi-partition control topic may interleave messages
    across partitions (unlike FileLogTransport, which is totally ordered).
    The ControlPlane registry is insensitive to that interleaving:
    submissions dedupe by query id (first consumed wins; duplicate
    submissions of one id must carry the same BQL — retries, not
    redefinitions), and a KILL consumed before its submission defers until
    the submission lands (registered-then-killed, never lost). For strict
    per-query ordering, produce control messages KEYED BY QUERY ID —
    Kafka then routes every message of one query to one partition — or
    use a single-partition control topic. Pinned by
    test_kafka_interleaved_partitions_*."""

    def __init__(
        self,
        bootstrap_servers: str,
        query_topic: str = "bullet.queries",
        status_topic: str = "bullet.status",
        poll_timeout_ms: int = 100,
        consumer_factory=None,
        producer_factory=None,
        status_replay_factory=None,
    ) -> None:
        if consumer_factory is None or producer_factory is None:
            try:
                from kafka import KafkaConsumer, KafkaProducer  # type: ignore
            except ImportError as e:  # pragma: no cover - exercised via test stub
                raise ImportError(
                    "KafkaTransport needs the kafka-python package (or injected "
                    "consumer/producer factories); pip install kafka-python"
                ) from e
            consumer_factory = consumer_factory or (
                lambda: KafkaConsumer(
                    query_topic,
                    bootstrap_servers=bootstrap_servers,
                    auto_offset_reset="earliest",
                    enable_auto_commit=False,
                    consumer_timeout_ms=poll_timeout_ms,
                )
            )
            producer_factory = producer_factory or (
                lambda: KafkaProducer(bootstrap_servers=bootstrap_servers)
            )
            # a throwaway earliest-offset consumer on the STATUS topic: the
            # control topic replays from offset 0, so recovery needs the
            # already-published terminal signals too (see replay_status)
            status_replay_factory = status_replay_factory or (
                lambda: KafkaConsumer(
                    status_topic,
                    bootstrap_servers=bootstrap_servers,
                    auto_offset_reset="earliest",
                    enable_auto_commit=False,
                    consumer_timeout_ms=max(poll_timeout_ms, 1000),
                )
            )
        self.status_topic = status_topic
        self.poll_timeout_ms = poll_timeout_ms
        self._status_replay_factory = status_replay_factory
        self._consumer = consumer_factory()
        self._producer = producer_factory()

    def poll(self) -> list[str]:
        batches = self._consumer.poll(timeout_ms=self.poll_timeout_ms)
        out: list[str] = []
        # poll() returns {TopicPartition: [records]}; offset order holds
        # within each partition, matching the file transport's per-file order
        for records in batches.values():
            for rec in records:
                value = rec.value
                out.append(value.decode("utf-8") if isinstance(value, bytes) else str(value))
        return out

    def emit(self, event: dict) -> None:
        self._producer.send(
            self.status_topic, json.dumps(event, default=str).encode("utf-8")
        )
        self._producer.flush()

    def replay_status(self) -> list[dict]:
        """Drain the status topic from the beginning (restart recovery: the
        consumer replays the control topic from offset 0, so already-
        published terminal signals must be replayable too — matching
        FileLogTransport's semantics)."""
        if self._status_replay_factory is None:
            return []
        consumer = self._status_replay_factory()
        events: list[dict] = []
        try:
            for rec in consumer:  # stops on consumer_timeout_ms
                value = rec.value
                events.append(
                    json.loads(value.decode("utf-8") if isinstance(value, bytes) else value)
                )
        finally:
            consumer.close()
        return events

    def close(self) -> None:
        self._consumer.close()
        self._producer.close()


class PulsarTransport(ControlTransport):
    """The handler interface over Apache Pulsar — the reference's second
    shipped PubSub client (pom.xml:62-63 declares both kafka-clients and
    pulsar-client; the PubSub implementation is config-selected,
    bullet_spark_defaults.yaml:94-97). Same contract as KafkaTransport:

    - control messages consumed from ``query_topic`` via an
      Earliest-position shared subscription, so a restarted plane replays
      the full registration history (the recovery contract);
    - status events produced to ``status_topic``;
    - ``replay_status`` drains the status topic through a throwaway
      Earliest reader (Pulsar's non-subscription read path — no consumer
      group bookkeeping for a one-shot recovery scan).

    ORDERING CONTRACT: Pulsar orders messages per partition like Kafka, so
    the same registry insensitivity applies (dedupe-by-id, deferred KILL);
    key control messages by query id (Pulsar routes by key hash) or use a
    non-partitioned control topic for total order.

    ``consumer_factory``/``producer_factory``/``status_reader_factory``
    default to pulsar-client objects and are injectable for tests; with
    injected clients and no ``status_reader_factory``, replay returns []
    (recovery off). Poll uses ``receive(timeout)`` drained until the
    client's TIMEOUT error — pulsar-client raises ``pulsar.Timeout`` on an
    empty queue rather than returning None. Only that type (or
    ``timeout_exc`` for injected clients; fallback: class-name contains
    "Timeout") ends the drain loop — auth/deserialization/dead-consumer
    errors re-raise instead of masquerading as an empty queue and silently
    stalling registration ingest."""

    def __init__(
        self,
        service_url: str,
        query_topic: str = "bullet.queries",
        status_topic: str = "bullet.status",
        subscription: str = "bullet-control-plane",
        poll_timeout_ms: int = 100,
        consumer_factory=None,
        producer_factory=None,
        status_reader_factory=None,
        timeout_exc: type[BaseException] | None = None,
    ) -> None:
        self._client = None
        self._timeout_exc = timeout_exc
        if consumer_factory is None or producer_factory is None:
            try:
                import pulsar  # type: ignore
            except ImportError as e:  # pragma: no cover - exercised via test stub
                raise ImportError(
                    "PulsarTransport needs the pulsar-client package (or "
                    "injected consumer/producer factories); pip install "
                    "pulsar-client"
                ) from e
            client = pulsar.Client(service_url)
            self._client = client
            if self._timeout_exc is None:
                # importable at __init__ time on the real client
                self._timeout_exc = getattr(pulsar, "Timeout", None)
            consumer_factory = consumer_factory or (
                lambda: client.subscribe(
                    query_topic,
                    subscription,
                    initial_position=pulsar.InitialPosition.Earliest,
                )
            )
            producer_factory = producer_factory or (
                lambda: client.create_producer(status_topic)
            )
            status_reader_factory = status_reader_factory or (
                lambda: client.create_reader(
                    status_topic, start_message_id=pulsar.MessageId.earliest
                )
            )
        self.poll_timeout_ms = poll_timeout_ms
        self._status_reader_factory = status_reader_factory
        self._consumer = consumer_factory()
        self._producer = producer_factory()

    def _is_timeout(self, exc: BaseException) -> bool:
        """True iff ``exc`` is the client's empty-queue timeout: the pinned
        ``timeout_exc`` type when known, else (injected test clients) a
        class-name heuristic. Anything else is a REAL consumer failure."""
        if self._timeout_exc is not None:
            return isinstance(exc, self._timeout_exc)
        return "timeout" in type(exc).__name__.lower()

    def poll(self) -> list[str]:
        out: list[str] = []
        while True:
            try:
                msg = self._consumer.receive(timeout_millis=self.poll_timeout_ms)
            except Exception as e:
                if self._is_timeout(e):
                    break  # pulsar-client raises _pulsar.Timeout on empty queue
                raise  # auth/deser/dead-consumer: surface, don't stall silently
            if msg is None:
                break
            data = msg.data()
            out.append(data.decode("utf-8") if isinstance(data, bytes) else str(data))
            self._consumer.acknowledge(msg)
        return out

    def emit(self, event: dict) -> None:
        self._producer.send(json.dumps(event, default=str).encode("utf-8"))

    def replay_status(self) -> list[dict]:
        """Drain the status topic from the beginning via a throwaway
        Earliest reader — same restart-recovery semantics as the Kafka and
        file transports."""
        if self._status_reader_factory is None:
            return []
        reader = self._status_reader_factory()
        events: list[dict] = []
        try:
            while True:
                try:
                    msg = reader.read_next(timeout_millis=max(self.poll_timeout_ms, 1000))
                except Exception as e:
                    if self._is_timeout(e):
                        break
                    raise
                if msg is None:
                    break
                data = msg.data()
                events.append(
                    json.loads(data.decode("utf-8") if isinstance(data, bytes) else data)
                )
        finally:
            try:
                reader.close()
            except Exception:
                pass
        return events

    def close(self) -> None:
        self._consumer.close()
        self._producer.close()
        if self._client is not None:
            self._client.close()


@dataclass
class ControlPlane:
    """Consume a control bus, drive a DynamicMultiplexer, publish status."""

    spark: SparkSession
    mux: DynamicMultiplexer
    control_dir: str | None = None
    status_path: str | None = None
    poll_interval_s: float = 0.2
    transport: ControlTransport | None = None

    _stop: threading.Event = field(default_factory=threading.Event)
    _threads: list[threading.Thread] = field(default_factory=list)
    _published: dict[str, tuple] = field(default_factory=dict)  # qid -> last rows
    _terminal_published: set[str] = field(default_factory=set)
    _recovered_terminal: set[str] = field(default_factory=set)
    # KILLs that arrived before their submission (cross-partition
    # transports reorder across partitions — see KafkaTransport contract):
    # the kill applies the moment the submission lands
    _killed_early: set[str] = field(default_factory=set)

    def __post_init__(self) -> None:
        if self.transport is None:
            if self.control_dir is None or self.status_path is None:
                raise ValueError(
                    "ControlPlane needs either a transport or control_dir+status_path"
                )
            self.transport = FileLogTransport(self.control_dir, self.status_path)

    def start(self) -> None:
        self._recover()
        for target in (self._consume_loop, self._publish_loop):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)
        self._publish_once()  # flush terminal states
        self.transport.close()

    # -- restart recovery ---------------------------------------------------

    def _recover(self) -> None:
        """Seed replay semantics from the status topic: a query whose
        terminal SIGNAL is already published must not re-register when the
        control log replays, and must not re-emit RESULT/SIGNAL (the
        reference restarts from checkpoint with query state intact,
        BulletSparkStreamingBaseJob.scala:30-38)."""
        for event in self.transport.replay_status():
            if event.get("type") == "SIGNAL" and event.get("query_id"):
                self._recovered_terminal.add(event["query_id"])
                self._terminal_published.add(event["query_id"])

    # -- control consumption (the QueryReceiver loop) -----------------------

    def _consume_loop(self) -> None:
        while not self._stop.is_set():
            try:
                for line in self.transport.poll():
                    self._handle_message(line)
            except Exception as e:  # noqa: BLE001 — a dead consumer ignores all submissions
                try:
                    self._emit_status({"type": "ERROR", "error": f"consumer: {e}"})
                except Exception:
                    pass
            self._stop.wait(self.poll_interval_s)

    def _handle_message(self, line: str) -> None:
        try:
            msg = json.loads(line)
            qid = msg["id"]
        except (json.JSONDecodeError, KeyError, TypeError) as e:
            self._emit_status({"type": "ERROR", "error": f"malformed message: {e}"})
            return
        if qid in self._recovered_terminal:
            # replayed traffic for a query that already reached a terminal
            # state before restart: neither re-register nor re-signal
            return
        if "signal" in msg:
            if msg["signal"] == "KILL":
                try:
                    self.mux.kill(qid)
                except KeyError:
                    # the registry must be insensitive to cross-partition
                    # interleaving (a Kafka control topic orders messages
                    # only within a partition): a KILL consumed before its
                    # submission DEFERS — the query is killed the moment
                    # its submission lands — instead of being lost
                    self._killed_early.add(qid)
                    self._emit_status(
                        {
                            "query_id": qid,
                            "type": "ERROR",
                            "error": "unknown query (kill deferred)",
                        }
                    )
            return
        try:
            from dataclasses import replace

            spec = parse_bql(msg["bql"])
            if msg.get("duration_ms"):
                spec = replace(spec, duration_ms=int(msg["duration_ms"]))
            if msg.get("quantile_width"):
                # mergeable linear bucketing for dynamically-multiplexed
                # QUANTILE (an execution knob, not BQL surface): estimates
                # land within one width of exact
                from bullet_spark_spark.plans.spec import DistributionAgg

                if isinstance(spec.aggregation, DistributionAgg):
                    spec = replace(
                        spec,
                        aggregation=replace(
                            spec.aggregation, width=float(msg["quantile_width"])
                        ),
                    )
            self.mux.register(qid, spec)
            if qid in self._killed_early:
                self._killed_early.discard(qid)
                self.mux.kill(qid)
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
            # sketch-estimated results carry bullet's meta section (estimate
            # + std-error bounds) alongside the rows [D]; exact results
            # leave meta unset
            meta = getattr(handle, "meta", None)
            if handle.state is QueryState.RUNNING:
                if rows and self._published.get(qid) != tuple(map(tuple, rows)):
                    # incremental window emission (JoinStreaming.scala:148-151)
                    self._published[qid] = tuple(map(tuple, rows))
                    event = {"query_id": qid, "type": "WINDOW", "rows": rows}
                    if meta is not None:
                        event["meta"] = meta
                    self._emit_status(event)
            elif qid not in self._terminal_published:
                self._terminal_published.add(qid)
                event = {"query_id": qid, "type": "RESULT", "rows": rows}
                if meta is not None:
                    event["meta"] = meta
                self._emit_status(event)
                signal = {
                    QueryState.COMPLETED: "COMPLETE",
                    QueryState.KILLED: "KILL",
                    QueryState.FAILED: "FAIL",
                }[handle.state]
                self._emit_status(
                    {"query_id": qid, "type": "SIGNAL", "signal": signal}
                )

    def _emit_status(self, event: dict) -> None:
        self.transport.emit({**event, "ts": time.time()})


def kafka_control_plane(
    spark: SparkSession,
    mux: DynamicMultiplexer,
    bootstrap_servers: str,
    query_topic: str = "bullet.queries",
    status_topic: str = "bullet.status",
    poll_interval_s: float = 0.2,
    **transport_kwargs,
) -> ControlPlane:
    """Wire the same handlers to a real Kafka consumer/producer — the
    config-selected PubSub of the reference (bullet_spark_defaults.yaml:
    94-97, QueryReceiver.scala:29-30). Requires kafka-python (or injected
    client factories via ``transport_kwargs``)."""
    transport = KafkaTransport(
        bootstrap_servers,
        query_topic=query_topic,
        status_topic=status_topic,
        **transport_kwargs,
    )
    return ControlPlane(spark, mux, poll_interval_s=poll_interval_s, transport=transport)


def pulsar_control_plane(
    spark: SparkSession,
    mux: DynamicMultiplexer,
    service_url: str,
    query_topic: str = "bullet.queries",
    status_topic: str = "bullet.status",
    poll_interval_s: float = 0.2,
    **transport_kwargs,
) -> ControlPlane:
    """Wire the same handlers to a Pulsar consumer/producer — the
    reference's other shipped PubSub client (pom.xml:62-63). Requires
    pulsar-client (or injected client factories via ``transport_kwargs``)."""
    transport = PulsarTransport(
        service_url,
        query_topic=query_topic,
        status_topic=status_topic,
        **transport_kwargs,
    )
    return ControlPlane(spark, mux, poll_interval_s=poll_interval_s, transport=transport)


def submit_query(
    control_dir: str,
    query_id: str,
    bql: str,
    duration_ms: int | None = None,
    quantile_width: float | None = None,
) -> None:
    """Client-side submission helper: append a query message to the control
    log (what an external submitter does to the query topic)."""
    os.makedirs(control_dir, exist_ok=True)
    msg: dict = {"id": query_id, "bql": bql}
    if duration_ms is not None:
        msg["duration_ms"] = duration_ms
    if quantile_width is not None:
        msg["quantile_width"] = quantile_width
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
