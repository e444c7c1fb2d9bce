"""Transport-agnostic control-plane contract tests.

The reference's PubSub layer is pluggable and config-selected
(bullet_spark_defaults.yaml:94-97, QueryReceiver.scala:29-30); here the
same pluggability is the ``ControlTransport`` interface. These tests pin
the message schema on the file transport, verify the Kafka binding's glue
with injected stub clients (no broker in this container), and pin restart
replay semantics (BulletSparkStreamingBaseJobTest.scala:33-76 is the
reference's checkpoint-recovery e2e)."""

from __future__ import annotations

import json
import time

import pytest

from bullet_spark_spark.streaming.control import (
    ControlPlane,
    FileLogTransport,
    KafkaTransport,
    kafka_control_plane,
    read_status,
    submit_kill,
    submit_query,
)
from bullet_spark_spark.streaming.dynamic import DynamicMultiplexer
from bullet_spark_spark.streaming.runtime import QueryState


def _wait_for(pred, timeout=30, step=0.1):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(step)
    return False


# -- interface conformance (message schema, offset order, replay) -----------


def _conformance_scenario(transport, send_submission, send_signal):
    """The contract every transport must satisfy: offset-ordered delivery,
    exactly-once poll consumption, pinned message schema, status emit."""
    assert transport.poll() == []

    send_submission("q1", "SELECT COUNT(*) AS n FROM STREAM()", 5000)
    send_signal("q1", "KILL")
    msgs = transport.poll()
    assert len(msgs) == 2, msgs
    sub, sig = (json.loads(m) for m in msgs)
    # submission schema: id + bql (+ optional duration_ms), nothing else
    assert sub == {
        "id": "q1",
        "bql": "SELECT COUNT(*) AS n FROM STREAM()",
        "duration_ms": 5000,
    }
    # signal schema
    assert sig == {"id": "q1", "signal": "KILL"}
    # poll consumes: already-delivered messages never reappear
    assert transport.poll() == []
    # late messages after a drained poll still arrive, in order
    send_submission("q2", "SELECT COUNT(*) AS n FROM STREAM()", None)
    later = [json.loads(m) for m in transport.poll()]
    assert [m["id"] for m in later] == ["q2"]
    assert "duration_ms" not in later[0]

    # status emit round-trips JSON; event types are the pinned set
    for event in (
        {"type": "WINDOW", "query_id": "q1", "rows": [["a", 1]], "ts": 1.0},
        {"type": "RESULT", "query_id": "q1", "rows": [], "ts": 2.0},
        {"type": "SIGNAL", "query_id": "q1", "signal": "KILL", "ts": 3.0},
        {"type": "ERROR", "error": "boom", "ts": 4.0},
    ):
        transport.emit(event)


def test_file_transport_conformance(tmp_path):
    t = FileLogTransport(str(tmp_path / "c"), str(tmp_path / "status.jsonl"))
    _conformance_scenario(
        t,
        lambda qid, bql, dur: submit_query(str(tmp_path / "c"), qid, bql, dur),
        lambda qid, sig: submit_kill(str(tmp_path / "c"), qid),
    )
    # file transport replays its own status log (recovery path)
    events = t.replay_status()
    assert [e["type"] for e in events] == ["WINDOW", "RESULT", "SIGNAL", "ERROR"]
    assert events[2] == {"type": "SIGNAL", "query_id": "q1", "signal": "KILL", "ts": 3.0}


# -- kafka binding glue (stub clients — no broker in this container) --------


class _FakeRecord:
    def __init__(self, value: bytes) -> None:
        self.value = value


class _FakeConsumer:
    def __init__(self) -> None:
        self.pending: list[_FakeRecord] = []
        self.closed = False

    def push(self, msg: dict) -> None:
        self.pending.append(_FakeRecord(json.dumps(msg).encode("utf-8")))

    def poll(self, timeout_ms=0):
        if not self.pending:
            return {}
        batch, self.pending = self.pending, []
        return {("topic", 0): batch}

    def close(self) -> None:
        self.closed = True


class _FakeProducer:
    def __init__(self) -> None:
        self.sent: list[tuple[str, bytes]] = []
        self.closed = False

    def send(self, topic, value):
        self.sent.append((topic, value))

    def flush(self) -> None:
        pass

    def close(self) -> None:
        self.closed = True


def test_kafka_transport_conformance_with_stub_clients():
    consumer, producer = _FakeConsumer(), _FakeProducer()
    t = KafkaTransport(
        "broker:9092",
        status_topic="bullet.status",
        consumer_factory=lambda: consumer,
        producer_factory=lambda: producer,
    )

    def send_submission(qid, bql, dur):
        msg = {"id": qid, "bql": bql}
        if dur is not None:
            msg["duration_ms"] = dur
        consumer.push(msg)

    _conformance_scenario(
        t, send_submission, lambda qid, sig: consumer.push({"id": qid, "signal": sig})
    )
    # emits landed on the status topic as JSON bytes
    assert [topic for topic, _ in producer.sent] == ["bullet.status"] * 4
    assert json.loads(producer.sent[2][1])["signal"] == "KILL"
    t.close()
    assert consumer.closed and producer.closed


def test_kafka_control_plane_end_to_end_with_stub_clients(spark):
    """The full ControlPlane drives the Kafka binding exactly like the file
    bus: submissions register, malformed input produces ERROR status, KILL
    lands, terminal RESULT+SIGNAL publish to the status topic."""
    consumer, producer = _FakeConsumer(), _FakeProducer()
    mux = DynamicMultiplexer(spark)
    plane = kafka_control_plane(
        spark,
        mux,
        "broker:9092",
        poll_interval_s=0.05,
        consumer_factory=lambda: consumer,
        producer_factory=lambda: producer,
    )
    plane.start()
    try:
        consumer.push(
            {"id": "q1", "bql": "SELECT COUNT(*) AS n FROM STREAM() GROUP BY event_type"}
        )
        consumer.push({"id": "bad", "bql": "SELECT FROM nowhere"})
        assert _wait_for(lambda: "q1" in mux.queries)

        def status_events():
            return [json.loads(v) for _, v in producer.sent]

        assert _wait_for(
            lambda: any(
                e["type"] == "ERROR" and e.get("query_id") == "bad"
                for e in status_events()
            )
        )
        consumer.push({"id": "q1", "signal": "KILL"})
        assert _wait_for(lambda: mux.queries["q1"].state is QueryState.KILLED)
        assert _wait_for(
            lambda: any(
                e["type"] == "SIGNAL"
                and e.get("query_id") == "q1"
                and e["signal"] == "KILL"
                for e in status_events()
            )
        )
        # every event carries a ts stamp
        assert all("ts" in e for e in status_events())
    finally:
        plane.stop()


class _FakeMultiPartitionConsumer:
    """Stub consumer with N partitions: poll returns per-partition record
    lists, offset order preserved only WITHIN each partition — Kafka's
    real delivery contract (a multi-partition topic interleaves)."""

    def __init__(self, n_partitions: int = 2) -> None:
        self.partitions: dict[int, list[_FakeRecord]] = {
            i: [] for i in range(n_partitions)
        }
        self.closed = False

    def push(self, partition: int, msg: dict) -> None:
        self.partitions[partition].append(
            _FakeRecord(json.dumps(msg).encode("utf-8"))
        )

    def poll(self, timeout_ms=0):
        out = {}
        for p, recs in self.partitions.items():
            if recs:
                out[("topic", p)] = recs
                self.partitions[p] = []
        return out

    def close(self) -> None:
        self.closed = True


def test_kafka_interleaved_partitions_kill_defers_and_dedup_holds(spark):
    """The ordering contract pinned (KafkaTransport docstring): with a
    multi-partition control topic, a KILL can be consumed BEFORE the
    submission it refers to. The registry is interleaving-insensitive —
    the kill defers and applies the moment the submission lands (query
    ends KILLED, never runs unbounded), and duplicate submissions of one
    id across partitions dedupe to one registration."""
    consumer, producer = _FakeMultiPartitionConsumer(), _FakeProducer()
    mux = DynamicMultiplexer(spark)
    plane = kafka_control_plane(
        spark,
        mux,
        "broker:9092",
        poll_interval_s=0.05,
        consumer_factory=lambda: consumer,
        producer_factory=lambda: producer,
    )
    plane.start()
    try:
        bql = "SELECT COUNT(*) AS n FROM STREAM() GROUP BY event_type"
        # partition 0 (flattened first): the KILL; partition 1: the submission
        consumer.push(0, {"id": "qx", "signal": "KILL"})
        consumer.push(1, {"id": "qx", "bql": bql})
        # a retried submission of another query on BOTH partitions
        consumer.push(0, {"id": "qy", "bql": bql})
        consumer.push(1, {"id": "qy", "bql": bql})

        assert _wait_for(
            lambda: mux.queries.get("qx") is not None
            and mux.queries["qx"].state is QueryState.KILLED
        )
        assert _wait_for(lambda: "qy" in mux.queries)
        assert mux.queries["qy"].state is QueryState.RUNNING
        # the deferred kill surfaced as a (non-fatal) notice
        events = [json.loads(v) for _, v in producer.sent]
        assert any(
            e["type"] == "ERROR" and "deferred" in e.get("error", "")
            for e in events
        )
    finally:
        plane.stop()


def test_kafka_transport_requires_client_or_factories(monkeypatch):
    """Without kafka-python and without injected factories the binding
    fails with a clear ImportError naming the missing package — forced in
    every environment by masking the kafka import."""
    import sys

    monkeypatch.setitem(sys.modules, "kafka", None)  # import kafka → ImportError
    with pytest.raises(ImportError, match="kafka-python"):
        KafkaTransport("broker:9092")


def test_kafka_transport_restart_recovery_with_stub_clients(spark):
    """Restart recovery over the Kafka binding: replay_status drains the
    status topic, so a replayed control topic does not re-register queries
    whose terminal SIGNAL is already published."""
    consumer, producer = _FakeConsumer(), _FakeProducer()

    class _FakeReplayConsumer:
        def __init__(self, records):
            self._records = records
            self.closed = False

        def __iter__(self):
            return iter(self._records)

        def close(self):
            self.closed = True

    terminal = {"type": "SIGNAL", "query_id": "old", "signal": "COMPLETE", "ts": 1.0}
    replay = _FakeReplayConsumer([_FakeRecord(json.dumps(terminal).encode())])
    mux = DynamicMultiplexer(spark)
    plane = kafka_control_plane(
        spark,
        mux,
        "broker:9092",
        poll_interval_s=0.05,
        consumer_factory=lambda: consumer,
        producer_factory=lambda: producer,
        status_replay_factory=lambda: replay,
    )
    plane.start()
    try:
        # the control topic replays from offset 0: old (terminal) + fresh
        consumer.push({"id": "old", "bql": "SELECT COUNT(*) AS n FROM STREAM()"})
        consumer.push({"id": "fresh", "bql": "SELECT COUNT(*) AS n FROM STREAM()"})
        assert _wait_for(lambda: "fresh" in mux.queries)
        assert "old" not in mux.queries  # terminal query not re-registered
        assert replay.closed
        # and its terminal events are not re-emitted
        assert not any(
            json.loads(v).get("query_id") == "old" for _, v in producer.sent
        )
    finally:
        plane.stop()


def test_kafka_transport_live_broker():
    """Real-broker smoke: skipped cleanly when kafka-python or a local
    broker is absent (this container has neither)."""
    kafka = pytest.importorskip("kafka", reason="kafka-python not installed")
    try:
        consumer = kafka.KafkaConsumer(
            bootstrap_servers="localhost:9092", consumer_timeout_ms=500
        )
        consumer.topics()
        consumer.close()
    except Exception:
        pytest.skip("no Kafka broker on localhost:9092")
    t = KafkaTransport("localhost:9092")
    t.emit({"type": "ERROR", "error": "smoke", "ts": 0.0})
    t.close()


# -- restart recovery (replay semantics) ------------------------------------


def test_control_plane_recovery(spark, tmp_path):
    """A restarted ControlPlane over an existing control+status log must:
    NOT re-register completed/killed queries, NOT re-emit their terminal
    events, and resume still-running queries — the reference recovers the
    whole DAG incl. query registry from checkpoint
    (BulletSparkStreamingBaseJob.scala:30-38, its e2e test :33-76)."""
    control_dir = str(tmp_path / "control")
    status_path = str(tmp_path / "status.jsonl")

    # --- incarnation 1: one query completes, one is killed, one keeps running
    mux1 = DynamicMultiplexer(spark)
    plane1 = ControlPlane(spark, mux1, control_dir, status_path, poll_interval_s=0.05)
    plane1.start()
    try:
        submit_query(
            control_dir, "done", "SELECT COUNT(*) AS n FROM STREAM()", duration_ms=1
        )
        submit_query(control_dir, "victim", "SELECT COUNT(*) AS n FROM STREAM()")
        submit_query(control_dir, "live", "SELECT COUNT(*) AS n FROM STREAM()")
        assert _wait_for(lambda: "victim" in mux1.queries and "live" in mux1.queries)
        submit_kill(control_dir, "victim")
        assert _wait_for(
            lambda: {
                (e.get("query_id"), e.get("signal"))
                for e in read_status(status_path)
                if e["type"] == "SIGNAL"
            }
            >= {("done", "COMPLETE"), ("victim", "KILL")}
        )
    finally:
        plane1.stop()

    before = read_status(status_path)
    n_terminal_before = sum(1 for e in before if e["type"] in ("SIGNAL", "RESULT"))

    # --- incarnation 2: fresh mux + plane over the SAME logs
    mux2 = DynamicMultiplexer(spark)
    plane2 = ControlPlane(spark, mux2, control_dir, status_path, poll_interval_s=0.05)
    plane2.start()
    try:
        # running query resumes (re-registers from the replayed control log)
        assert _wait_for(lambda: "live" in mux2.queries)
        time.sleep(0.5)  # several poll intervals of replay traffic
        # terminal queries are NOT re-registered
        assert "done" not in mux2.queries
        assert "victim" not in mux2.queries
        # no duplicate terminal events were re-emitted during replay
        after = read_status(status_path)
        n_terminal_after = sum(1 for e in after if e["type"] in ("SIGNAL", "RESULT"))
        assert n_terminal_after == n_terminal_before
        # replayed KILL for an already-terminal query is ignored, not an ERROR
        assert not any(
            e["type"] == "ERROR" and e.get("query_id") == "victim" for e in after
        )
        # the resumed query is fully live: a fresh KILL terminates it once
        submit_kill(control_dir, "live")
        assert _wait_for(
            lambda: any(
                e["type"] == "SIGNAL"
                and e.get("query_id") == "live"
                and e["signal"] == "KILL"
                for e in read_status(status_path)
            )
        )
    finally:
        plane2.stop()

    final = read_status(status_path)
    for qid in ("done", "victim", "live"):
        signals = [
            e
            for e in final
            if e["type"] == "SIGNAL" and e.get("query_id") == qid
        ]
        assert len(signals) == 1, (qid, signals)
