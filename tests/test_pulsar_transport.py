"""Pulsar control-transport conformance — parity with KafkaTransport.

The reference ships BOTH kafka-clients and pulsar-client as PubSub
implementations (pom.xml:62-63; config-selected at
bullet_spark_defaults.yaml:94-97). ``PulsarTransport`` is the second
binding of the same ``ControlTransport`` contract; these tests run the
SAME conformance scenario as the Kafka stub tests (no broker / no
pulsar-client wheel in this container) plus the plane-level e2e and
restart-recovery replay.
"""

from __future__ import annotations

import json

import pytest

from bullet_spark_spark.streaming.control import (
    PulsarTransport,
    pulsar_control_plane,
)
from bullet_spark_spark.streaming.dynamic import DynamicMultiplexer
from bullet_spark_spark.streaming.runtime import QueryState
from tests.test_control_transport import _conformance_scenario, _wait_for


class _Timeout(Exception):
    pass


class _FakeMessage:
    def __init__(self, value: bytes) -> None:
        self._value = value

    def data(self) -> bytes:
        return self._value


class _FakePulsarConsumer:
    """pulsar-client consumer shape: one message per receive(), raises on
    an empty queue (not None-returning like kafka's poll)."""

    def __init__(self) -> None:
        self.pending: list[_FakeMessage] = []
        self.acked: list[_FakeMessage] = []
        self.closed = False

    def push(self, msg: dict) -> None:
        self.pending.append(_FakeMessage(json.dumps(msg).encode("utf-8")))

    def receive(self, timeout_millis=0):
        if not self.pending:
            raise _Timeout("Pulsar error: TimeOut")
        return self.pending.pop(0)

    def acknowledge(self, msg) -> None:
        self.acked.append(msg)

    def close(self) -> None:
        self.closed = True


class _FakePulsarProducer:
    def __init__(self) -> None:
        self.sent: list[bytes] = []
        self.closed = False

    def send(self, value: bytes) -> None:
        self.sent.append(value)

    def close(self) -> None:
        self.closed = True


class _FakePulsarReader:
    def __init__(self, records: list[bytes]) -> None:
        self._records = list(records)
        self.closed = False

    def read_next(self, timeout_millis=0):
        if not self._records:
            raise _Timeout("Pulsar error: TimeOut")
        return _FakeMessage(self._records.pop(0))

    def close(self) -> None:
        self.closed = True


def test_pulsar_transport_conformance_with_stub_clients():
    consumer, producer = _FakePulsarConsumer(), _FakePulsarProducer()
    t = PulsarTransport(
        "pulsar://broker:6650",
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
    # every consumed message was acknowledged (at-least-once consumption)
    assert len(consumer.acked) == 3
    assert [json.loads(v)["type"] for v in producer.sent] == [
        "WINDOW", "RESULT", "SIGNAL", "ERROR",
    ]
    t.close()
    assert consumer.closed and producer.closed


def test_pulsar_transport_requires_client_or_factories(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_pulsar(name, *a, **k):
        if name == "pulsar":
            raise ImportError("No module named 'pulsar'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_pulsar)
    with pytest.raises(ImportError, match="pulsar-client"):
        PulsarTransport("pulsar://broker:6650")


def test_pulsar_control_plane_end_to_end_with_stub_clients(spark):
    """Same plane-level scenario as the Kafka binding: register, ERROR on
    malformed BQL, KILL lands, status events carry ts."""
    consumer, producer = _FakePulsarConsumer(), _FakePulsarProducer()
    mux = DynamicMultiplexer(spark)
    plane = pulsar_control_plane(
        spark,
        mux,
        "pulsar://broker:6650",
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
            return [json.loads(v) for v in producer.sent]

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
        assert all("ts" in e for e in status_events())
    finally:
        plane.stop()


def test_pulsar_transport_restart_recovery_with_stub_clients(spark):
    """replay_status drains the status topic via an Earliest reader, so a
    replayed control topic does not re-register terminal queries."""
    consumer, producer = _FakePulsarConsumer(), _FakePulsarProducer()
    terminal = {"type": "SIGNAL", "query_id": "old", "signal": "COMPLETE", "ts": 1.0}
    reader = _FakePulsarReader([json.dumps(terminal).encode()])
    mux = DynamicMultiplexer(spark)
    plane = pulsar_control_plane(
        spark,
        mux,
        "pulsar://broker:6650",
        poll_interval_s=0.05,
        consumer_factory=lambda: consumer,
        producer_factory=lambda: producer,
        status_reader_factory=lambda: reader,
    )
    plane.start()
    try:
        consumer.push({"id": "old", "bql": "SELECT COUNT(*) AS n FROM STREAM()"})
        consumer.push({"id": "fresh", "bql": "SELECT COUNT(*) AS n FROM STREAM()"})
        assert _wait_for(lambda: "fresh" in mux.queries)
        assert "old" not in mux.queries
        assert reader.closed
        assert not any(
            json.loads(v).get("query_id") == "old" for v in producer.sent
        )
    finally:
        plane.stop()


def test_pulsar_transport_live_broker():
    """Real-broker smoke: skipped cleanly when pulsar-client or a local
    broker is absent (this container has neither)."""
    pulsar = pytest.importorskip("pulsar", reason="pulsar-client not installed")
    try:
        client = pulsar.Client("pulsar://localhost:6650", operation_timeout_seconds=2)
        producer = client.create_producer("bullet.status")
        producer.close()
        client.close()
    except Exception:
        pytest.skip("no Pulsar broker on localhost:6650")
    t = PulsarTransport("pulsar://localhost:6650")
    t.emit({"type": "ERROR", "error": "smoke", "ts": 0.0})
    t.close()
