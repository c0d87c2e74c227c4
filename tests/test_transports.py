"""MQ transport adapters: SDK wiring against fakes, import guards, and
connection caching — the delivery-policy layer on top is covered by
test_queue_sink.py and stays unchanged."""

import sys
import types

import pytest

from trignis_spark.sinks.queue import CappedQueueSink
from trignis_spark.sinks.transports import (
    RabbitMqTransport,
    ServiceBusTransport,
    SqsTransport,
    TransportUnavailable,
    transport_for,
)


def test_unknown_flavor_rejected():
    with pytest.raises(ValueError, match="unknown queue flavor"):
        transport_for("carrier-pigeon")


def test_missing_sdk_raises_transport_unavailable(monkeypatch):
    # pika is genuinely absent in this environment
    t = RabbitMqTransport(host="mq.example")
    with pytest.raises(TransportUnavailable, match="pip install pika"):
        t(b"{}", {})


def _fake_pika(published):
    pika = types.ModuleType("pika")

    class BasicProperties:
        def __init__(self, **kw):
            self.kw = kw

    class _Channel:
        def queue_declare(self, queue, durable):
            published.append(("declare", queue, durable))

        def basic_publish(self, exchange, routing_key, body, properties,
                          mandatory):
            published.append(
                ("publish", exchange, routing_key, body, properties.kw,
                 mandatory)
            )

    class BlockingConnection:
        instances = 0

        def __init__(self, params):
            BlockingConnection.instances += 1
            self.params = params

        def channel(self):
            return _Channel()

    class ConnectionParameters:
        DEFAULT_CREDENTIALS = object()

        def __init__(self, **kw):
            self.kw = kw

    class PlainCredentials:
        def __init__(self, u, p):
            self.u, self.p = u, p

    pika.BasicProperties = BasicProperties
    pika.BlockingConnection = BlockingConnection
    pika.ConnectionParameters = ConnectionParameters
    pika.PlainCredentials = PlainCredentials
    return pika


def test_rabbitmq_persistent_mandatory_publish(monkeypatch):
    published = []
    fake = _fake_pika(published)
    monkeypatch.setitem(sys.modules, "pika", fake)
    t = RabbitMqTransport(host="mq", queue="events", user="u", password="p")
    t(b'{"a":1}', {"content-type": "application/json",
                   "correlation-id": "c-1", "source": "x"})
    declare, publish = published
    assert declare == ("declare", "events", True)
    _, exchange, rk, body, props, mandatory = publish
    assert (exchange, rk, body) == ("", "events", b'{"a":1}')
    assert props["delivery_mode"] == 2  # persistent
    assert props["correlation_id"] == "c-1"
    assert props["headers"] == {"source": "x"}
    assert mandatory is True


def test_rabbitmq_connection_cached_and_dropped_on_error(monkeypatch):
    published = []
    fake = _fake_pika(published)
    monkeypatch.setitem(sys.modules, "pika", fake)
    t = RabbitMqTransport(host="mq", queue="q")
    t(b"1", {})
    t(b"2", {})
    assert fake.BlockingConnection.instances == 1  # cached per endpoint

    def boom(*a, **kw):
        raise RuntimeError("socket reset")

    monkeypatch.setattr(fake.BlockingConnection, "channel", boom)
    with pytest.raises(RuntimeError):
        t(b"3", {})
    monkeypatch.undo()
    # next send reconnects (cache dropped)
    fake2 = _fake_pika(published)
    sys.modules["pika"] = fake2
    try:
        t(b"4", {})
        assert fake2.BlockingConnection.instances == 1
    finally:
        del sys.modules["pika"]


def test_sqs_message_attributes(monkeypatch):
    sent = []

    class FakeClient:
        def send_message(self, **kw):
            sent.append(kw)

    boto3 = types.ModuleType("boto3")
    boto3.client = lambda name, **kw: FakeClient()
    monkeypatch.setitem(sys.modules, "boto3", boto3)
    t = SqsTransport(queue_url="https://sqs.example/q", region="eu-west-1")
    t(b"eyJhIjoxfQ==", {"content-type": "application/json",
                        "content-transfer-encoding": "base64"})
    [kw] = sent
    assert kw["QueueUrl"] == "https://sqs.example/q"
    assert kw["MessageBody"] == "eyJhIjoxfQ=="
    assert kw["MessageAttributes"]["content-transfer-encoding"] == {
        "DataType": "String", "StringValue": "base64",
    }


def test_servicebus_message_properties(monkeypatch):
    sent = []

    class FakeSender:
        def send_messages(self, msg):
            sent.append(msg)

    class FakeClient:
        @classmethod
        def from_connection_string(cls, cs):
            return cls()

        def get_queue_sender(self, queue_name):
            return FakeSender()

        def get_topic_sender(self, topic_name):
            return FakeSender()

    class FakeMessage:
        def __init__(self, body, content_type=None, correlation_id=None,
                     application_properties=None):
            self.body = body
            self.content_type = content_type
            self.correlation_id = correlation_id
            self.application_properties = application_properties

    sb = types.ModuleType("azure.servicebus")
    sb.ServiceBusClient = FakeClient
    sb.ServiceBusMessage = FakeMessage
    monkeypatch.setitem(sys.modules, "azure.servicebus", sb)
    t = ServiceBusTransport(connection_string="Endpoint=sb://x", queue="q")
    t(b"payload", {"content-type": "application/json",
                   "correlation-id": "c-9", "content-encoding": "gzip"})
    [msg] = sent
    assert msg.body == b"payload"
    assert msg.correlation_id == "c-9"
    assert msg.application_properties == {"content-encoding": "gzip"}


def test_capped_sink_with_live_transport_shape(monkeypatch):
    """End-to-end: the cap-profile sink drives a (fake-SDK) transport —
    the same seam a production deployment wires."""
    sent = []

    class FakeClient:
        def send_message(self, **kw):
            sent.append(kw)

    boto3 = types.ModuleType("boto3")
    boto3.client = lambda name, **kw: FakeClient()
    monkeypatch.setitem(sys.modules, "boto3", boto3)

    from trignis_spark.sinks.base import ExportContext

    sink = CappedQueueSink(
        name="sqs", flavor="aws-sqs",
        send=SqsTransport(queue_url="https://sqs.example/q"),
    )
    big = '{"data":"' + "x" * 5000 + '"}'
    sink.write(big, ExportContext("e", "db", "obj", "k"))
    [kw] = sent
    # strict queue: large payload shipped as base64(gzip), text-safe
    assert kw["MessageAttributes"]["content-transfer-encoding"] == {
        "DataType": "String", "StringValue": "base64",
    }
    import base64 as b64
    import gzip as gz

    assert gz.decompress(b64.b64decode(kw["MessageBody"])).decode() == big
