"""Live MQ transport adapters for ``CappedQueueSink``.

The reference's five queue connectors (``MessageQueueService.cs:153-657``)
split cleanly into delivery policy (caps, compression, fallback —
``sinks/queue.py``) and transport (the SDK call). This module supplies
the transports as ``send(body_bytes, attributes)`` callables:

- RabbitMQ via ``pika`` — persistent delivery, mandatory flag,
  correlation-id headers (``MessageQueueService.cs:153-322``);
- AWS SQS via ``boto3`` — string message attributes
  (``MessageQueueService.cs:420-522``);
- Azure Service Bus via ``azure-servicebus`` (``:324-418``);
- Azure Event Hubs via ``azure-eventhub`` (``:524-568``).

Every SDK import is lazy and guarded: constructing a transport whose SDK
is absent raises ``TransportUnavailable`` with the pip name, and the
rest of the engine (including the cap-profile sink with an injected
fake) works without any of them. Connections are cached per endpoint
with single-flight creation (``MessageQueueService.cs:268-322`` caches
per host:port:vhost), matching the per-executor singleton pattern for
``foreachPartition`` use.

Kafka is not here: Spark writes it first-class (``sinks/kafka.py``).
"""

from __future__ import annotations

import importlib
import threading
from dataclasses import dataclass, field


class TransportUnavailable(RuntimeError):
    pass


def _import(module: str, pip_name: str):
    try:
        return importlib.import_module(module)
    except ImportError as e:
        raise TransportUnavailable(
            f"the {module!r} SDK is not installed (pip install {pip_name}); "
            "inject a custom send callable or install the SDK"
        ) from e


class _ConnectionCache:
    """Single-flight, per-key connection cache (one lock, create once)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._conns: dict[tuple, object] = {}

    def get_or_create(self, key: tuple, factory):
        with self._lock:
            conn = self._conns.get(key)
            if conn is None:
                conn = factory()
                self._conns[key] = conn
            return conn

    def drop(self, key: tuple):
        with self._lock:
            self._conns.pop(key, None)


@dataclass
class RabbitMqTransport:
    """Queue or topic-exchange publish, persistent + mandatory."""

    host: str
    port: int = 5672
    vhost: str = "/"
    queue: str = ""
    exchange: str = ""
    routing_key: str = ""
    user: str = ""
    password: str = ""
    _cache: _ConnectionCache = field(default_factory=_ConnectionCache, repr=False)

    def _key(self) -> tuple:
        return (self.host, self.port, self.vhost)

    def _channel(self):
        pika = _import("pika", "pika")

        def connect():
            creds = (
                pika.PlainCredentials(self.user, self.password)
                if self.user
                else pika.ConnectionParameters.DEFAULT_CREDENTIALS
            )
            params = pika.ConnectionParameters(
                host=self.host, port=self.port, virtual_host=self.vhost,
                credentials=creds,
            )
            return pika.BlockingConnection(params)

        conn = self._cache.get_or_create(self._key(), connect)
        try:
            return pika, conn.channel()
        except Exception:
            self._cache.drop(self._key())  # stale connection → reconnect
            raise

    def __call__(self, body: bytes, attrs: dict) -> None:
        pika, channel = self._channel()
        try:
            if self.queue and not self.exchange:
                channel.queue_declare(queue=self.queue, durable=True)
            props = pika.BasicProperties(
                delivery_mode=2,  # persistent
                content_type=attrs.get("content-type", "application/json"),
                correlation_id=attrs.get("correlation-id"),
                headers={
                    k: v for k, v in attrs.items()
                    if k not in ("content-type", "correlation-id")
                },
            )
            channel.basic_publish(
                exchange=self.exchange,
                routing_key=self.routing_key or self.queue,
                body=body,
                properties=props,
                mandatory=True,  # unroutable publishes fail loudly
            )
        except Exception:
            self._cache.drop(self._key())  # reconnect on next attempt
            raise


@dataclass
class SqsTransport:
    """SQS send; the sink's base64 fallback guarantees a text-safe body."""

    queue_url: str
    region: str = ""
    _cache: _ConnectionCache = field(default_factory=_ConnectionCache, repr=False)

    def _client(self):
        boto3 = _import("boto3", "boto3")
        kwargs = {"region_name": self.region} if self.region else {}
        return self._cache.get_or_create(
            ("sqs", self.region), lambda: boto3.client("sqs", **kwargs)
        )

    def __call__(self, body: bytes, attrs: dict) -> None:
        self._client().send_message(
            QueueUrl=self.queue_url,
            MessageBody=body.decode("utf-8"),
            MessageAttributes={
                k: {"DataType": "String", "StringValue": v}
                for k, v in attrs.items()
            },
        )


@dataclass
class ServiceBusTransport:
    connection_string: str
    queue: str = ""
    topic: str = ""
    _cache: _ConnectionCache = field(default_factory=_ConnectionCache, repr=False)

    def _sender(self):
        sb = _import("azure.servicebus", "azure-servicebus")
        key = ("asb", self.connection_string, self.queue or self.topic)

        def create():
            client = sb.ServiceBusClient.from_connection_string(
                self.connection_string
            )
            if self.topic:
                return client.get_topic_sender(topic_name=self.topic)
            return client.get_queue_sender(queue_name=self.queue)

        return sb, self._cache.get_or_create(key, create)

    def __call__(self, body: bytes, attrs: dict) -> None:
        sb, sender = self._sender()
        msg = sb.ServiceBusMessage(
            body,
            content_type=attrs.get("content-type"),
            correlation_id=attrs.get("correlation-id"),
            application_properties={
                k: v for k, v in attrs.items()
                if k not in ("content-type", "correlation-id")
            },
        )
        sender.send_messages(msg)


@dataclass
class EventHubsTransport:
    connection_string: str
    event_hub: str = ""
    _cache: _ConnectionCache = field(default_factory=_ConnectionCache, repr=False)

    def _producer(self):
        eh = _import("azure.eventhub", "azure-eventhub")
        key = ("eh", self.connection_string, self.event_hub)

        def create():
            return eh.EventHubProducerClient.from_connection_string(
                self.connection_string, eventhub_name=self.event_hub or None
            )

        return eh, self._cache.get_or_create(key, create)

    def __call__(self, body: bytes, attrs: dict) -> None:
        eh, producer = self._producer()
        event = eh.EventData(body)
        event.properties = dict(attrs)
        batch = producer.create_batch()
        batch.add(event)
        producer.send_batch(batch)


#: flavor (as in ``QUEUE_PROFILES``) → transport class
TRANSPORTS = {
    "rabbitmq": RabbitMqTransport,
    "aws-sqs": SqsTransport,
    "azure-servicebus": ServiceBusTransport,
    "azure-eventhubs": EventHubsTransport,
}


def transport_for(flavor: str, **options):
    """Build the live transport for a queue flavor; raises
    ``TransportUnavailable`` at first use when the SDK is absent."""
    try:
        cls = TRANSPORTS[flavor]
    except KeyError:
        raise ValueError(
            f"unknown queue flavor {flavor!r}; expected one of {sorted(TRANSPORTS)}"
        ) from None
    return cls(**options)
