"""Queue-sink delivery semantics: caps, gzip, base64 fallback, breaker."""

import base64
import gzip
import json

import pytest

from trignis_spark.sinks.base import (
    CircuitBreaker,
    CircuitOpenError,
    ExportContext,
    OversizePayloadError,
    TransientSinkError,
)
from trignis_spark.sinks.queue import CappedQueueSink

CTX = ExportContext(environment="prod", object_name="orders")


def _sink(flavor, sent, **kw):
    return CappedQueueSink(
        name="q", flavor=flavor,
        send=lambda body, attrs: sent.append((body, attrs)), **kw,
    )


def test_small_message_plain():
    sent = []
    _sink("rabbitmq", sent).write('{"Data":[]}', CTX)
    body, attrs = sent[0]
    assert json.loads(body) == {"Data": []}
    assert "content-encoding" not in attrs
    assert attrs["source"] == "trignis-spark/prod/orders"
    assert len(attrs["correlation-id"]) == 36


def test_large_message_gzipped():
    sent = []
    payload = json.dumps({"Data": [{"pad": "x" * 5000}]})
    _sink("azure-eventhubs", sent).write(payload, CTX)
    body, attrs = sent[0]
    assert attrs["content-encoding"] == "gzip"
    assert json.loads(gzip.decompress(body)) == json.loads(payload)


def test_strict_queue_base64_fallback():
    # compressible payload larger than the cap: raw overflows, base64(gzip)
    # fits — the strict-queue fallback path
    sent = []
    blob = json.dumps({"Data": [{"pad": "x" * 500_000}]})
    sink = _sink("aws-sqs", sent)  # 256 KB cap; raw is ~500 KB
    sink.write(blob, CTX)
    body, attrs = sent[0]
    assert attrs["content-transfer-encoding"] == "base64"
    assert attrs["content-encoding"] == "gzip"
    assert len(body) <= sink.max_bytes
    assert json.loads(gzip.decompress(base64.b64decode(body))) == json.loads(blob)


def test_strict_queue_small_payload_stays_raw_text():
    sent = []
    _sink("azure-servicebus", sent).write('{"Data":[{"i":1}]}', CTX)
    body, attrs = sent[0]
    # under the 1 KB compress threshold: plain text, no encoding
    assert "content-encoding" not in attrs
    assert json.loads(body) == {"Data": [{"i": 1}]}


def test_strict_queue_above_threshold_base64_gzips():
    sent = []
    _sink("azure-servicebus", sent).write(
        json.dumps({"Data": [{"pad": "x" * 5000}]}), CTX
    )
    body, attrs = sent[0]
    # >1 KB on a text-only queue → base64(gzip), the reference contract
    assert attrs["content-transfer-encoding"] == "base64"
    assert json.loads(gzip.decompress(base64.b64decode(body)))["Data"][0][
        "pad"
    ] == "x" * 5000


def test_oversize_never_retryable():
    sent = []
    sink = _sink("azure-servicebus", sent)
    sink.max_bytes = 10
    with pytest.raises(OversizePayloadError) as ei:
        sink.write(json.dumps({"Data": [{"pad": "y" * 99999}]}), CTX)
    assert ei.value.retryable is False
    assert sent == []


def test_breaker_opens_after_consecutive_failures():
    t = [0.0]
    breaker = CircuitBreaker(threshold=3, open_seconds=60, clock=lambda: t[0])

    def failing_send(body, attrs):
        raise ConnectionError("broker down")

    sink = CappedQueueSink(name="q", flavor="rabbitmq", send=failing_send,
                           breaker=breaker)
    for _ in range(3):
        with pytest.raises(TransientSinkError):
            sink.write('{"Data":[]}', CTX)
    with pytest.raises(CircuitOpenError):
        sink.write('{"Data":[]}', CTX)  # open: fail fast, no send attempt
    t[0] = 61.0
    with pytest.raises(TransientSinkError):
        sink.write('{"Data":[]}', CTX)  # half-open probe goes through


def test_unknown_flavor_rejected():
    with pytest.raises(ValueError, match="unknown queue flavor"):
        CappedQueueSink(name="q", flavor="carrier-pigeon", send=lambda b, a: None)
