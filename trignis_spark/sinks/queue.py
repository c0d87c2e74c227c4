"""Generic message-queue sink: size caps with gzip+base64 fallback.

The reference ships five queue connectors whose *transport* differs but
whose delivery semantics are identical (``MessageQueueService.cs:31-98``):
a per-queue message cap, gzip compression above 1 KB, a gzip+base64
re-encode fallback for the strictly-capped queues (Azure Service Bus /
SQS), oversize → dead letter (never retried), correlation-id +
content-type attributes, and a per-endpoint circuit breaker.

``CappedQueueSink`` implements those semantics over an injectable
``send(message_bytes, attributes)`` transport; the five queue flavors
are preset cap profiles. The actual SDK calls (pika/boto3/azure) plug
in as the transport — not bundled in this environment, but the
delivery policy layer (what the reference's tests cover) is real and
tested. Kafka has a first-class Spark writer instead
(``sinks/kafka.py``).
"""

from __future__ import annotations

import base64
import gzip
import uuid
from dataclasses import dataclass, field

from trignis_spark.sinks.base import (
    CircuitBreaker,
    ExportContext,
    OversizePayloadError,
    Sink,
    TransientSinkError,
)

COMPRESS_THRESHOLD_BYTES = 1024

#: (max_message_bytes, base64_fallback) per queue flavor — reference caps.
QUEUE_PROFILES: dict[str, tuple[int, bool]] = {
    "rabbitmq": (128 * 1024 * 1024, False),
    "azure-servicebus": (256 * 1024, True),
    "aws-sqs": (256 * 1024, True),
    "azure-eventhubs": (1024 * 1024, False),
}


@dataclass
class CappedQueueSink(Sink):
    name: str
    flavor: str
    send: object  # (bytes, dict[str, str]) -> None; raises on failure
    correlation_source: str = "trignis-spark"
    breaker: CircuitBreaker = field(default_factory=CircuitBreaker)

    def __post_init__(self):
        if self.flavor not in QUEUE_PROFILES:
            raise ValueError(
                f"unknown queue flavor {self.flavor!r}; "
                f"expected one of {sorted(QUEUE_PROFILES)}"
            )
        self.max_bytes, self.base64_fallback = QUEUE_PROFILES[self.flavor]

    def _encode(self, payload: str) -> tuple[bytes, dict[str, str]]:
        body = payload.encode("utf-8")
        attrs = {"content-type": "application/json"}
        if self.base64_fallback:
            # strict text-only queues (ASB/SQS): payloads above the 1 KB
            # compress threshold ship as base64(gzip) — the reference's
            # encoding contract for these queues — so large batches fit
            # under the hard cap and stay text-safe
            if len(body) > COMPRESS_THRESHOLD_BYTES:
                body = base64.b64encode(gzip.compress(body, compresslevel=9))
                attrs["content-transfer-encoding"] = "base64"
                attrs["content-encoding"] = "gzip"
        elif len(body) > COMPRESS_THRESHOLD_BYTES:
            body = gzip.compress(body, compresslevel=9)
            attrs["content-encoding"] = "gzip"
        if len(body) > self.max_bytes:
            raise OversizePayloadError(
                f"{self.flavor} message {len(body)}B exceeds cap {self.max_bytes}B"
            )
        return body, attrs

    def write(self, payload: str, ctx: ExportContext) -> None:
        body, attrs = self._encode(payload)
        attrs["correlation-id"] = str(uuid.uuid4())
        attrs["source"] = f"{self.correlation_source}/{ctx.environment}/{ctx.object_name}"

        def attempt():
            try:
                self.send(body, attrs)
            except OversizePayloadError:
                raise
            except Exception as e:  # noqa: BLE001 — SDK errors are transient
                raise TransientSinkError(f"{self.flavor} send failed: {e}") from e

        self.breaker.run(attempt)
