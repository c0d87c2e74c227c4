"""Kafka sink: the one destination Spark supports first-class.

In production the export pipeline writes Kafka natively via
``df.write.format("kafka")``, which keeps the whole serialize+send path
on executors. This module makes the exact wire contract the connector
receives *inspectable without a broker*:

* :func:`build_frame` returns the literal DataFrame handed to the
  connector — ``key`` (nullable binary), ``value`` (the JSON payload),
  ``headers`` (``array<struct<key:string, value:binary>>``) with the
  reference's three headers: ``content-type: application/json``,
  ``correlation-id``, ``source`` (reference layout:
  ``MessageQueueService.cs:622-632``).
* :func:`producer_options` returns the ``kafka.*``-prefixed producer
  options: ``acks=all``, a 30 s delivery timeout, and the same
  SASL-mechanism / security-protocol switch the reference applies
  (``MessageQueueService.cs:585-610``).

The reference produces ``Message<Null, string>`` — a *null key* — so the
default here is key-less too (round-robin partitioning); pass
``key_from_ctx=True`` to partition by the export key instead.

tests/test_kafka_contract.py locks both functions so payload-shape drift
fails in CI even though the sandbox has no broker or connector jar.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

from trignis_spark.sinks.base import (
    ExportContext,
    OversizePayloadError,
    Sink,
    TransientSinkError,
)
from trignis_spark.sinks.spark_file import DataFrameSink

DEFAULT_MAX_MESSAGE_BYTES = 1024 * 1024  # reference Kafka cap
#: the reference's 30 s delivery bound (ProducerConfig.MessageTimeoutMs is a
#: librdkafka config; Spark's connector uses the *Java* producer, where the
#: equivalent end-to-end bound is delivery.timeout.ms — the Java producer
#: silently ignores unknown configs, so the librdkafka key would never take
#: effect and the Java default of 120 s would apply instead).
DELIVERY_TIMEOUT_MS = 30000
REQUEST_TIMEOUT_MS = 15000  # per-request bound; must be <= delivery timeout

#: header schema the Kafka connector expects for the headers column
HEADERS_DDL = "array<struct<key: string, value: binary>>"
FRAME_DDL = f"key binary, value string, headers {HEADERS_DDL}"

_SASL_MECHANISMS = {
    "SCRAM-SHA-256": "SCRAM-SHA-256",
    "SCRAM-SHA-512": "SCRAM-SHA-512",
}
_SECURITY_PROTOCOLS = {
    "SSL": "SSL",
    "SASL_PLAINTEXT": "SASL_PLAINTEXT",
}


def producer_options(
    bootstrap_servers: str,
    username: str | None = None,
    password: str | None = None,
    sasl_mechanism: str | None = None,
    security_protocol: str | None = None,
) -> dict[str, str]:
    """``kafka.*`` options for ``.write.format("kafka")``, mirroring the
    reference's producer config switch: unknown SASL mechanisms fall
    back to PLAIN, unknown security protocols to SASL_SSL; credentials
    absent + SSL requested → plain SSL."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "kafka.acks": "all",
        "kafka.delivery.timeout.ms": str(DELIVERY_TIMEOUT_MS),
        "kafka.request.timeout.ms": str(REQUEST_TIMEOUT_MS),
        "kafka.max.request.size": str(DEFAULT_MAX_MESSAGE_BYTES),
    }
    if username and password:
        mech = _SASL_MECHANISMS.get((sasl_mechanism or "").upper(), "PLAIN")
        proto = _SECURITY_PROTOCOLS.get(
            (security_protocol or "").upper(), "SASL_SSL"
        )
        opts["kafka.security.protocol"] = proto
        opts["kafka.sasl.mechanism"] = mech
        module = (
            "org.apache.kafka.common.security.scram.ScramLoginModule"
            if mech.startswith("SCRAM")
            else "org.apache.kafka.common.security.plain.PlainLoginModule"
        )
        opts["kafka.sasl.jaas.config"] = (
            f'{module} required username="{username}" password="{password}";'
        )
    elif (security_protocol or "").upper() == "SSL":
        opts["kafka.security.protocol"] = "SSL"
    return opts


def build_frame(
    spark,
    payload: str,
    ctx: ExportContext,
    correlation_id: str | None = None,
    source: str = "trignis-spark",
    key_from_ctx: bool = False,
    max_message_bytes: int = DEFAULT_MAX_MESSAGE_BYTES,
) -> DataFrame:
    """The exact single-message DataFrame handed to the connector.

    Raises :class:`OversizePayloadError` above the 1 MB reference cap —
    checked *before* any Spark work, same order as the reference (cap
    precedes produce)."""
    body = payload.encode("utf-8")
    if len(body) > max_message_bytes:
        raise OversizePayloadError(
            f"message {len(body)}B exceeds Kafka cap {max_message_bytes}B"
        )
    corr = correlation_id or str(uuid.uuid4())
    key = (ctx.key or ctx.object_name).encode("utf-8") if key_from_ctx else None
    headers = [
        ("content-type", b"application/json"),
        ("correlation-id", corr.encode("utf-8")),
        ("source", f"{source}/{ctx.environment}/{ctx.object_name}".encode("utf-8")),
    ]
    return spark.createDataFrame([(key, payload, headers)], FRAME_DDL)


def build_batch_frame(
    batch: DataFrame,
    ctx: ExportContext,
    metadata: dict | None = None,
    correlation_id: str | None = None,
    source: str = "trignis-spark",
    key_col: str = "version",
) -> DataFrame:
    """The connector-bound DataFrame for a whole change batch: one Kafka
    record per change row, serialized *on executors* (`to_json` over the
    row struct — the driver never sees a payload). Key = the version
    column (ordering affinity per partition); headers carry the same
    content-type/correlation-id/source triple as the per-payload sink,
    plus the envelope metadata JSON so consumers can reassemble batch
    context without a side channel."""
    corr = correlation_id or str(uuid.uuid4())
    hdrs = [
        ("content-type", b"application/json"),
        ("correlation-id", corr.encode("utf-8")),
        ("source", f"{source}/{ctx.environment}/{ctx.object_name}".encode("utf-8")),
    ]
    if metadata:
        import json as _json

        hdrs.append(
            ("batch-metadata",
             _json.dumps(metadata, separators=(",", ":")).encode("utf-8"))
        )
    from pyspark.sql import functions as F

    header_col = F.array(
        *[
            F.struct(
                F.lit(k).alias("key"), F.lit(v).alias("value")
            )
            for k, v in hdrs
        ]
    )
    return batch.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in batch.columns])).alias(
            "value"
        ),
        header_col.alias("headers"),
    )


class KafkaDataFrameSink(DataFrameSink):
    """Distributed Kafka export (df_sinks path): the change batch stays
    on executors end to end — serialization via ``to_json`` per
    partition, produce via the native connector. The per-payload
    :class:`KafkaSink` is the reference-shaped envelope path; this is
    the 100 TB path (an initial full sync must never funnel through a
    driver-side envelope)."""

    def __init__(
        self,
        name: str,
        topic: str,
        bootstrap_servers: str = "localhost:9092",
        source: str = "trignis-spark",
        **auth,
    ):
        if not topic:
            raise ValueError("Kafka Topic is required")
        if not bootstrap_servers:
            raise ValueError("Kafka BootstrapServers is required")
        self.name = name
        self.topic = topic
        self.bootstrap_servers = bootstrap_servers
        self.source = source
        self.auth = auth

    def write_df(self, batch: DataFrame, ctx: ExportContext,
                 metadata: dict) -> None:
        frame = build_batch_frame(
            batch, ctx, metadata, source=self.source
        )
        opts = producer_options(self.bootstrap_servers, **self.auth)
        (
            frame.write.format("kafka")
            .options(**opts)
            .option("topic", self.topic)
            .save()
        )


class KafkaSink(Sink):
    """Per-payload Sink adapter over the native connector write."""

    def __init__(
        self,
        name: str,
        topic: str,
        bootstrap_servers: str = "localhost:9092",
        max_message_bytes: int = DEFAULT_MAX_MESSAGE_BYTES,
        spark=None,
        source: str = "trignis-spark",
        key_from_ctx: bool = False,
        **auth,
    ):
        if not topic:
            raise ValueError("Kafka Topic is required")
        if not bootstrap_servers:
            raise ValueError("Kafka BootstrapServers is required")
        self.name = name
        self.topic = topic
        self.bootstrap_servers = bootstrap_servers
        self.max_message_bytes = max_message_bytes
        self.spark = spark
        self.source = source
        self.key_from_ctx = key_from_ctx
        self.auth = auth

    def write(self, payload: str, ctx: ExportContext) -> None:
        # Oversize is a *terminal* failure (never retried) and must take
        # precedence over the retryable no-SparkSession condition.
        if len(payload.encode("utf-8")) > self.max_message_bytes:
            raise OversizePayloadError(
                f"message exceeds Kafka cap {self.max_message_bytes}B"
            )
        if self.spark is None:
            raise TransientSinkError("KafkaSink requires a SparkSession")
        df = build_frame(
            self.spark,
            payload,
            ctx,
            source=self.source,
            key_from_ctx=self.key_from_ctx,
            max_message_bytes=self.max_message_bytes,
        )
        opts = producer_options(self.bootstrap_servers, **self.auth)
        try:
            (
                df.write.format("kafka")
                .options(**opts)
                .option("topic", self.topic)
                .save()
            )
        except Exception as e:  # connector missing or broker unreachable
            raise TransientSinkError(f"kafka write failed: {e}") from e
