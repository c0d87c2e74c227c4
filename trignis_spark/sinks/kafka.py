"""Kafka sink: the one destination Spark supports first-class.

In production the export pipeline writes Kafka natively —
``batch_df.selectExpr("CAST(key AS STRING)", "to_json(struct(*)) AS value")
.write.format("kafka")`` — which keeps the whole serialize+send path on
executors (reference cap/acks/headers semantics:
``MessageQueueService.cs:570-657``). This wrapper exposes that write for
the per-payload Sink interface and degrades to an ImportError only when
actually used without the Kafka connector on the classpath.
"""

from __future__ import annotations

from trignis_spark.sinks.base import ExportContext, Sink, TransientSinkError

DEFAULT_MAX_MESSAGE_BYTES = 1024 * 1024  # reference Kafka cap


class KafkaSink(Sink):
    def __init__(
        self,
        name: str,
        topic: str,
        bootstrap_servers: str = "localhost:9092",
        max_message_bytes: int = DEFAULT_MAX_MESSAGE_BYTES,
        spark=None,
    ):
        self.name = name
        self.topic = topic
        self.bootstrap_servers = bootstrap_servers
        self.max_message_bytes = max_message_bytes
        self.spark = spark

    def write(self, payload: str, ctx: ExportContext) -> None:
        if len(payload.encode("utf-8")) > self.max_message_bytes:
            from trignis_spark.sinks.base import OversizePayloadError

            raise OversizePayloadError(
                f"message exceeds Kafka cap {self.max_message_bytes}B"
            )
        if self.spark is None:
            raise TransientSinkError("KafkaSink requires a SparkSession")
        try:
            df = self.spark.createDataFrame([(ctx.key or ctx.object_name, payload)],
                                            "key string, value string")
            (
                df.write.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrap_servers)
                .option("topic", self.topic)
                .save()
            )
        except Exception as e:  # connector missing or broker unreachable
            raise TransientSinkError(f"kafka write failed: {e}") from e
