"""Kafka wire-contract tests — no broker required.

The sandbox has neither a Kafka broker nor the spark-sql-kafka connector
jar, so the end-to-end produce can't run here. These tests instead lock
the exact contract the connector receives — the message DataFrame
(key/value/headers) and the producer options — against the reference's
message layout (``MessageQueueService.cs:570-657``): null key, JSON
value, ``content-type``/``correlation-id``/``source`` headers,
``acks=all``, 30 s delivery timeout, 1 MB cap. Any drift in the payload
shape fails these tests even though no record is ever produced.
"""

import pytest

from trignis_spark.sinks.base import ExportContext, OversizePayloadError
from trignis_spark.sinks.kafka import (
    DEFAULT_MAX_MESSAGE_BYTES,
    KafkaSink,
    build_frame,
    producer_options,
)

CTX = ExportContext(environment="prod", database="app", object_name="orders",
                    key="orders-42")


def test_frame_schema_matches_connector_contract(spark):
    df = build_frame(spark, '{"a":1}', CTX, correlation_id="c-1")
    assert df.schema.simpleString() == (
        "struct<key:binary,value:string,"
        "headers:array<struct<key:string,value:binary>>>"
    )


def test_frame_is_reference_message_layout(spark):
    row = build_frame(spark, '{"a":1}', CTX, correlation_id="c-1").first()
    # reference produces Message<Null, string>: key-less by default
    assert row["key"] is None
    assert row["value"] == '{"a":1}'
    headers = {h["key"]: bytes(h["value"]) for h in row["headers"]}
    assert headers["content-type"] == b"application/json"
    assert headers["correlation-id"] == b"c-1"
    assert headers["source"] == b"trignis-spark/prod/orders"
    # header order is part of the layout (content-type, correlation, source)
    assert [h["key"] for h in row["headers"]] == [
        "content-type", "correlation-id", "source",
    ]


def test_frame_opt_in_key_partitioning(spark):
    row = build_frame(spark, "{}", CTX, key_from_ctx=True).first()
    assert bytes(row["key"]) == b"orders-42"


def test_oversize_rejected_before_any_spark_work():
    big = "x" * (DEFAULT_MAX_MESSAGE_BYTES + 1)
    with pytest.raises(OversizePayloadError):
        build_frame(None, big, CTX)  # spark=None proves the cap fires first


def test_producer_options_plain():
    # The 30 s delivery bound must be expressed as the *Java* producer's
    # delivery.timeout.ms: Spark's connector uses the Java client, which
    # ignores unknown configs, so the librdkafka message.timeout.ms key
    # would silently never take effect (Java default: 120 s).
    opts = producer_options("broker:9092")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "kafka.acks": "all",
        "kafka.delivery.timeout.ms": "30000",
        "kafka.request.timeout.ms": "15000",
        "kafka.max.request.size": str(DEFAULT_MAX_MESSAGE_BYTES),
    }
    assert "kafka.message.timeout.ms" not in opts


def test_producer_options_sasl_switch():
    # reference switch: SCRAM-SHA-256/512 recognized, anything else PLAIN;
    # protocols SSL/SASL_PLAINTEXT recognized, anything else SASL_SSL
    o = producer_options("b:9092", username="u", password="p",
                         sasl_mechanism="scram-sha-512",
                         security_protocol="sasl_plaintext")
    assert o["kafka.sasl.mechanism"] == "SCRAM-SHA-512"
    assert o["kafka.security.protocol"] == "SASL_PLAINTEXT"
    assert "ScramLoginModule" in o["kafka.sasl.jaas.config"]

    o = producer_options("b:9092", username="u", password="p",
                         sasl_mechanism="weird")
    assert o["kafka.sasl.mechanism"] == "PLAIN"
    assert o["kafka.security.protocol"] == "SASL_SSL"
    assert "PlainLoginModule" in o["kafka.sasl.jaas.config"]


def test_producer_options_ssl_without_credentials():
    o = producer_options("b:9092", security_protocol="SSL")
    assert o["kafka.security.protocol"] == "SSL"
    assert "kafka.sasl.mechanism" not in o


def test_sink_oversize_precedes_missing_session():
    # terminal (never-retried) oversize must win over the retryable
    # no-SparkSession condition — classification drives DLQ replay policy
    sink = KafkaSink("k", topic="t", spark=None, max_message_bytes=8)
    with pytest.raises(OversizePayloadError):
        sink.write("x" * 9, CTX)


def test_sink_requires_topic_and_servers():
    # reference throws InvalidOperationException on missing config
    with pytest.raises(ValueError):
        KafkaSink("k", topic="")
    with pytest.raises(ValueError):
        KafkaSink("k", topic="t", bootstrap_servers="")


# -- distributed batch export (df_sinks path) ------------------------------


def test_batch_frame_one_record_per_row_serialized_executor_side(spark):
    import json

    from trignis_spark.sinks.kafka import build_batch_frame

    batch = spark.createDataFrame(
        [(5, "I", "x"), (6, "U", "y")], "version long, op string, v string"
    )
    rows = build_batch_frame(
        batch, CTX, {"Sync": {"Version": 6, "Type": "Diff"}},
        correlation_id="c-9",
    ).orderBy("key").collect()
    assert [bytes(r["key"]) for r in rows] == [b"5", b"6"]
    assert json.loads(rows[0]["value"]) == {"version": 5, "op": "I", "v": "x"}
    headers = {h["key"]: bytes(h["value"]) for h in rows[0]["headers"]}
    assert headers["correlation-id"] == b"c-9"
    assert json.loads(headers["batch-metadata"]) == {
        "Sync": {"Version": 6, "Type": "Diff"}
    }
    # same schema contract as the per-payload frame
    df = build_batch_frame(batch, CTX)
    assert df.schema.simpleString() == (
        "struct<key:binary,value:string,"
        "headers:array<struct<key:string,value:binary>>>"
    )


def test_batch_sink_requires_topic_and_servers():
    from trignis_spark.sinks.kafka import KafkaDataFrameSink

    with pytest.raises(ValueError):
        KafkaDataFrameSink("k", topic="")
    with pytest.raises(ValueError):
        KafkaDataFrameSink("k", topic="t", bootstrap_servers="")


def test_config_routes_kafka_distributed_to_df_sink():
    from trignis_spark.sinks import build_sink
    from trignis_spark.sinks.kafka import KafkaDataFrameSink
    from trignis_spark.sinks.spark_file import DataFrameSink

    s = build_sink("kafka-distributed", "kd",
                   {"topic": "t", "bootstrap_servers": "b:9092"})
    assert isinstance(s, KafkaDataFrameSink)
    # MUST be a DataFrameSink: the service splits df_sinks from envelope
    # sinks by this isinstance check (service.py), and a misclassified
    # sink would be handed string payloads it cannot write
    assert isinstance(s, DataFrameSink)
