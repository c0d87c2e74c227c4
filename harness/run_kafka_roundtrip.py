"""Live-Kafka round trip for the native sink (K7) — the last `partial`.

EXTERNAL ONLY: needs a reachable broker (``docker compose up -d kafka``
in this directory) and the Spark Kafka connector on the classpath. The
build sandbox has neither; tests/test_kafka_contract.py locks the wire
contract broker-free, and this script closes the remaining gap: the
frames actually produce to and consume from a real broker byte-for-byte.

What it proves:

1. **Envelope path** (``KafkaSink.write`` — the reference-shaped
   per-payload message, ``MessageQueueService.cs:570-657``): one record
   lands with a null key, the JSON payload as value, and the
   content-type / correlation-id / source header triple.
2. **Distributed batch path** (``KafkaDataFrameSink.write_df`` — the
   100 TB df_sinks route): one record per change row, serialized on
   executors, keyed by version, with the batch-metadata header; the
   consumed set equals ``build_batch_frame``'s rows exactly (modulo the
   per-call correlation id, which is asserted uniform across the batch).

Usage:
    cd harness && docker compose up -d kafka
    spark-submit \
        --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 \
        run_kafka_roundtrip.py [--servers localhost:9092]
(match the connector version to your Spark install)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from trignis_spark.sinks.base import ExportContext
from trignis_spark.sinks.kafka import (
    KafkaDataFrameSink,
    KafkaSink,
    build_batch_frame,
)

CTX = ExportContext(
    environment="harness", database="trignis", object_name="items",
    key="items-1",
)


def _consume(spark: SparkSession, servers: str, topic: str):
    rows = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("includeHeaders", "true")
        .load()
        .selectExpr(
            "CAST(key AS STRING) AS key",
            "CAST(value AS STRING) AS value",
            "headers",
        )
        .collect()
    )
    return [
        (
            r["key"],
            r["value"],
            {h["key"]: bytes(h["value"]).decode("utf-8")
             for h in (r["headers"] or [])},
        )
        for r in rows
    ]


def check_envelope(spark: SparkSession, servers: str, topic: str) -> int:
    payload = json.dumps(
        {"Metadata": {"Sync": {"Version": 7, "Type": "Diff"}},
         "Data": [{"pk": 1, "label": "a"}]},
        separators=(",", ":"),
    )
    sink = KafkaSink("k7", topic=topic, bootstrap_servers=servers,
                     spark=spark)
    sink.write(payload, CTX)

    got = _consume(spark, servers, topic)
    assert len(got) == 1, f"expected 1 record, consumed {len(got)}"
    key, value, headers = got[0]
    assert key is None, f"reference produces null keys, got {key!r}"
    assert value == payload, "payload drifted on the wire"
    assert headers["content-type"] == "application/json"
    assert headers["source"] == "trignis-spark/harness/items"
    uuid.UUID(headers["correlation-id"])  # well-formed
    print(f"ENVELOPE OK: 1 record, headers {sorted(headers)}")
    return 0


def check_batch(spark: SparkSession, servers: str, topic: str) -> int:
    batch = spark.createDataFrame(
        [(v, "I" if v % 3 else "U", f"payload-{v}") for v in range(1, 26)],
        "version long, operation string, v string",
    )
    metadata = {"Sync": {"Version": 25, "Type": "Diff"}}
    sink = KafkaDataFrameSink("k7b", topic=topic, bootstrap_servers=servers)
    sink.write_df(batch, CTX, metadata)

    got = _consume(spark, servers, topic)
    want = {
        (bytes(r["key"]).decode("utf-8"), r["value"])
        for r in build_batch_frame(batch, CTX, metadata).collect()
    }
    got_kv = {(k, v) for k, v, _ in got}
    assert got_kv == want, (
        f"consumed set != build_batch_frame: only-consumed="
        f"{got_kv - want} only-expected={want - got_kv}"
    )
    corr = {h["correlation-id"] for _, _, h in got}
    assert len(corr) == 1, f"one correlation id per batch, got {corr}"
    for _, _, h in got:
        assert json.loads(h["batch-metadata"]) == metadata
        assert h["source"] == "trignis-spark/harness/items"
    print(f"BATCH OK: {len(got)} records match build_batch_frame "
          f"(key/value/headers), single correlation id")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--servers", default="localhost:9092")
    ap.add_argument("--run-id", default=uuid.uuid4().hex[:8],
                    help="suffix so reruns get fresh topics")
    args = ap.parse_args()

    spark = SparkSession.builder.master("local[4]").appName(
        "trignis-kafka-roundtrip"
    ).getOrCreate()
    rc = check_envelope(
        spark, args.servers, f"trignis-envelope-{args.run_id}"
    )
    rc |= check_batch(spark, args.servers, f"trignis-batch-{args.run_id}")
    print("KAFKA ROUND TRIP OK" if rc == 0 else "KAFKA ROUND TRIP FAILED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
