"""Parquet outbox source: batch + Structured Streaming readers.

An append-only directory of parquet files with a monotone version
column is the file-system twin of the PG outbox table — each new file
is a committed batch of change events. The streaming reader uses
Spark's file source (exactly-once file tracking in the checkpoint), so
offset management (T2/T4) is the stream's native offset log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: The engine's change-event schema over the outbox (FIXTURES F2 shape).
OUTBOX_FIELDS = (
    "version long, xact_id long, operation string, user_key long, "
    "changed array<string>, ts timestamp, value double, props string"
)


def outbox_schema() -> StructType:
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(OUTBOX_FIELDS)


def read_outbox(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    return spark.read.schema(schema or outbox_schema()).parquet(path)


def stream_outbox(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """T1/T4/T5: streaming outbox scan. ``maxFilesPerTrigger`` is the
    micro-batch size governor (≙ maxOffsetsPerTrigger)."""
    reader = spark.readStream.schema(schema or outbox_schema())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)
