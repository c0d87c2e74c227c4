"""Loaders for the driver-generated parquet tables (see TESTDATA.md).

Timestamp policy: everything is TIMESTAMP_NTZ so results are independent
of the session timezone (the correctness driver's session tz is not ours
to set). The generator's `events.ts` physical type has varied between
rounds — nanosecond-precision INT64 (which Spark only reads via
``legacy.parquet.nanosAsLong``) and plain µs TIMESTAMP (which infers as
NTZ directly) — so `load` inspects the parquet footer and adapts:

* ``timestamp[us/ms]`` (no UTC adjustment) → already TIMESTAMP_NTZ, pass
  through.
* ``timestamp`` with UTC adjustment (LTZ) → reinterpret the UTC instant
  as a naive timestamp, matching DuckDB's naive read.
* ``int64`` (nanos-as-long) → convert to NTZ with pure integer
  arithmetic (floor to microseconds, matching DuckDB's ns→µs read).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# microseconds-since-epoch (BIGINT) -> TIMESTAMP_NTZ, timezone-free:
# split into epoch days + time-of-day using integer div/mod only.
_US_TO_NTZ = """
    make_timestamp_ntz(
      year(date_add(DATE'1970-01-01', CAST({us} DIV 86400000000 AS INT))),
      month(date_add(DATE'1970-01-01', CAST({us} DIV 86400000000 AS INT))),
      day(date_add(DATE'1970-01-01', CAST({us} DIV 86400000000 AS INT))),
      CAST(({us} % 86400000000) DIV 3600000000 AS INT),
      CAST((({us} % 86400000000) % 3600000000) DIV 60000000 AS INT),
      CAST(({us} % 60000000) AS DECIMAL(16,6)) / 1000000
    )
"""
_NS_TO_NTZ = _US_TO_NTZ.format(us="(ts DIV 1000)")
# LTZ parquet (UTC-adjusted): unix_micros is the UTC instant; rebuilding the
# NTZ from it yields the UTC wall clock regardless of session timezone.
_LTZ_TO_NTZ = _US_TO_NTZ.format(us="unix_micros(ts)")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # ns-as-long era: integer-arithmetic conversion to NTZ.
            return df.withColumn("ts", F.expr(_NS_TO_NTZ))
        if isinstance(ts_type, TimestampType):
            # UTC-adjusted (LTZ) parquet: reinterpret the UTC instant as a
            # naive timestamp so results stay session-tz independent.
            return df.withColumn("ts", F.expr(_LTZ_TO_NTZ))
        return df  # already TIMESTAMP_NTZ
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}
