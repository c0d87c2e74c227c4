"""Loaders for the driver-generated parquet tables (see TESTDATA.md).

Timestamp policy: everything is TIMESTAMP_NTZ so results are independent
of the session timezone (the correctness driver's session tz is not ours
to set). The ms-precision tables already infer as NTZ; `events.ts` is
nanosecond-precision parquet, which Spark only reads via
``legacy.parquet.nanosAsLong`` — we convert the raw long to NTZ with pure
integer arithmetic (floor to microseconds, matching DuckDB's ns→µs read).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

# long nanoseconds-since-epoch -> TIMESTAMP_NTZ, timezone-free:
# split into epoch days + time-of-day using integer div/mod only.
_NS_TO_NTZ = """
    make_timestamp_ntz(
      year(date_add(DATE'1970-01-01', CAST((ts DIV 1000) DIV 86400000000 AS INT))),
      month(date_add(DATE'1970-01-01', CAST((ts DIV 1000) DIV 86400000000 AS INT))),
      day(date_add(DATE'1970-01-01', CAST((ts DIV 1000) DIV 86400000000 AS INT))),
      CAST(((ts DIV 1000) % 86400000000) DIV 3600000000 AS INT),
      CAST((((ts DIV 1000) % 86400000000) % 3600000000) DIV 60000000 AS INT),
      CAST(((ts DIV 1000) % 60000000) AS DECIMAL(16,6)) / 1000000
    )
"""


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path).withColumn("ts", F.expr(_NS_TO_NTZ))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}
