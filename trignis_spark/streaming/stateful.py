"""Custom stateful streaming operators via ``applyInPandasWithState``.

The Spark-idiomatic home for operator state that must survive across
micro-batches (SURVEY §2.8's "stateful control" family). Two operators:

- ``running_watermarks``: per-key cumulative (last_version, total_rows,
  batches_seen) — the streaming-native form of the ``LastVersions``
  table: state lives in the checkpointed state store, keyed by tracked
  object, updated incrementally per micro-batch instead of re-scanned.
- ``sessionize``: classic event-time sessionization with an idle-gap
  timeout — groups a user's events into sessions closed by a
  processing-timeout, the pattern the reference cannot express at all
  (its state is one integer per object) and a training-data pipeline
  needs for clickstream-style corpus assembly.

State is Arrow-batched per group (one pandas DataFrame per key per
micro-batch); at 100 TB the state store shards by key across
executors — no driver-side state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

WATERMARK_OUTPUT = StructType(
    [
        StructField("object_key", StringType()),
        StructField("last_version", LongType()),
        StructField("total_rows", LongType()),
        StructField("batches_seen", LongType()),
    ]
)
WATERMARK_STATE = StructType(
    [
        StructField("last_version", LongType()),
        StructField("total_rows", LongType()),
        StructField("batches_seen", LongType()),
    ]
)


def _update_watermark(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (object_key,) = key
    last_version, total_rows, batches = (
        state.get if state.exists else (0, 0, 0)
    )
    batch_rows = 0
    batch_max = last_version
    for pdf in pdfs:
        batch_rows += len(pdf)
        if len(pdf):
            batch_max = max(batch_max, int(pdf["version"].max()))
    total_rows += batch_rows
    batches += 1
    state.update((batch_max, total_rows, batches))
    yield pd.DataFrame(
        {
            "object_key": [object_key],
            "last_version": [batch_max],
            "total_rows": [total_rows],
            "batches_seen": [batches],
        }
    )


def running_watermarks(stream_df: DataFrame, key_col: str = "operation") -> DataFrame:
    """Per-key cumulative watermark state across micro-batches."""
    return stream_df.groupBy(key_col).applyInPandasWithState(
        _update_watermark,
        outputStructType=WATERMARK_OUTPUT,
        stateStructType=WATERMARK_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT = StructType(
    [
        StructField("user_key", LongType()),
        StructField("session_events", LongType()),
        StructField("first_version", LongType()),
        StructField("last_version", LongType()),
    ]
)
SESSION_STATE = StructType(
    [
        StructField("session_events", LongType()),
        StructField("first_version", LongType()),
        StructField("last_version", LongType()),
    ]
)


def _update_session(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_key,) = key
    if state.hasTimedOut:
        n, first_v, last_v = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_key": [user_key],
                "session_events": [n],
                "first_version": [first_v],
                "last_version": [last_v],
            }
        )
        return
    n, first_v, last_v = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        lo, hi = int(pdf["version"].min()), int(pdf["version"].max())
        first_v = lo if first_v is None else min(first_v, lo)
        last_v = hi if last_v is None else max(last_v, hi)
    state.update((n, first_v, last_v))
    state.setTimeoutDuration(30_000)  # close the session after 30 s idle
    yield pd.DataFrame(
        {
            "user_key": [],
            "session_events": [],
            "first_version": [],
            "last_version": [],
        }
    )


def sessionize(stream_df: DataFrame) -> DataFrame:
    """Idle-gap sessionization: emits a session row when a user's state
    times out with no new events."""
    return stream_df.groupBy("user_key").applyInPandasWithState(
        _update_session,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
