"""Dead-letter store: hash-deduped failed payloads with exponential
backoff replay scheduling and retention purge.

Mirrors the reference's ``sinkhole.db`` (SURVEY §2.8 T9/T10, FIXTURES
F5): ``DeadLetters(id, source_key, tracking_object_name,
environment_name, database_name, data_hash, data, error_message,
timestamp, attempts, next_attempt)`` with UNIQUE(source_key, data_hash)
(``DeadLetterService.cs:36-72,90-144``). Replay policy:
oldest-first batches of 25, max 5 attempts, backoff 60s·2^attempts
capped at 6h (``DeadLetterReplayService.cs:20-23,137-141``); unroutable
rows parked ~1 year (``:109-115``); manual replay resets the attempt
counter (``Program.cs:458-462``).

Same storage stance as ``trignis_spark.state``: the DLQ is metadata-
scale (failures, not the firehose), so mutations are driver-side with
atomic parquet swap, while ``as_dataframe`` exposes it to Spark for the
monitor aggregations (A4–A6) and scale-out replay scans.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from trignis_spark.state import _ParquetKV, _utcnow

#: Replay policy defaults (reference values).
REPLAY_BATCH_SIZE = 25
MAX_ATTEMPTS = 5
BACKOFF_BASE_SECONDS = 60
BACKOFF_CAP_SECONDS = 6 * 3600
UNROUTABLE_PARK_DAYS = 365
RETENTION_DAYS = 60

_DLQ_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("source_key", pa.string()),
        ("tracking_object_name", pa.string()),
        ("environment_name", pa.string()),
        ("database_name", pa.string()),
        ("data_hash", pa.string()),
        ("data", pa.string()),
        ("error_message", pa.string()),
        ("timestamp", pa.timestamp("us")),
        ("attempts", pa.int32()),
        ("next_attempt", pa.timestamp("us")),
    ]
)


def backoff_seconds(attempts: int, base: int = BACKOFF_BASE_SECONDS,
                    cap: int = BACKOFF_CAP_SECONDS) -> int:
    """Pure backoff function: base·2^attempts, capped (unit-testable like
    the reference's ``DeadLetterReplayService.Backoff``)."""
    return min(base * (2 ** attempts), cap)


def payload_hash(data: str) -> str:
    return hashlib.sha256(data.encode("utf-8")).hexdigest()


class DeadLetterStore:
    def __init__(self, root: str):
        self._kv = _ParquetKV(os.path.join(root, "dead_letters.parquet"), _DLQ_SCHEMA)

    # -- capture ----------------------------------------------------------

    def save(
        self,
        source_key: str,
        tracking_object_name: str,
        environment_name: str,
        database_name: str,
        data: str,
        error_message: str,
        now: dt.datetime | None = None,
    ) -> bool:
        """Insert if no row with the same (source_key, data_hash) exists.

        Returns True when stored, False when deduplicated (the UNIQUE
        constraint semantics, ``DeadLetterService.cs:106-136``).
        """
        now = now or _utcnow()
        h = payload_hash(data)
        rows = self._kv.read()
        if any(r["source_key"] == source_key and r["data_hash"] == h for r in rows):
            return False
        rows.append(
            {
                "id": (max((r["id"] for r in rows), default=0) + 1),
                "source_key": source_key,
                "tracking_object_name": tracking_object_name,
                "environment_name": environment_name,
                "database_name": database_name,
                "data_hash": h,
                "data": data,
                "error_message": error_message,
                "timestamp": now,
                "attempts": 0,
                "next_attempt": now,
            }
        )
        self._kv.write(rows)
        return True

    # -- replay scheduling -------------------------------------------------

    def due_for_replay(
        self,
        now: dt.datetime | None = None,
        max_attempts: int = MAX_ATTEMPTS,
        limit: int = REPLAY_BATCH_SIZE,
    ) -> list[dict]:
        """Oldest-first batch of rows whose backoff has elapsed
        (``DeadLetterService.cs:202-227``: attempts < max, next_attempt
        due, environment routable)."""
        now = now or _utcnow()
        due = [
            r
            for r in self._kv.read()
            if r["attempts"] < max_attempts
            and r["next_attempt"] <= now
            and r["environment_name"] is not None
        ]
        due.sort(key=lambda r: (r["timestamp"], r["id"]))
        return due[:limit]

    def record_failure(self, dlq_id: int, now: dt.datetime | None = None) -> None:
        """attempts += 1; next_attempt = now + backoff(attempts)."""
        now = now or _utcnow()
        rows = self._kv.read()
        for r in rows:
            if r["id"] == dlq_id:
                r["attempts"] += 1
                r["next_attempt"] = now + dt.timedelta(
                    seconds=backoff_seconds(r["attempts"])
                )
        self._kv.write(rows)

    def park_unroutable(self, dlq_id: int, now: dt.datetime | None = None) -> None:
        """No current environment/object route: park ~1 year."""
        now = now or _utcnow()
        rows = self._kv.read()
        for r in rows:
            if r["id"] == dlq_id:
                r["attempts"] += 1
                r["next_attempt"] = now + dt.timedelta(days=UNROUTABLE_PARK_DAYS)
        self._kv.write(rows)

    def reset_attempts(self, dlq_id: int, now: dt.datetime | None = None) -> None:
        """Manual replay rejoin: failed manual replays reset the counter."""
        now = now or _utcnow()
        rows = self._kv.read()
        for r in rows:
            if r["id"] == dlq_id:
                r["attempts"] = 0
                r["next_attempt"] = now
        self._kv.write(rows)

    def delete(self, dlq_id: int) -> bool:
        rows = self._kv.read()
        kept = [r for r in rows if r["id"] != dlq_id]
        if len(kept) == len(rows):
            return False
        self._kv.write(kept)
        return True

    def purge_older_than(
        self, retention_days: int = RETENTION_DAYS, now: dt.datetime | None = None
    ) -> int:
        """T10 retention purge; returns number of rows removed."""
        now = now or _utcnow()
        cutoff = now - dt.timedelta(days=retention_days)
        rows = self._kv.read()
        kept = [r for r in rows if r["timestamp"] >= cutoff]
        removed = len(rows) - len(kept)
        if removed:
            self._kv.write(kept)
        return removed

    # -- introspection -----------------------------------------------------

    def rows(self) -> list[dict]:
        return self._kv.read()

    def get(self, dlq_id: int) -> dict | None:
        for r in self._kv.read():
            if r["id"] == dlq_id:
                return r
        return None

    @staticmethod
    def _matches(r: dict, search: str | None, object_filter: str | None) -> bool:
        """The dead-letter UI filter (``Program.cs:694-699``): search is a
        substring over object/error/database; object_filter is exact."""
        if object_filter and r["tracking_object_name"] != object_filter:
            return False
        if search:
            s = search.lower()
            return any(
                s in (r[f] or "").lower()
                for f in ("tracking_object_name", "error_message", "database_name")
            )
        return True

    def page(
        self,
        page: int = 1,
        page_size: int = 50,
        search: str | None = None,
        object_filter: str | None = None,
    ) -> tuple[int, list[dict]]:
        """Paginated newest-first listing (W3: ``ORDER BY Timestamp DESC
        LIMIT @pageSize OFFSET @offset``, ``Program.cs:708-717``).
        Returns (total matching, this page's rows)."""
        matching = [
            r for r in self._kv.read()
            if self._matches(r, search, object_filter)
        ]
        matching.sort(key=lambda r: (r["timestamp"], r["id"]), reverse=True)
        off = (max(page, 1) - 1) * page_size
        return len(matching), matching[off : off + page_size]

    def purge_matching(
        self, search: str | None = None, object_filter: str | None = None
    ) -> int:
        """Purge exactly what the filter selects, so the UI cannot delete
        more than it shows (``Program.cs:489-498``)."""
        rows = self._kv.read()
        kept = [r for r in rows if not self._matches(r, search, object_filter)]
        removed = len(rows) - len(kept)
        if removed:
            self._kv.write(kept)
        return removed

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql.types import (
            IntegerType,
            LongType,
            StringType,
            StructField,
            StructType,
            TimestampNTZType,
        )

        schema = StructType(
            [
                StructField("id", LongType()),
                StructField("source_key", StringType()),
                StructField("tracking_object_name", StringType()),
                StructField("environment_name", StringType()),
                StructField("database_name", StringType()),
                StructField("data_hash", StringType()),
                StructField("data", StringType()),
                StructField("error_message", StringType()),
                StructField("timestamp", TimestampNTZType()),
                StructField("attempts", IntegerType()),
                StructField("next_attempt", TimestampNTZType()),
            ]
        )
        rows = [
            tuple(r[f.name] for f in schema.fields) for r in self._kv.read()
        ]
        return spark.createDataFrame(rows, schema)
