"""Watermark + pause state, parquet-backed with upsert semantics.

Mirrors the reference's SQLite ``state.db`` tables (SURVEY §1.1, FIXTURES
F5): ``LastVersions(environment_name, object_name, last_version,
last_updated)`` unique per (env, object)
(``ChangeTrackingBackgroundService.cs:159-173,608-642``) and
``Pauses(scope, reason, paused_by, paused_at)``
(``PauseService.cs:28-48``).

State is deliberately tiny (one row per tracked object), so upserts are
driver-side pyarrow writes with an atomic file swap — spinning up a
distributed job for a 5-row MERGE would be the wrong tool. The tables
remain plain parquet, so the data plane can join them at any scale
(``as_dataframe``), and "delete the row to reset" keeps the reference's
operational semantics (``Program.cs:401-432``).
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

_VERSIONS_SCHEMA = pa.schema(
    [
        ("environment_name", pa.string()),
        ("object_name", pa.string()),
        ("last_version", pa.int64()),
        ("last_updated", pa.timestamp("us")),
    ]
)

_PAUSES_SCHEMA = pa.schema(
    [
        ("scope", pa.string()),
        ("reason", pa.string()),
        ("paused_by", pa.string()),
        ("paused_at", pa.timestamp("us")),
    ]
)


def _utcnow() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


class _ParquetKV:
    """A small parquet table with atomic whole-file replace."""

    def __init__(self, path: str, schema: pa.Schema):
        self.path = path
        self.schema = schema
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        return pq.read_table(self.path).to_pylist()

    def write(self, rows: list[dict]) -> None:
        table = pa.Table.from_pylist(rows, schema=self.schema)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(self.path), suffix=".parquet.tmp"
        )
        os.close(fd)
        try:
            pq.write_table(table, tmp)
            os.replace(tmp, self.path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)


class StateStore:
    """Per-(environment, object) watermark store with upsert semantics."""

    def __init__(self, root: str):
        self._kv = _ParquetKV(os.path.join(root, "last_versions.parquet"), _VERSIONS_SCHEMA)

    def get_last_version(self, env: str, obj: str) -> int | None:
        for row in self._kv.read():
            if row["environment_name"] == env and row["object_name"] == obj:
                return row["last_version"]
        return None

    def set_last_version(self, env: str, obj: str, version: int) -> None:
        """Upsert ≙ ``INSERT ... ON CONFLICT(env, object) DO UPDATE``."""
        rows = [
            r
            for r in self._kv.read()
            if not (r["environment_name"] == env and r["object_name"] == obj)
        ]
        rows.append(
            {
                "environment_name": env,
                "object_name": obj,
                "last_version": int(version),
                "last_updated": _utcnow(),
            }
        )
        self._kv.write(rows)

    def reset(self, env: str, obj: str) -> bool:
        """T13: delete the watermark row; next cycle re-initializes per
        the object's InitialSyncMode."""
        rows = self._kv.read()
        kept = [
            r
            for r in rows
            if not (r["environment_name"] == env and r["object_name"] == obj)
        ]
        if len(kept) == len(rows):
            return False
        self._kv.write(kept)
        return True

    def rows(self) -> list[dict]:
        """All watermark rows, (environment, object)-sorted — the
        ``/health/state`` read shape (``Program.cs:900-983``)."""
        return sorted(
            self._kv.read(),
            key=lambda r: (r["environment_name"], r["object_name"]),
        )

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        rows = self._kv.read()
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
            TimestampNTZType,
        )

        schema = StructType(
            [
                StructField("environment_name", StringType()),
                StructField("object_name", StringType()),
                StructField("last_version", LongType()),
                StructField("last_updated", TimestampNTZType()),
            ]
        )
        return spark.createDataFrame(
            [
                (
                    r["environment_name"],
                    r["object_name"],
                    r["last_version"],
                    r["last_updated"],
                )
                for r in rows
            ],
            schema,
        )


def env_scope(env: str) -> str:
    return f"env:{env}"


def obj_scope(env: str, obj: str) -> str:
    return f"obj:{env}/{obj}"


class PauseStore:
    """Operational pause/resume scopes, surviving restarts (T11).

    Scopes are ``env:<name>`` or ``obj:<env>/<object>`` exactly as the
    reference stores them (``PauseService.cs:28-48``); pausing an
    environment implicitly pauses all its objects.
    """

    def __init__(self, root: str):
        self._kv = _ParquetKV(os.path.join(root, "pauses.parquet"), _PAUSES_SCHEMA)

    def pause(self, scope: str, reason: str = "", paused_by: str = "") -> None:
        rows = [r for r in self._kv.read() if r["scope"] != scope]
        rows.append(
            {
                "scope": scope,
                "reason": reason,
                "paused_by": paused_by,
                "paused_at": _utcnow(),
            }
        )
        self._kv.write(rows)

    def resume(self, scope: str) -> bool:
        """Returns False when the scope was not paused (resume honesty —
        ``PauseServiceTests``)."""
        rows = self._kv.read()
        kept = [r for r in rows if r["scope"] != scope]
        if len(kept) == len(rows):
            return False
        self._kv.write(kept)
        return True

    def paused_scopes(self) -> set[str]:
        return {r["scope"] for r in self._kv.read()}

    def rows(self) -> list[dict]:
        """All pause rows with reason/by/at (``/ui/api/pauses``)."""
        return sorted(self._kv.read(), key=lambda r: r["scope"])

    def is_paused(self, env: str, obj: str | None = None) -> bool:
        scopes = self.paused_scopes()
        if env_scope(env) in scopes:
            return True
        return obj is not None and obj_scope(env, obj) in scopes
