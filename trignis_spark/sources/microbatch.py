"""DataSource-V2 micro-batch outbox source (SURVEY §7.0/§7.2 step 7).

The streaming-native form of the poll loop: a Python DataSource
(``pyspark.sql.datasource``) whose stream reader carries the reference's
offset semantics — an offset is a ``{"version": v, "horizon": h}`` pair,
exactly the watermark + commit-horizon state the poller stores
(``ChangeTrackingBackgroundService.cs:608-642`` +
``02-stored-procedure.postgres.table.sql:21-31``):

- ``latestOffset`` probes the outbox and advances the version bound only
  through the current transaction horizon, so in-flight rows are
  deferred to a later batch, never skipped (T3);
- ``partitions(start, end)`` splits the ``(start.version, end.version]``
  range into parallel version-range slices — the partitioned-read scale
  path of the JDBC source, here on the offset axis;
- ``read`` executes one slice executor-side via pyarrow with the
  version/horizon predicates pushed into the parquet scan;
- Spark's checkpoint commits the offset after ``foreachBatch`` returns,
  giving the reference's watermark-advances-after-export contract (T2).

The backing store is a parquet outbox directory (the sandbox has no live
RDBMS); the offset/partition/read contract is the same one a JDBC-backed
implementation fills in with ``plan_incremental_read``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "trignis_outbox"
DEFAULT_STREAM_PARTITIONS = 4


@dataclass
class VersionRangePartition(InputPartition):
    """One version-range slice of a micro-batch: (lo, hi] under horizon."""

    lo: int
    hi: int
    horizon: int | None


def _list_parquet_files(path: str) -> list[str]:
    """Committed parquet files only. A feed directory is written by a
    CONCURRENT producer — a Spark append job mid-commit holds
    half-written part files under ``_temporary``/``.spark-staging``
    subdirectories, and a Python producer mid-``write_table`` holds a
    growing temp file. Reading either raises mid-scan
    (``OSError: Invalid column metadata`` — reproduced under disk
    contention in the round-10 soak). Immunity by construction:
    staging DIRECTORIES (leading ``_``/``.``) are pruned from the
    walk, hidden/tmp FILES are skipped, and zero-length files (created
    but not yet written) are skipped; committed files appear atomically
    via the producers' rename (Spark's commit protocol, or
    ``parquet_outbox.append_outbox_files``)."""
    if os.path.isfile(path):
        return [path]
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if not f.endswith(".parquet") or f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            try:
                if os.path.getsize(p) == 0:
                    continue
            except OSError:
                continue  # vanished mid-walk (compaction/eviction)
            out.append(p)
    return sorted(out)


def _scan_table(path: str, columns=None, filters=None):
    """Read the outbox parquet with pushed-down predicates (pyarrow)."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(_list_parquet_files(path), format="parquet")
    return dataset.to_table(columns=columns, filter=filters)


def _downcast_ns_timestamps(table):
    """Spark's Arrow intake rejects nanosecond timestamps; cast to µs
    (same convention as ``tables.load``'s nanosAsLong handling)."""
    import pyarrow as pa

    fields = [
        pa.field(f.name, pa.timestamp("us", tz=f.type.tz))
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        else f
        for f in table.schema
    ]
    new_schema = pa.schema(fields)
    if new_schema != table.schema:
        table = table.cast(new_schema)
    return table


class _OutboxStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(f"{FORMAT_NAME}: 'path' option is required")
        self.version_col = options.get("versioncolumn", "version")
        self.xact_col = options.get("xactcolumn", "xact_id")
        self.num_partitions = int(
            options.get("numpartitions", DEFAULT_STREAM_PARTITIONS)
        )
        # horizon override for tests / fixed-horizon replays; absent →
        # probe max(xact)+1 (everything currently committed is visible)
        self.fixed_horizon = (
            int(options["horizon"]) if "horizon" in options else None
        )
        # batch-size governor on the offset axis (T5; ≙ Kafka's
        # maxOffsetsPerTrigger): each offset probe advances the version
        # watermark by at most this many versions. Binds per
        # latestOffset() call — a Trigger.AvailableNow drain may probe
        # ahead and consolidate the backlog into fewer batches
        self.max_versions = (
            int(options["maxversionspertrigger"])
            if "maxversionspertrigger" in options
            else None
        )
        self._last_end: int | None = None
        self.schema_ddl = schema
        self.columns = [f.name for f in schema.fields]

    # -- offsets ----------------------------------------------------------

    def initialOffset(self) -> dict:
        self._last_end = 0
        return {"version": 0, "horizon": 0}

    def _probe(self) -> tuple[int, int]:
        """(max committed version under horizon, horizon) — the A2
        horizon-gated max, computed in one pass over the outbox."""
        import pyarrow.compute as pc

        cols = [self.version_col]
        has_xact = self.xact_col in self.columns
        if has_xact:
            cols.append(self.xact_col)
        table = _scan_table(self.path, columns=cols)
        if table.num_rows == 0:
            return 0, self.fixed_horizon or 0
        if self.fixed_horizon is not None:
            horizon = self.fixed_horizon
        elif has_xact:
            horizon = pc.max(table.column(self.xact_col)).as_py() + 1
        else:
            horizon = None
        versions = table.column(self.version_col)
        if horizon is not None and has_xact:
            import pyarrow.compute as pc2

            mask = pc2.less(table.column(self.xact_col), horizon)
            versions = pc2.filter(versions, mask)
        if len(versions) == 0:
            return 0, horizon or 0
        import pyarrow.compute as pc3

        return pc3.max(versions).as_py(), horizon or 0

    def latestOffset(self) -> dict:
        max_v, horizon = self._probe()
        if self.max_versions is not None and self._last_end is not None:
            max_v = min(max_v, self._last_end + self.max_versions)
        self._last_end = max_v
        return {"version": max_v, "horizon": horizon}

    # -- planning / reading ------------------------------------------------

    def partitions(self, start: dict, end: dict):
        lo, hi = start["version"], end["version"]
        # restart path: Spark replans from the committed offset — anchor
        # the governor there so the first capped batch resumes correctly
        if self._last_end is None or self._last_end < lo:
            self._last_end = lo
        horizon = end.get("horizon") or None
        if hi <= lo:
            return [VersionRangePartition(lo, lo, horizon)]
        n = min(self.num_partitions, hi - lo)
        span = (hi - lo) // n
        parts = []
        for i in range(n):
            p_lo = lo + i * span
            p_hi = hi if i == n - 1 else lo + (i + 1) * span
            parts.append(VersionRangePartition(p_lo, p_hi, horizon))
        return parts

    def read(self, partition: VersionRangePartition):
        import pyarrow.dataset as ds

        if partition.hi <= partition.lo:
            return iter(())
        pred = (ds.field(self.version_col) > partition.lo) & (
            ds.field(self.version_col) <= partition.hi
        )
        if partition.horizon is not None and self.xact_col in self.columns:
            pred = pred & (ds.field(self.xact_col) < partition.horizon)
        table = _scan_table(self.path, columns=self.columns, filters=pred)
        table = _downcast_ns_timestamps(table)
        # RecordBatch iteration: Arrow-native transfer, no per-row Python
        return iter(table.to_batches())

    def commit(self, end: dict) -> None:
        # Spark's checkpoint is the offset log; nothing extra to persist.
        pass


class _OutboxBatchReader(DataSourceReader):
    """Batch form: full scan (S2) through the same partition planning."""

    def __init__(self, schema, options):
        self._stream = _OutboxStreamReader(schema, options)

    def partitions(self):
        end = self._stream.latestOffset()
        return self._stream.partitions({"version": 0}, end)

    def read(self, partition):
        return self._stream.read(partition)


class OutboxDataSource(DataSource):
    """``spark.readStream.format("trignis_outbox")`` — register with
    ``spark.dataSource.register(OutboxDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        files = _list_parquet_files(self.options["path"])
        if not files:
            raise ValueError(
                f"{FORMAT_NAME}: no parquet files under {self.options['path']!r}"
            )
        return from_arrow_schema(pq.read_schema(files[0]))

    def streamReader(self, schema):
        return _OutboxStreamReader(schema, self.options)

    def reader(self, schema):
        return _OutboxBatchReader(schema, self.options)
