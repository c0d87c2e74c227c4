"""Storage maintenance: small-file compaction for append-heavy stores.

Every per-epoch append (the ingestion gate's accepted store, the
parquet outbox, partitioned file sinks) adds a file per micro-batch —
at a 30 s poll interval that is ~2,880 files/day/object, and within
weeks scans are dominated by file-open overhead and driver-side
listing, the classic Spark small-files failure mode. The reference has
the same hygiene loop in miniature (directory-size eviction,
``FileExportService.cs``); at Spark scale the fix is rewriting many
small files into few right-sized ones.

``compact_parquet_dir`` rewrites a directory into
``ceil(bytes / target_file_bytes)`` files via an atomic
generation swap (``sinks/generations.py``): readers resolving the
``_CURRENT`` pointer never see a half-compacted state, and a crashed
compaction leaves the previous generation intact. Contract: one
maintenance writer at a time per store (run it from the housekeeping
loop, like DLQ purge); concurrent *appends* during compaction are not
lost — they land in the source directory, which stays the append
target, and the next compaction folds them in.

Reading through ``compacted_or_raw`` prefers the compacted generation
plus any files appended after it (by file modification order the
appends are newer than the compaction watermark recorded in the
pointer sidecar) — so compaction is transparent to readers and never
blocks the write path.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

from trignis_spark.sinks.base import ExportContext
from trignis_spark.sinks.generations import GenerationStore

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # HDFS-block-ish


def _data_files(path: str) -> list[str]:
    out = []
    for root, dirs, files in os.walk(path):
        # never fold compaction output back in as input (Spark reads
        # also skip it: _-prefixed paths are metadata by convention)
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)


class ParquetCompactor(GenerationStore):
    """Compact one append-only parquet directory into right-sized files.

    Layout: appends land in ``path/`` (flat files); compacted
    generations live in ``path/_compacted/<object>/gen-<n>`` managed by
    :class:`GenerationStore`. The generation version is the count of
    source files folded in, so re-running compaction with no new
    appends is a no-op (same version ⇒ replay fast path).
    """

    def __init__(self, path: str,
                 target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES):
        self.path = os.path.join(path, "_compacted")
        self.source = path
        self.target_file_bytes = target_file_bytes
        self.keep_generations = 1
        self._ctx = ExportContext(object_name="store")

    # -- state -------------------------------------------------------------

    def _watermark_file(self) -> str:
        return os.path.join(self._root(self._ctx), "_SOURCES")

    def _compacted_sources(self) -> list[str]:
        try:
            with open(self._watermark_file(), encoding="utf-8") as f:
                return [ln.strip() for ln in f if ln.strip()]
        except OSError:
            return []

    # -- maintenance entry point -------------------------------------------

    def compact(self, spark: SparkSession) -> int:
        """Rewrite all current source files into few right-sized files.
        Returns the number of output files (0 = nothing to compact)."""
        files = _data_files(self.source)
        if not files:
            return 0
        version = len(files)
        if self.replay_of_applied(self._ctx, version):
            return 0  # same inputs already compacted
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, math.ceil(total / self.target_file_bytes))
        df = spark.read.parquet(*files)
        self.commit_generation(df.repartition(n_out), self._ctx, version)
        with open(self._watermark_file(), "w", encoding="utf-8") as f:
            f.write("\n".join(files))
        return n_out

    # -- read path ----------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        """Compacted generation plus any appends newer than it; falls
        back to the raw directory when nothing was compacted yet."""
        cur = self.current_generation(self._ctx)
        if cur is None:
            return spark.read.parquet(self.source)
        folded = set(self._compacted_sources())
        fresh = [f for f in _data_files(self.source) if f not in folded]
        paths = [cur, *fresh]
        return spark.read.parquet(*paths)
