"""Atomic generation-swapped parquet state, shared by consumer-side
sinks that maintain derived state from the change feed (the mirror
table and the continuous-aggregate rollup).

Layout per tracked object: ``path/<object>/gen-<version>/`` snapshot
directories plus a ``_CURRENT`` pointer file. Readers resolve the
pointer, so they never observe a half-written snapshot; writers flip it
with an atomic ``os.replace``. Re-applying a batch whose generation
directory already exists is a pointer swap only — the at-least-once
idempotence contract every ``DataFrameSink`` in the engine follows.
At 100 TB the same protocol is delegated to a table format's atomic
commit (Delta/Iceberg); this is the dependency-free equivalent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from trignis_spark.sinks.base import ExportContext


class GenerationStore:
    """Mixin: pointer bookkeeping for generation-swapped parquet state.

    Host classes provide ``path`` (root directory) and
    ``keep_generations`` attributes.
    """

    path: str
    keep_generations: int

    def _root(self, ctx: ExportContext) -> str:
        return os.path.join(self.path, ctx.object_name)

    def _pointer(self, ctx: ExportContext) -> str:
        return os.path.join(self._root(ctx), "_CURRENT")

    def current_generation(self, ctx: ExportContext) -> str | None:
        try:
            with open(self._pointer(ctx), encoding="utf-8") as f:
                gen = f.read().strip()
        except OSError:
            return None
        full = os.path.join(self._root(ctx), gen)
        return full if os.path.isdir(full) else None

    def read_current(self, spark, ctx: ExportContext) -> DataFrame | None:
        cur = self.current_generation(ctx)
        return None if cur is None else spark.read.parquet(cur)

    def _swap(self, ctx: ExportContext, gen_name: str) -> None:
        pointer = self._pointer(ctx)
        tmp = pointer + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(gen_name)
        os.replace(tmp, pointer)  # atomic on POSIX

    def _prune(self, ctx: ExportContext, current: str) -> None:
        import shutil

        root = self._root(ctx)
        gens = sorted(
            (d for d in os.listdir(root) if d.startswith("gen-")),
            key=lambda d: int(d.split("-", 1)[1]),
        )
        for d in gens[: -self.keep_generations]:
            if d != current:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    # -- batch protocol ----------------------------------------------------

    def replay_of_applied(self, ctx: ExportContext, version) -> bool:
        """True (after re-pointing) when ``gen-<version>`` already
        exists — the at-least-once replay fast path."""
        gen_name = f"gen-{version}"
        if os.path.isdir(os.path.join(self._root(ctx), gen_name)):
            self._swap(ctx, gen_name)
            return True
        return False

    def commit_generation(
        self, state: DataFrame, ctx: ExportContext, version
    ) -> None:
        """Write ``state`` as ``gen-<version>``, flip the pointer, prune."""
        gen_name = f"gen-{version}"
        root = self._root(ctx)
        os.makedirs(root, exist_ok=True)
        state.write.mode("overwrite").parquet(os.path.join(root, gen_name))
        self._swap(ctx, gen_name)
        self._prune(ctx, gen_name)
