"""Distributed export sinks: the batch never passes through the driver.

``PollPipeline``'s default export collects the batch into one JSON
envelope — exactly the reference's unit of delivery, correct for
bounded change batches. At 100 TB-scale objects (initial full syncs,
large backfills) the batch must stay distributed: these sinks take the
*DataFrame*, write it executor-parallel (partitioned parquet or
JSON-lines), and record only envelope metadata + a manifest on the
driver.

Failure/replay contract at this scale: a failed distributed write
dead-letters the batch *manifest* (environment, object, version range),
not the rows — replay re-runs the incremental scan for that version
range against the source (which is exactly what the reference's
"nothing advances on error → same rows re-fetched" path does, SURVEY
§1.4). Payload-inline dead-lettering is only for driver-sized batches.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trignis_spark.sinks.base import ExportContext, render_template


class DataFrameSink:
    """A destination that accepts a whole change-batch DataFrame."""

    name: str

    def write_df(self, batch: DataFrame, ctx: ExportContext,
                 metadata: dict) -> None:  # pragma: no cover
        raise NotImplementedError


@dataclass
class PartitionedFileSink(DataFrameSink):
    """Executor-parallel file export with an envelope-metadata sidecar.

    ``fmt``: 'parquet' (columnar, for downstream Spark consumers) or
    'json' (JSON-lines, for reference-style consumers). ``partition_by``
    spreads output by a column (e.g. operation or a date derived from
    the version) so downstream reads prune.
    """

    name: str
    path_template: str
    fmt: str = "parquet"
    partition_by: tuple[str, ...] = ()

    def write_df(self, batch: DataFrame, ctx: ExportContext, metadata: dict) -> None:
        path = render_template(self.path_template, ctx)
        writer = batch.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        if self.fmt == "parquet":
            writer.parquet(path)
        elif self.fmt == "json":
            writer.json(path)
        else:
            raise ValueError(f"unsupported format {self.fmt!r}")
        doc = json.dumps({"Metadata": metadata})
        if "://" in path:
            # remote filesystem (s3a/hdfs/...): write through Spark so the
            # sidecar lands next to the data on the same FS
            spark = batch.sparkSession
            (
                spark.createDataFrame([(doc,)], "value string")
                .coalesce(1)
                .write.mode("overwrite")
                .text(os.path.join(path, "_envelope"))
            )
        else:
            sidecar = os.path.join(path, "_envelope.json")
            with open(sidecar, "w", encoding="utf-8") as f:
                f.write(doc)


def batch_manifest(
    ctx: ExportContext, from_version: int, to_version: int, rows: int
) -> str:
    """The replayable description of a distributed batch (what gets
    dead-lettered instead of the rows)."""
    return json.dumps(
        {
            "environment": ctx.environment,
            "object": ctx.object_name,
            "from_version": from_version,
            "to_version": to_version,
            "rows": rows,
            "distributed": True,
        },
        separators=(",", ":"),
    )
