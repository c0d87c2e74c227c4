"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``trignis_spark.queries`` — see that module for the
operator inventory and determinism rules, and SURVEY.md §2 for the
operator ↔ reference mapping.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trignis_spark import queries as _q
from trignis_spark.operators import changefeed as _cf
from trignis_spark.tables import load as _load


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one full change-feed poll cycle over sf0.001 events —
    incremental horizon-bounded outbox scan → no-op-update filter →
    per-column $changed masking → base-table enrichment (the reference's
    hot path, ChangeTrackingBackgroundService.cs:427-606, in miniature).
    """
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    outbox = _cf.events_as_outbox(_load(spark, sf_dir, "events"))
    horizon = _load(spark, sf_dir, "events").agg(F.max("event_id") - 2).first()[0]
    scan = _cf.outbox_scan(outbox, from_version=_q.WM, horizon=horizon)
    masked = _cf.mask_columns(
        _cf.changed_filter(scan), tracked=("event_type", "value", "props")
    )
    base = _load(spark, sf_dir, "customer")
    return masked.join(
        F.broadcast(base), masked.user_key == base.c_custkey, "left_outer"
    ).select(
        "version", "operation", "user_key",
        F.array_join("changed", ",").alias("changed_cols"),
        "event_type", "value", "props", "c_name", "c_mktsegment",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
