"""Sessionization: gaps-and-islands session assignment over an event stream.

The reference has no session concept (its stream is a CDC change feed),
but a training-data / product-analytics pipeline over the same events
needs it constantly: group a user's events into sessions separated by an
inactivity gap. Batch form here (two window functions — lag to mark
session starts, running sum to number them); the streaming twin is
``F.session_window`` in ``streaming/structured.py``-style jobs.

Scale notes: one shuffle on the user key; both window passes share the
same (partitionBy user, orderBy ts) sort, so Spark plans a single
exchange + sort. Skewed users (bots) are the known hazard — cap events
per user upstream or salt-split their sessions downstream.

Determinism: ordering ties broken by the event id; the gap test runs on
second-truncated timestamps so engines with different sub-second
boundary-crossing semantics (Spark ``timestampdiff`` truncates, DuckDB
``date_diff`` counts crossings) agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign ``session_no`` (1-based, per user, in time order) to every
    event. A new session starts when the second-truncated gap to the
    previous event exceeds ``gap_seconds``.

    Raises if the input already carries the internal temp columns or the
    ``session_no`` output — re-sessionizing an already-sessionized frame
    would otherwise silently clobber them (withColumn replaces same-named
    columns without warning).
    """
    reserved = {"_prev_sec", "_is_new", "session_no"}
    clash = reserved.intersection(events.columns)
    if clash:
        raise ValueError(
            f"sessionize: input already has column(s) {sorted(clash)}; "
            "rename or drop them before re-sessionizing"
        )
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    sec = F.date_trunc("second", F.col(ts_col))
    prev = F.lag(sec).over(w)
    is_new = F.when(
        F.col("_prev_sec").isNull()
        | (
            F.expr(
                f"timestampdiff(SECOND, _prev_sec, date_trunc('second', {ts_col}))"
            )
            > gap_seconds
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        events.withColumn("_prev_sec", prev)
        .withColumn("_is_new", is_new)
        .withColumn(
            "session_no",
            F.sum("_is_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .drop("_prev_sec", "_is_new")
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup: event count, start/end, exact-decimal value
    total (cast to double once, per the engine's determinism rules)."""
    s = sessionize(events, user_col, ts_col, id_col, gap_seconds)
    return s.groupBy(user_col, "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.sum(F.col(value_col).cast("decimal(20,6)"))
        .cast("double")
        .alias("total_value"),
    )
