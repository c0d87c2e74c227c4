"""Change-feed operators: incremental scans, snapshot diff, masking, envelopes.

Reproduces the relational work the reference's stored procedures do inside
the source database (see SURVEY.md §2.1–2.3; reference files
``Source/SQL/02-stored-procedure.sqlserver.table.sql:31-56``,
``02-stored-procedure.postgres.table.sql:43-60``,
``02-stored-procedure.postgres.column.sql:29-44,93-101``), re-expressed as
declarative DataFrame plans so Catalyst pushes version/horizon predicates
into the scan and prunes untracked columns.

Change-event schema (reference contract
``Documentation/docs/reference/stored-procedure.md:65-70``):

  operation STRING  -- 'I' | 'U' | 'D'
  version   LONG    -- monotone; watermark domain
  changed   ARRAY<STRING> | NULL  -- update column mask; NULL = full row

Scale notes: every function here returns an *unexecuted* plan. The
version/horizon predicates are simple comparisons on a monotone column, so
against a JDBC source they push down into the remote scan, and against
parquet they become min/max-pruned filters. The snapshot-diff join is a
key-equijoin (sort-merge by default; AQE can convert to broadcast when one
snapshot is a small delta), which is the only shuffle in the feed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Reference reserved fields ($operation/$version/$changed) as plain columns.
OPERATION = "operation"
VERSION = "version"
CHANGED = "changed"

# Deterministic event_type -> operation mapping used to read the driver's
# `events` table as an outbox (FIXTURES.md maps events -> training_sessions_outbox).
_OP_EXPR = (
    "CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END"
)
# Simulated commit id: insertion order plus a small per-user commit lag, so
# ids become visible out of order exactly like the PG outbox's xact_id
# (reference 01-change-tracking-setup.postgres.sql:39-40).
_XACT_EXPR = "event_id + (user_id % 5)"
# Deterministic per-row update mask for 'U' rows.
_CHANGED_EXPR = (
    "CASE WHEN event_type = 'click' THEN array('value')"
    " WHEN event_type = 'view' THEN array('value', 'props')"
    " WHEN event_type = 'purchase' THEN array('value', 'event_type')"
    " ELSE CAST(NULL AS ARRAY<STRING>) END"
)


def events_as_outbox(events: DataFrame) -> DataFrame:
    """Shape the driver's `events` table as a versioned outbox stream.

    Columns: version (monotone), xact_id (commit id), operation, key
    (user_id), changed mask, plus payload columns. All derivations are
    deterministic expressions so a SQL oracle can mirror them exactly.
    """
    return events.select(
        F.col("event_id").alias(VERSION),
        F.expr(_XACT_EXPR).cast("long").alias("xact_id"),
        F.expr(_OP_EXPR).alias(OPERATION),
        F.col("user_id").alias("user_key"),
        F.expr(_CHANGED_EXPR).alias(CHANGED),
        F.col("ts"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )


def outbox_scan(
    outbox: DataFrame, from_version: int, horizon: int | None = None
) -> DataFrame:
    """Incremental change scan (SURVEY §2.1 S3; P2 + P3 predicates).

    ``version > from_version`` bounded by the commit horizon
    ``xact_id < horizon`` — uncommitted-at-snapshot rows are deferred to
    the next cycle instead of skipped forever (reference
    ``02-stored-procedure.postgres.table.sql:58-60``). Both predicates
    push down to the source scan.
    """
    scan = outbox.filter(F.col(VERSION) > F.lit(from_version))
    if horizon is not None:
        scan = scan.filter(F.col("xact_id") < F.lit(horizon))
    return scan


def full_snapshot(outbox: DataFrame) -> DataFrame:
    """Full-sync scan (S2): everything, as insert events at its own version."""
    return outbox.withColumn(OPERATION, F.lit("I"))


def seed_frame(outbox: DataFrame) -> DataFrame:
    """Seed handshake (S6/P7): schema-stable, zero rows.

    During seed the engine records the current max version and must export
    nothing; any rows a misbehaving source returns are discarded
    (reference ``ChangeTrackingBackgroundService.cs:567-579``).
    """
    return outbox.limit(0)


def horizon_watermark(
    outbox: DataFrame, from_version: int, horizon: int | None = None
) -> DataFrame:
    """Horizon-gated next watermark (A2).

    ``COALESCE(MAX(version) [through the same horizon as the data scan],
    from_version)`` — reference ``02-stored-procedure.postgres.table.sql:28-31``.
    Single-row aggregate; map-side partial max then a 1-row exchange.
    """
    scan = outbox_scan(outbox, from_version, horizon)
    return scan.agg(
        F.coalesce(F.max(VERSION), F.lit(from_version)).alias("new_watermark")
    )


def batch_watermark(batch: DataFrame, default_version: int) -> DataFrame:
    """Max-version watermark aggregate over an exported batch (A1).

    Reference ``ChangeTrackingBackgroundService.cs:588-591``: new watermark
    is MAX(row $version), defaulting to the envelope version when the
    batch carries no rows.
    """
    return batch.agg(
        F.coalesce(F.max(VERSION), F.lit(default_version)).alias("new_watermark"),
        F.count(F.lit(1)).alias("exported_rows"),
    )


def changed_filter(changes: DataFrame) -> DataFrame:
    """Row-level changed-column filter (P4).

    Drop updates whose mask is empty — updates that touched no tracked
    column are not exported (reference ``02-...sqlserver.column.sql:101-104``).
    Inserts/deletes (NULL mask) always pass.
    """
    return changes.filter(
        (F.col(OPERATION) != "U") | (F.size(F.coalesce(F.col(CHANGED), F.array())) > 0)
    )


def mask_columns(changes: DataFrame, tracked: Sequence[str]) -> DataFrame:
    """Per-column change masking (P5).

    Emit a payload column only when the row is an insert or the column is
    named in the mask; otherwise NULL (reference
    ``02-...sqlserver.column.sql:95-97``, ``02-...postgres.column.sql:93-101``).
    Pure `when/otherwise` projection — no UDF, stays in codegen.
    """
    cols: list[Column] = []
    for name in changes.columns:
        if name in tracked:
            keep = (F.col(OPERATION) == "I") | F.array_contains(
                F.coalesce(F.col(CHANGED), F.array()), name
            )
            cols.append(F.when(keep, F.col(name)).otherwise(F.lit(None)).alias(name))
        else:
            cols.append(F.col(name))
    return changes.select(*cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    version: int = 0,
) -> DataFrame:
    """Change feed from two snapshots: full-outer join keyed on PK → I/U/D
    rows with a per-column ``$changed`` mask via null-safe inequality
    (reference trigger logic ``02-stored-procedure.postgres.column.sql:29-44``;
    SURVEY §7.2 step 3).

    - key only in new  → 'I'
    - key only in old  → 'D' (payload = key only, like the outbox DELETE row)
    - both, any tracked column IS DISTINCT FROM → 'U' + mask
    - both, no difference → dropped (the P4 filter, fused here)

    Scale: one key-equijoin shuffle. For repeated diffs of the same table,
    bucket both snapshots on the key to make this co-located.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in tracked_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in tracked_cols],
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")

    in_old = F.col(f"__ok_{key_cols[0]}").isNotNull()
    in_new = F.col(f"__nk_{key_cols[0]}").isNotNull()
    # null-safe "differs": NOT (a <=> b)
    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        ).otherwise(F.lit(None))
        for c in tracked_cols
    ]
    mask = F.array_compact(F.array(*diffs))
    op = (
        F.when(in_old & ~in_new, F.lit("D"))
        .when(~in_old & in_new, F.lit("I"))
        .when(F.size(mask) > 0, F.lit("U"))
        .otherwise(F.lit(None))
    )
    out = (
        j.withColumn(OPERATION, op)
        .filter(F.col(OPERATION).isNotNull())
        .select(
            F.col(OPERATION),
            F.lit(version).cast("long").alias(VERSION),
            F.when(F.col(OPERATION) == "U", mask)
            .otherwise(F.lit(None).cast("array<string>"))
            .alias(CHANGED),
            *[
                F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
                for k in key_cols
            ],
            # payload: new values; NULL on deletes except the key
            *[
                F.when(F.col(OPERATION) != "D", F.col(f"__n_{c}")).alias(c)
                for c in tracked_cols
            ],
        )
    )
    return out


def envelope(
    batch: DataFrame,
    sync_version: int,
    sync_type: str = "Diff",
    reason_code: int = 0,
) -> DataFrame:
    """Wrap a change batch in the reference's JSON envelope
    (``stored-procedure.md:33-51``; FIXTURES.md F4): one row,
    ``Metadata.Sync.{Version,Type,ReasonCode}`` + ordered ``Data`` array.

    Ordering uses ``sort_array`` over structs keyed by version first —
    deterministic without a global sort of the source (A3/W1).
    """
    payload_cols = [c for c in batch.columns]
    data = F.sort_array(
        F.collect_list(F.struct(F.col(VERSION).alias("_v"), F.struct(*payload_cols).alias("row")))
    )
    return batch.agg(
        F.struct(
            F.struct(
                F.lit(sync_version).cast("long").alias("Version"),
                F.lit(sync_type).alias("Type"),
                F.lit(reason_code).alias("ReasonCode"),
            ).alias("Sync")
        ).alias("Metadata"),
        F.transform(data, lambda x: x["row"]).alias("Data"),
    )


def min_valid_version_reset(from_version: int, min_valid_version: int) -> tuple[int, int]:
    """S7: retention loss forces a full resync.

    Returns (effective_from_version, reason_code): if the stored watermark
    pre-dates the source's minimum valid version, restart from 0 with
    ReasonCode=1 (reference ``02-...sqlserver.table.sql:13-20``,
    ``stored-procedure.md:125-133``).
    """
    if from_version < min_valid_version:
        return 0, 1
    return from_version, 0


def apply_changes(
    old: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
) -> DataFrame:
    """Reconstruct the new table state from a snapshot + change batch —
    the consumer-side MERGE of the change feed (inverse of
    ``snapshot_diff``; the reference's downstream systems do this with
    the exported batches).

    Merge semantics per FIXTURES F4 (the null-vs-mask contract,
    ``02-stored-procedure.postgres.column.sql:120-133``):

    - 'D': row removed;
    - 'I': payload becomes the row;
    - 'U' with a mask: a column named in ``changed`` takes the payload
      value (NULL payload = **cleared to NULL**); a column absent from
      the mask keeps the old value (NULL payload there means
      "untouched", not "cleared");
    - 'U' with NULL mask: full-row update (every column from payload).

    One full-outer key-equijoin — identical shuffle shape to
    ``snapshot_diff``, so bucketing both sides makes the whole
    diff→apply cycle shuffle-free (see ``plans/bucketing.py``).
    """
    ch = changes.select(
        F.col(OPERATION).alias("__op"),
        F.col(CHANGED).alias("__mask"),
        *[F.col(k).alias(f"__ck_{k}") for k in key_cols],
        *[F.col(c).alias(f"__c_{c}") for c in tracked_cols],
    )
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in tracked_cols],
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ok_{k}") == F.col(f"__ck_{k}")
        cond = c if cond is None else (cond & c)
    j = o.join(ch, cond, "full_outer")

    merged_cols = []
    for k in key_cols:
        merged_cols.append(
            F.coalesce(F.col(f"__ck_{k}"), F.col(f"__ok_{k}")).alias(k)
        )
    for c in tracked_cols:
        in_mask = F.array_contains(F.coalesce(F.col("__mask"), F.array()), c)
        full_row = F.col("__mask").isNull()
        merged_cols.append(
            F.when(F.col("__op") == "I", F.col(f"__c_{c}"))
            .when(
                F.col("__op") == "U",
                F.when(in_mask | full_row, F.col(f"__c_{c}")).otherwise(
                    F.col(f"__o_{c}")
                ),
            )
            .otherwise(F.col(f"__o_{c}"))
            .alias(c)
        )
    return j.filter(
        F.col("__op").isNull() | (F.col("__op") != "D")
    ).select(*merged_cols)
