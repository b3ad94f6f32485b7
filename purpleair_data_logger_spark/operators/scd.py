"""Slowly-changing-dimension (type 2) build from an event changelog.

The warehouse-standard versioned dimension: given an append-only event
log, produce one row per (key, state EPISODE) with its validity
interval — ``[valid_from, valid_to)``, NULL-open for the current row —
plus ``is_current`` and a per-key ``version_n``. This is the TABLE
form of the state family: `hyperfunctions.state_agg` totals time per
state, `state_timeline` lists the transition EDGES; SCD2 is the
interval dimension you actually join facts against
(fact.ts >= valid_from AND (valid_to IS NULL OR fact.ts < valid_to) —
the `range_join_click_error` shape), and the batch analog of the CDC
snapshot diff (`orders_snapshot_diff`).

Consecutive equal states collapse into one episode (re-emitting the
same state is not a new version — the SCD2 convention); ordering is
the repo's deterministic two-column (ts, id) order, so duplicate
timestamps version identically on every engine and the whole build is
oracle-replayable.

Scale shape: one window shuffle on the key finds change points; the
episode numbering/closing windows run over the CHANGE ROWS only — a
small fraction of the log for any dimension that changes slower than
it is observed. Per-key data is a single window partition: fine for
billions of small keys, the usual hot-key caveat for a single
pathological one (pre-aggregate or split upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    state_col: str,
) -> DataFrame:
    """Build the type-2 dimension: (keys..., state, valid_from,
    valid_to, is_current, version_n), one row per state episode.
    NULL key/ts/id/state rows carry no observation (an untimed or
    unkeyed change cannot be versioned)."""
    base = df.filter(
        F.col(ts_col).isNotNull()
        & F.col(id_col).isNotNull()
        & F.col(state_col).isNotNull()
    ).select(*key_cols, ts_col, id_col, state_col)
    for k in key_cols:
        base = base.filter(F.col(k).isNotNull())
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    changes = (
        base.withColumn("_prev", F.lag(state_col).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col))
        )
        .select(*key_cols, ts_col, id_col, state_col)
    )
    return changes.select(
        *key_cols,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version_n"),
    )
