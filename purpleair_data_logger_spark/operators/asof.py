"""As-of (most-recent-match) join — a time-series operator Spark lacks
natively.

For each left row, find the single right row with the greatest
``right.ts <= left.ts`` within the same key — the standard way to
attach the latest sensor/station state to a reading, or the last click
to an error event. TimescaleDB users write ``LATERAL ... ORDER BY ts
DESC LIMIT 1``; DuckDB has ``ASOF JOIN``; Spark has neither, so this
implements the **merge-scan formulation**:

    union(right tagged 0, left tagged 1)
      → window over (key) ordered by (ts, tag)
      → last non-null right-payload at or before each row
      → keep left rows

One shuffle on the key, one sort — O(n log n), no range explosion, no
per-row subquery. Ties (right.ts == left.ts) match, because the right
row sorts first at equal ts (tag 0 < 1) — the same inclusive semantics
as DuckDB's ``ON right.ts <= left.ts``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    payload_prefix: str = "asof_",
    direction: str = "backward",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right payload
    at-or-before its timestamp (NULLs when no prior right row).

    ``on``: equi-key columns (must exist in both frames).
    ``right_payload``: right columns to carry (renamed with prefix).
    ``direction``: ``"backward"`` (default — greatest right.ts ≤
    left.ts, DuckDB's ASOF) or ``"forward"`` (smallest right.ts ≥
    left.ts — "the next state change after this event", which DuckDB
    has no native form for). Forward is the same merge-scan over the
    mirrored sort: descending timestamps with right rows still first
    at equal ts, so the boundary stays inclusive.
    ``tiebreaker``: optional right-side column pinning which right row
    wins when several share the boundary timestamp for the same key —
    without it the carried payload is whichever row the scan saw last
    (partitioning-dependent, a latent nondeterminism flagged in the
    round-4 advisory). The contract replays the deterministic LATERAL
    subquery: backward matches ``ORDER BY ts DESC, tb DESC LIMIT 1``
    (greatest tiebreaker wins), forward matches ``ORDER BY ts, tb
    LIMIT 1`` (smallest wins).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(on)
    # NULL contract, matching SQL ASOF LEFT JOIN three-valued logic
    # (fuzz-found, r6): a right row with a NULL key or NULL timestamp
    # can never win a comparison — drop it; a LEFT row with a NULL key
    # or NULL timestamp can never match but must still be emitted
    # (left join) with NULL payloads — bypass it around the merge so
    # it neither lands in the NULL-key window partition (where it
    # would spuriously match NULL-key right rows) nor shifts the sort
    # (Spark windows order NULLS FIRST, DuckDB NULLS LAST).
    null_probe = F.lit(False)
    for c in (*keys, left_ts):
        null_probe = null_probe | F.col(c).isNull()
    bypass_src = left.filter(null_probe)
    left = left.filter(~null_probe)
    for c in (*keys, right_ts):
        right = right.filter(F.col(c).isNotNull())
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    tb_cols_right = (
        [F.col(tiebreaker).alias("_tb")] if tiebreaker is not None else []
    )
    tb_cols_left = (
        [F.lit(None).cast(dict(right.dtypes)[tiebreaker]).alias("_tb")]
        if tiebreaker is not None
        else []
    )
    tagged_right = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *tb_cols_right,
        *[F.col(c).alias(f"{payload_prefix}{c}") for c in right_payload],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    tagged_left = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *tb_cols_left,
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{payload_prefix}{c}")
            for c in right_payload
        ],
        *lcols,
    )
    merged = tagged_right.unionByName(tagged_left)
    ts_us = F.unix_micros(F.col("_ts").cast("timestamp"))
    order = (
        [ts_us, F.col("_tag")]
        if direction == "backward"
        else [ts_us.desc(), F.col("_tag")]
    )
    if tiebreaker is not None:
        # the winning right row must sort LAST among its same-ts tag-0
        # group (F.last carries it): asc puts the greatest last for
        # backward, desc puts the smallest last for forward. NULL
        # tiebreakers sort FIRST so they always LOSE to any non-null
        # value (nulls_last would let a NULL-tb right row win the
        # carry, inverting the documented contract). Left rows carry a
        # NULL _tb and sort within their own tag-1 group, where
        # relative order is irrelevant (right rows all precede them).
        order.append(
            F.col("_tb").asc_nulls_first()
            if direction == "backward"
            else F.col("_tb").desc_nulls_first()
        )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The carry is ROW-atomic: one struct holding the whole right
    # payload, NULL on left rows, carried with a single
    # last(ignorenulls). Per-column last(ignorenulls) would smear — a
    # matched right row whose payload VALUE is NULL must yield that
    # NULL, not reach past it to an older right row's value
    # (fuzz-found, r6; SQL ASOF emits the matched row's columns as-is).
    payload_struct = F.when(
        F.col("_tag") == 0,
        F.struct(
            *[F.col(f"{payload_prefix}{c}").alias(c) for c in right_payload]
        ),
    )
    filled = merged.select(
        *keys,
        "_ts",
        "_tag",
        *lcols,
        F.last(payload_struct, ignorenulls=True).over(w).alias("_pl"),
    )
    matched = filled.filter(F.col("_tag") == 1).select(
        *keys,
        F.col("_ts").alias(left_ts),
        *lcols,
        *[
            F.col(f"_pl.{c}").alias(f"{payload_prefix}{c}")
            for c in right_payload
        ],
    )
    bypass = bypass_src.select(
        *keys,
        F.col(left_ts),
        *lcols,
        *[
            F.lit(None)
            .cast(dict(right.dtypes)[c])
            .alias(f"{payload_prefix}{c}")
            for c in right_payload
        ],
    )
    return matched.unionByName(bypass)
