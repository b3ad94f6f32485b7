"""Bounded time-range join: for every left row, all right rows whose
timestamp falls in ``[left_ts - gap, left_ts]`` on the same key.

The naive formulation — an inequality join — plans as a nested-loop
(per equi-key cartesian) in any engine, which dies on a hot key. This
operator uses the standard range-join bucketization instead: time is
cut into gap-width buckets, the left side duplicates into its own and
the preceding bucket, and the join becomes a pure EQUI-join on
(key, bucket) followed by the exact range filter. Pair generation is
bounded by real temporal locality (rows co-resident in a gap window),
never |left_key| × |right_key|; the plan is a shuffled hash/sort-merge
join that AQE can skew-split, with no BroadcastNestedLoopJoin anywhere
(pinned in tests/test_plans.py).

This is the windowed-correlation primitive under "clicks within 10
minutes before each error", sensor cross-correlation, and as-of-style
audits where ALL prior events in the horizon matter (the 1-row-variant
is `operators.asof.asof_join`).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    gap_seconds: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs on equal ``on`` keys with
    ``right_ts ∈ [left_ts - gap_seconds, left_ts]`` (both ends
    inclusive).

    Non-key columns are carried with ``left_prefix``/``right_prefix``
    to keep the pair schema collision-free.
    """
    if gap_seconds <= 0:
        # gap_us=0 would make `lts % gap_us` NULL (non-ANSI), silently
        # emptying the join; negative gaps invert the documented window.
        raise ValueError(
            f"gap_seconds must be positive, got {gap_seconds}; for "
            "equal-timestamp matches use a plain equi-join on key + ts"
        )
    gap_us = gap_seconds * 1_000_000
    keys = list(on)
    lts = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rts = F.unix_micros(F.col(right_ts).cast("timestamp"))

    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    # Exact integer bucket: (ts - ts % gap) / gap divides an exact
    # multiple, so the double quotient is integral. Each right row's
    # bucket equals exactly ONE of the left row's two candidate
    # buckets, so the explode never produces duplicate pairs.
    lb = ((lts - lts % gap_us) / gap_us).cast("long")
    l = left.select(
        *keys,
        lts.alias("_lus"),
        F.explode(F.array(lb, lb - 1)).alias("_b"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in lcols],
    )
    r = right.select(
        *keys,
        rts.alias("_rus"),
        ((rts - rts % gap_us) / gap_us).cast("long").alias("_b"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
    )
    joined = l.join(r, on=keys + ["_b"], how="inner").filter(
        (F.col("_rus") >= F.col("_lus") - gap_us) & (F.col("_rus") <= F.col("_lus"))
    )
    return joined.drop("_b", "_lus", "_rus")
