"""Stream-stream interval join: correlate two event streams within a
bounded time window, with watermark-bounded state on both sides.

The streaming formulation of `operators.rangejoin.bounded_range_join`
(all right events in ``[left_ts - gap, left_ts]`` per key): Spark's
native stream-stream inner join accepts exactly this shape — an
equi-key plus a time-interval condition — and uses the interval bound
together with both watermarks to know when buffered rows can never
match again and evict them. State therefore tracks the gap horizon ×
arrival rate, never stream history; without the interval condition the
state store would grow unboundedly, which is why this module requires
the gap rather than defaulting it.

Batch/streaming parity: the same join condition evaluated on the
static frames equals the bucketized batch operator row-for-row
(pinned in tests), so backfills can run the batch plan while live
correlation runs this one against the same sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    *,
    gap_seconds: int,
    left_watermark: str,
    right_watermark: str,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join two streams on ``on`` where
    ``right_ts ∈ [left_ts - gap_seconds, left_ts]``.

    Both inputs must be streaming frames (or both static — the same
    plan is then the batch parity check). Event-time columns are cast
    to TIMESTAMP (watermarks reject NTZ) and every non-key column is
    prefixed, keys unprefixed.
    """
    lcols = [c for c in left.columns if c != on]
    rcols = [c for c in right.columns if c != on]
    l = left.select(
        F.col(on),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in lcols],
    ).withColumn(
        f"{left_prefix}{left_ts}",
        F.col(f"{left_prefix}{left_ts}").cast("timestamp"),
    )
    r = right.select(
        F.col(on).alias("_r_key"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
    ).withColumn(
        f"{right_prefix}{right_ts}",
        F.col(f"{right_prefix}{right_ts}").cast("timestamp"),
    )
    if l.isStreaming:
        l = l.withWatermark(f"{left_prefix}{left_ts}", left_watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{right_prefix}{right_ts}", right_watermark)
    lt = F.col(f"{left_prefix}{left_ts}")
    rt = F.col(f"{right_prefix}{right_ts}")
    cond = (
        (F.col(on) == F.col("_r_key"))
        & (rt >= lt - F.expr(f"INTERVAL {gap_seconds} SECONDS"))
        & (rt <= lt)
    )
    return l.join(r, cond, "inner").drop("_r_key")
