"""Streaming Count-Min sketch: the incremental mirror of
`operators/sketches.py::countmin_table`.

CMS is a pure commutative-monoid aggregate (cells add), so the
streaming mirror needs NO custom state operator — and no separate
PLAN either: `countmin_table`'s projection + groupBy works unchanged
on a streaming DataFrame (every op in it is an unresolved-plan
transform), so this module just applies the BATCH builder to the
stream. Spark's native incremental streaming aggregation maintains one
BIGINT per touched (row, bucket) cell (≤ depth·width state however
long the stream runs), updates it per micro-batch with map-side
partials, and the result equals the batch sketch over everything
ingested EXACTLY, under ANY arrival order or batch split (addition
commutes — no disorder contract, unlike the sequential CUSUM/MAD
mirrors). Sharing the single implementation makes that batch/stream
parity true BY CONSTRUCTION, not by keeping two copies in sync.

Sink contract: an aggregation stream emits in ``update`` or
``complete`` mode (there is no watermark to close cells — a frequency
sketch never stops updating); readers take the newest value per cell.
Point queries run batch-side against any snapshot via
`sketches.countmin_estimate`, and per-day partial sketches written
from separate streams roll up with `sketches.countmin_merge`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from purpleair_data_logger_spark.operators.sketches import (
    DEFAULT_DEPTH,
    DEFAULT_WIDTH,
    countmin_table,
)


def countmin_stream(
    stream: DataFrame,
    key_col: str,
    *,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    weight_col: str | None = None,
) -> DataFrame:
    """The streaming CMS plan: (row, bucket, cnt) maintained
    incrementally by the engine's stateful aggregation — literally the
    batch builder applied to the stream, so cells are interchangeable
    between the two by construction."""
    return countmin_table(
        stream, key_col, width=width, depth=depth, weight_col=weight_col
    )
