"""Streaming Count-Min sketch: the incremental mirror of
`operators/sketches.py::countmin_table`.

CMS is a pure commutative-monoid aggregate (cells add), so the
streaming mirror needs NO custom state operator: the same
explode-and-bucket projection feeding Spark's native incremental
streaming aggregation IS the sketch — the engine maintains one BIGINT
per touched (row, bucket) cell (≤ depth·width state however long the
stream runs), updates it per micro-batch with map-side partials, and
the result equals the batch sketch over everything ingested EXACTLY,
under ANY arrival order or batch split (addition commutes — no
disorder contract, unlike the sequential CUSUM/MAD mirrors).

Sink contract: an aggregation stream emits in ``update`` or
``complete`` mode (there is no watermark to close cells — a frequency
sketch never stops updating); readers take the newest value per cell.
Point queries run batch-side against any snapshot via
`sketches.countmin_estimate`, and per-day partial sketches written
from separate streams roll up with `sketches.countmin_merge`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators.sketches import (
    DEFAULT_DEPTH,
    DEFAULT_WIDTH,
    _bucket,
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
    incrementally by the engine's stateful aggregation. Identical
    bucket arithmetic to the batch builder, so cells are
    interchangeable between the two."""
    w = (
        F.lit(1).cast("long")
        if weight_col is None
        else F.col(weight_col).cast("long")
    )
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    return (
        stream.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("_k"), w.alias("_w"))
        .select("_k", "_w", rows)
        .select(
            "row",
            _bucket(F.col("_k"), F.col("row"), width).alias("bucket"),
            "_w",
        )
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )
