"""Table loaders for the driver-generated parquet testdata (TESTDATA.md).

Handles TIMESTAMP(NANOS) parquet columns (e.g. ``events.ts``), which
Spark's reader rejects outright: those are read as raw nano longs
(``spark.sql.legacy.parquet.nanosAsLong``) and converted to proper
microsecond timestamps — the same truncation DuckDB applies, so oracle
comparisons agree exactly.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as TIMESTAMP(NANOS) per the parquet footer."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    )


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to session-zoned TIMESTAMP.

    Parquet ``timestamp[us]`` with no timezone is read by Spark 4 as
    TIMESTAMP_NTZ, which ``unix_micros`` / ``withWatermark`` reject.
    The session TZ is pinned to UTC (session.configure_existing) and
    DuckDB treats naive parquet timestamps as UTC too, so the cast is
    bit-identical to the oracle's view — the same reasoning as the
    nanos path above.
    """
    ntz_cols = [
        f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"
    ]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_ts_columns(path)
    if not nanos_cols:
        return normalize_timestamps(spark.read.parquet(path))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return normalize_timestamps(df)
