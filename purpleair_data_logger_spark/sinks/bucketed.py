"""Bucketed tables: co-located, shuffle-free joins for hot join keys.

At 100 TB the dominant recurring cost is re-shuffling fact tables on
the same join key (readings ⋈ readings on (ts, sensor), lineitem ⋈
orders on orderkey). Spark's answer is bucketing: write both sides
``bucketBy(N, key)`` + ``sortBy(key)`` into the catalog, and every
subsequent equi-join or aggregation on that key plans with NO Exchange
— the bucket layout *is* the shuffle, paid once at write time.

This module wraps the catalog dance (bucketing only works through
``saveAsTable``) and is validated by `tests/test_bucketed.py`, which
asserts the join plan of two co-bucketed tables contains zero shuffle
exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted managed parquet table."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
