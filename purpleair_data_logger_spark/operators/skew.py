"""Skew-mitigation utilities for hot keys at scale.

AQE's skew-join splitting (on by default in `session.get_spark`)
handles most runtime skew; these helpers cover the cases AQE can't:
skewed *aggregations* (one sensor producing a large share of readings)
and skewed joins against non-splittable stages. Classic two-phase
salting, expressed declaratively.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skewed_variant(
    df: DataFrame,
    key_col: str,
    *,
    hot_value,
    hot_fraction: float = 0.3,
    seed_col: str,
) -> DataFrame:
    """Deterministic hot-key rewrite for skew benchmarking.

    Rewrites ``key_col`` to ``hot_value`` on a deterministic
    ``hot_fraction`` of rows (selected by hashing ``seed_col``, so the
    same input always yields the same skewed table). Models the
    one-sensor-dominates / one-user-dominates shape that breaks naive
    hash partitioning at scale.
    """
    pct = F.pmod(F.xxhash64(F.col(seed_col)), F.lit(1000))
    return df.withColumn(
        key_col,
        F.when(pct < int(hot_fraction * 1000), F.lit(hot_value)).otherwise(
            F.col(key_col)
        ),
    )


def salted_count(
    df: DataFrame, keys: Sequence[str], *, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase count for skewed group keys.

    Phase 1 groups on (keys, salt) — spreading a hot key over
    ``salt_buckets`` reducers — phase 2 sums the partials. Total work
    unchanged; max reducer load divided by the bucket count.
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("n"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase sum/count/min/max (all algebraic aggregates that
    decompose over partials). Returns n/sum/min/max per key; mean =
    sum/n downstream."""
    salt = (F.spark_partition_id() % salt_buckets).alias("_salt")
    v = F.col(value_col)
    partial = df.groupBy(*keys, salt).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(v).alias("_sum"),
        F.min(v).alias("_min"),
        F.max(v).alias("_max"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        F.sum("_sum").alias("sum"),
        F.min("_min").alias("min"),
        F.max("_max").alias("max"),
    )


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt_buckets: int = 8,
) -> DataFrame:
    """Salted equi-join: big side gets a random salt, small side is
    replicated across all salt values, join key becomes (key, salt).

    For when the small side is too large to broadcast but the join key
    is skewed. Output = plain inner join rows (salt dropped).
    """
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_small = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    out = salted_big.join(replicated_small, on=[key, "_salt"], how="inner")
    return out.drop("_salt")
