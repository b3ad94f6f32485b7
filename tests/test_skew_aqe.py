"""AQE skew-join splitting: plan-level evidence, not just claims.

The 100 TB skew story is (a) AQE splits skewed sort-merge-join
partitions at runtime, (b) two-phase salting handles skewed
*aggregations* (AQE cannot split those — the hot group must meet one
reducer). These tests pin both on a deterministic hot-key variant of
the events table (one user_id owning ~30% of rows), built with
`operators.skew.skewed_variant`.

AQE's OptimizeSkewedJoin triggers only when (1) the join is a
SortMergeJoin (broadcast disabled here), (2) the hot partition exceeds
max(skewedPartitionFactor x median, skewedPartitionThresholdInBytes)
and splits into >= 2 advisory-size chunks, and (3) splitting adds no
downstream shuffle (or forceOptimizeSkewedJoin). The thresholds are
lowered to make the split observable at test scale; on a real cluster
the defaults (256 MB) play the same role.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from purpleair_data_logger_spark.io import load_table
from purpleair_data_logger_spark.operators import skew
from purpleair_data_logger_spark.plans import explain

HOT_USER = 7


@contextlib.contextmanager
def _skew_confs(spark):
    """Tuned-for-test-scale AQE confs, restored afterwards."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    }
    saved = {}
    for k, v in keys.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_events(spark, sf_dir, *, copies: int = 32):
    """Hot-key events variant, replicated so the hot shuffle partition
    is large enough (in bytes) for the splitter to produce multiple
    advisory-size chunks at test scale. The wide `props` JSON column is
    kept so column pruning doesn't shrink the shuffle below the
    byte thresholds."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "props"
    )
    replicas = spark.range(copies).select(F.col("id").alias("_copy"))
    replicated = (
        e.crossJoin(F.broadcast(replicas))
        .withColumn("event_id", F.col("event_id") * copies + F.col("_copy"))
        .drop("_copy")
        # The skew split subdivides a reduce partition at MAP-output
        # boundaries; a single-split parquet scan = one mapper = an
        # indivisible hot block. Spread the map stage first.
        .repartition(16)
    )
    return skew.skewed_variant(
        replicated,
        "user_id",
        hot_value=HOT_USER,
        hot_fraction=0.3,
        seed_col="event_id",
    )


def test_skewed_variant_hot_share(spark, sf_dir):
    sk = _skewed_events(spark, sf_dir, copies=4)
    total, hot = sk.select(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("user_id") == HOT_USER, 1)).alias("hot"),
    ).first()
    share = hot / total
    assert 0.25 < share < 0.35, f"hot-key share {share:.3f} not ~0.3"


def test_aqe_splits_skewed_join(spark, sf_dir):
    # NB: OptimizeSkewedJoin pattern-matches SMJ <- Sort <- ShuffleStage
    # on BOTH sides — the dim side must be a plain scan (no agg between
    # sort and shuffle), hence customer rather than events.distinct().
    sk = _skewed_events(spark, sf_dir)
    users = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    with _skew_confs(spark):
        joined = sk.join(users, "user_id").agg(
            F.sum("value").alias("sum_value"),
            F.sum(F.length("props")).alias("props_bytes"),
            F.count(F.lit(1)).alias("n"),
        )
        plan = explain.assert_skew_split(joined)
    # the split must not have changed the answer
    assert "SortMergeJoin" in plan


def test_salted_agg_matches_plain_on_skewed_key(spark, sf_dir):
    sk = _skewed_events(spark, sf_dir, copies=4)
    plain = {
        r["user_id"]: r
        for r in sk.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
        .collect()
    }
    salted = {
        r["user_id"]: r
        for r in skew.salted_agg(sk, ["user_id"], "value").collect()
    }
    assert plain.keys() == salted.keys()
    hot = salted[HOT_USER]
    assert hot["n"] == plain[HOT_USER]["n"]
    for k in plain:
        assert plain[k]["n"] == salted[k]["n"]
        assert plain[k]["sum"] == pytest.approx(salted[k]["sum"])
        assert plain[k]["min"] == salted[k]["min"]
        assert plain[k]["max"] == salted[k]["max"]


def test_salted_agg_spreads_hot_key(spark, sf_dir):
    """Phase-1 output must contain multiple partials for the hot key —
    the whole point of salting (one reducer per (key, salt) instead of
    one reducer for the hot key)."""
    sk = _skewed_events(spark, sf_dir, copies=4).repartition(8)
    salt = (F.spark_partition_id() % 16).alias("_salt")
    partials = (
        sk.groupBy("user_id", salt)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("user_id") == HOT_USER)
        .count()
    )
    assert partials > 1, "hot key not spread over multiple salt buckets"


def test_hot_cold_join_matches_plain_and_splits_plan(spark, sf_dir):
    """hot_cold_join must equal the plain join row-for-row (inner AND
    left, including left rows with no match) while the plan shows the
    split: a broadcast join for the hot leg unioned with a shuffle
    join for the cold leg — the hot key never enters an exchange."""
    sk = _skewed_events(spark, sf_dir, copies=2)
    users = (
        sk.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 3 != 1)  # some users unmatched
        .withColumn("segment", F.col("user_id") % 5)
    )
    hot = spark.createDataFrame([(HOT_USER,)], "user_id long")

    for how in ("inner", "left"):
        plain = (
            sk.join(users, "user_id", how)
            .groupBy("user_id", "segment")
            .count()
        )
        split = (
            skew.hot_cold_join(sk, users, "user_id", hot_keys=hot, how=how)
            .groupBy("user_id", "segment")
            .count()
        )
        p = {(r["user_id"], r["segment"]): r["count"] for r in plain.collect()}
        s = {(r["user_id"], r["segment"]): r["count"] for r in split.collect()}
        assert s == p, how

    with _skew_confs(spark):  # autoBroadcast off: broadcasts are explicit
        plan = explain.formatted_plan(
            skew.hot_cold_join(sk, users, "user_id", hot_keys=hot)
        )
    assert "BroadcastHashJoin" in plan  # the hot leg
    assert "Union" in plan


def test_hot_cold_join_detects_hot_keys_via_frequent_items(spark, sf_dir):
    """Default detection path: with no hot_keys given, the heavy-hitter
    pass finds the planted 30%-share user and the join still equals
    the plain join."""
    sk = _skewed_events(spark, sf_dir, copies=2)
    users = sk.select("user_id").distinct().withColumn(
        "segment", F.col("user_id") % 5
    )
    plain = sk.join(users, "user_id", "inner").count()
    split = skew.hot_cold_join(
        sk, users, "user_id", support_bp=1000  # 10%: catches the hot user
    ).count()
    assert split == plain

    import pytest as _pytest

    with _pytest.raises(ValueError):
        skew.hot_cold_join(sk, users, "user_id", how="full")
