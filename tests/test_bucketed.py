from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from purpleair_data_logger_spark.io import load_table
from purpleair_data_logger_spark.plans import explain as E
from purpleair_data_logger_spark.sinks import bucketed as B


@pytest.fixture
def bucketed_pair(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    B.save_bucketed(orders, "b_orders", bucket_cols=["o_orderkey"], num_buckets=8)
    B.save_bucketed(
        lineitem, "b_lineitem", bucket_cols=["l_orderkey"], num_buckets=8
    )
    yield "b_orders", "b_lineitem"
    B.drop_table(spark, "b_orders")
    B.drop_table(spark, "b_lineitem")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_pair):
    """The whole point of bucketing: equi-join on the bucket key plans
    with zero Exchange — the shuffle was paid once at write time."""
    o, l = bucketed_pair
    # disable broadcast so the join strategy reflects big-table reality
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(l)
            .join(spark.table(o), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("total"))
        )
        plan = E.formatted_plan(joined)
        # sort-merge join directly on bucket layout: no shuffle before
        # the join; the only exchange allowed is the final groupBy's
        assert E.count(plan, "SortMergeJoin") >= 1
        n_exchange = E.count(plan, "Exchange")
        assert n_exchange <= 1, f"co-bucketed join should not shuffle inputs:\n{plan[:2500]}"
        assert joined.count() == 5  # five order priorities
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_reuses_layout(spark, bucketed_pair):
    """GroupBy on the bucket key also plans shuffle-free."""
    o, _ = bucketed_pair
    agg = spark.table(o).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = E.formatted_plan(agg)
    assert E.count(plan, "Exchange") == 0, plan[:1500]


def test_incremental_dedup_base_index_is_persistable(spark, sf_dir):
    """SCALE.md's incremental-dedup claim, evidenced: persist the base
    corpus's LSH band index bucketed on the band join key, and the
    candidate join replans with NO exchange on the base side — each
    ingest pays shuffles only for the new batch (its signature groupBy
    and its band-key redistribution), never for the corpus."""
    from purpleair_data_logger_spark.operators import dedup as dd

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    docs = load_table(spark, sf_dir, "documents")
    base_idx = dd.lsh_banded(
        docs.filter(F.col("doc_id") % 10 != 0), "doc_id", "text", hash_family="md5"
    )
    B.save_bucketed(
        base_idx,
        "b_base_band_index",
        bucket_cols=["band_idx", "band_hash"],
        num_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        new_idx = dd.lsh_banded(
            docs.filter(F.col("doc_id") % 10 == 0), "doc_id", "text",
            hash_family="md5",
        ).select(
            F.col("doc_id").alias("new_doc_id"), "band_idx", "band_hash"
        )
        cands = spark.table("b_base_band_index").join(
            new_idx, on=["band_idx", "band_hash"]
        )
        plan = E.formatted_plan(cands)
        assert E.count(plan, "SortMergeJoin") >= 1
        # exactly the new side's two exchanges: signature groupBy(doc_id)
        # + redistribution onto the band key; the persisted base index
        # contributes none (its bucket layout IS the join distribution)
        assert E.count(plan, "Exchange") == 2, plan[:2500]
        assert cands.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        B.drop_table(spark, "b_base_band_index")
