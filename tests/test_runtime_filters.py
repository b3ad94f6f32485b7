"""Runtime bloom-filter join pruning: plan evidence that Spark
injects a `might_contain` probe-side filter on a shuffled fact-fact
join when the other side carries a selective predicate (SURVEY §4 —
the runtime-filter layer between static pushdown and AQE).

At 100 TB this is the difference between scanning-and-shuffling the
full fact table versus pre-filtering it with a bloom filter built
from the selective side: the probe-side Exchange carries only rows
whose key MIGHT match. The optimization is ON in the engine's session
config by default (`spark.sql.optimizer.runtime.bloomFilter.enabled`
— Spark's default); the only thing these tests override is the
application-side SIZE threshold (default 10 GB), because the sf0.001
fact table is far below the size at which Spark deems the bloom
filter worth building — exactly the threshold a 100 TB table clears
naturally. The override is restored after each test.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

_APP_THRESHOLD = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
_BROADCAST = "spark.sql.autoBroadcastJoinThreshold"


def _formatted(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture()
def bloom_conf(spark):
    prev_app = spark.conf.get(_APP_THRESHOLD)
    prev_bc = spark.conf.get(_BROADCAST)
    spark.conf.set(_APP_THRESHOLD, "0")  # sf-size fact tables qualify
    spark.conf.set(_BROADCAST, "-1")  # force the shuffled-join path
    yield
    spark.conf.set(_APP_THRESHOLD, prev_app)
    spark.conf.set(_BROADCAST, prev_bc)


def test_bloom_filter_injected_on_selective_fact_fact_join(
    spark, sf_dir, bloom_conf
):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    j = l.join(
        o.filter(F.col("o_totalprice") > 500000),
        l["l_orderkey"] == F.col("o_orderkey"),
    )
    plan = _formatted(j)
    # the probe (lineitem) side is pre-filtered by the bloom filter
    # built from the selective orders side, keyed on the join key
    assert "might_contain" in plan
    assert "l_orderkey" in plan.split("might_contain", 1)[1][:200]


def test_bloom_filter_filters_before_exchange(spark, sf_dir, bloom_conf):
    """The injected filter must sit BELOW the probe-side Exchange —
    pruning before the shuffle is the entire value at scale."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    j = l.join(
        o.filter(F.col("o_totalprice") > 500000),
        l["l_orderkey"] == F.col("o_orderkey"),
    )
    plan = _formatted(j)
    probe = plan.find("might_contain")
    assert probe != -1
    # in the formatted operator list, the Filter carrying might_contain
    # appears in a node whose id is smaller than the Exchange that
    # consumes it; cheap structural proxy: the condition text occurs
    # before the last Exchange mention in the plan dump
    assert probe < plan.rfind("Exchange")
