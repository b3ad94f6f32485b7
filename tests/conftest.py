from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from purpleair_data_logger_spark.session import get_spark  # noqa: E402

TESTDATA_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
REFERENCE_FIXTURES = "/root/reference/hardware_variant_json_samples"


@pytest.fixture(scope="session")
def spark():
    # local[8] for the TEST session (r14): tests run micro-batches and
    # small jobs where 32 executor threads are pure scheduling /
    # context-switch overhead — the 3 slowest streaming tests measure
    # 130.7 s at local[32] vs 97.8 s at local[8] with identical
    # results. This is a harness-wall-time choice only (the driver's
    # pytest gate is pass/fail + budget, not a timing artifact; bench.py
    # still honors $SPARK_GRAFT_CPUS untouched). Override with
    # SPARK_GRAFT_TEST_CPUS when debugging parallelism-sensitive code.
    os.environ["SPARK_GRAFT_CPUS"] = os.environ.get(
        "SPARK_GRAFT_TEST_CPUS", "8"
    )
    # shuffle_partitions=2 (r14): tests run on sf0.001-sized data where
    # 32-way exchanges are pure scheduling overhead — worst for the
    # Structured Streaming suites, where EVERY micro-batch pays one
    # state-store task per shuffle partition per stateful operator
    # (test_storage_streaming alone was 21 of the suite's 43 minutes;
    # the driver's pytest budget killed the r13 run at ~91%). Engine
    # contracts are partition-count-independent by design (exact
    # arithmetic, explicit orderings), so this changes wall time only;
    # the one partition-sensitive test repartitions explicitly.
    spark = get_spark("purpleair-spark-tests", shuffle_partitions=2)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA_SMOKE
