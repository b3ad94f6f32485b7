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
    spark = get_spark("purpleair-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA_SMOKE
