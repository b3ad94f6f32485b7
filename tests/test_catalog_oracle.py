"""Every oracle-backed catalog query must match DuckDB at sf0.001.

This replicates the driver's t2 gate locally (the driver runs sf0.01;
we default to sf0.001 for speed — set SPARK_GRAFT_SMOKE_DIR to run
bigger)."""

from __future__ import annotations

import pytest

from purpleair_data_logger_spark import catalog
from tests.oracle import compare

ORACLED = [q for q in catalog.all_queries().values() if q.oracle is not None]
ROWS_ONLY = [q for q in catalog.all_queries().values() if q.oracle is None]


@pytest.mark.parametrize("query", ORACLED, ids=[q.name for q in ORACLED])
def test_oracle_match(spark, sf_dir, query):
    df = query.fn(spark, sf_dir)
    ok, msg = compare(df, query.oracle, sf_dir)
    assert ok, f"{query.name}: {msg}"


@pytest.mark.parametrize("query", ROWS_ONLY, ids=[q.name for q in ROWS_ONLY])
def test_rows_only_runs(spark, sf_dir, query):
    df = query.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
