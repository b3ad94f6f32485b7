"""Whole-catalog plan census gates (the PLANS.md invariants,
executable): the per-query pins in test_plans.py guard load-bearing
shapes; these two sweep EVERY catalog query so a regression anywhere
— a new query, an operator edit, a Spark upgrade changing a plan —
fails loudly even if nobody wrote a pin for it.

Invariants:
* NO CartesianProduct anywhere — every pair generation in this engine
  is blocked/banded/bucketed by construction;
* NO row-at-a-time Python (BatchEvalPython / PythonUDF) — Python
  appears only as Arrow-batched mapInPandas/applyInPandas nodes in
  the documented slow-path operators.

Plan compilation only — nothing executes, no data is read.
"""

from __future__ import annotations

import pytest

from purpleair_data_logger_spark import catalog
from purpleair_data_logger_spark.plans import explain as E


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    plans = {}
    for name, q in catalog.all_queries().items():
        plans[name] = E.formatted_plan(q.fn(spark, sf_dir))
    return plans


def test_no_cartesian_product_anywhere(all_plans):
    offenders = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert not offenders, f"cartesian products in: {offenders}"


def test_no_row_python_anywhere(all_plans):
    offenders = [
        n
        for n, p in all_plans.items()
        if "BatchEvalPython" in p or "PythonUDF" in p
    ]
    assert not offenders, f"row-at-a-time Python in: {offenders}"
