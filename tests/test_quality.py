"""Data-quality constraint checker: exact violation counts, one-scan
report, and the raise-before-landing write gate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators import quality as dq


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "click", 5.0, "a@b.com"),
            (2, "click", -1.0, "x@y.org"),   # range violation
            (2, "weird", 7.0, "nope"),       # dup id + bad type + bad email
            (None, "view", 3.0, "c@d.net"),  # null id
        ],
        "event_id long, event_type string, value double, email string",
    )


def test_quality_report_counts_each_violation_exactly(spark):
    report = dq.quality_report(
        _frame(spark),
        [
            dq.not_null("event_id"),
            dq.unique(["event_id"]),
            dq.in_range("value", 0.0, 100.0),
            dq.accepted_values("event_type", ["click", "view"]),
            dq.matches("email", r"^[^@]+@[^@]+\.[a-z]+$"),
        ],
    ).collect()
    got = {r["constraint"]: (r["violations"], r["passed"]) for r in report}
    assert all(r["n_rows"] == 4 for r in report)
    assert got["not_null(event_id)"] == (1, False)
    # ids: 1, 2, 2, NULL -> 4 rows, 3 distinct tuples -> 1 duplicate
    assert got["unique(event_id)"] == (1, False)
    assert got["in_range(value,0.0,100.0)"] == (1, False)
    assert got["accepted_values(event_type)"] == (1, False)
    assert got["matches(email)"] == (1, False)


def test_quality_report_is_one_scan(spark):
    """N constraints must compile to ONE aggregate pass: a single
    scan, partial+final aggregate, no join/window per constraint."""
    from purpleair_data_logger_spark.plans import explain as E

    df = _frame(spark)
    plan = E.formatted_plan(
        dq.quality_report(
            df,
            [
                dq.not_null("event_id"),
                dq.in_range("value", 0.0, 100.0),
                dq.accepted_values("event_type", ["click", "view"]),
            ],
        )
    )
    assert E.count(plan, "Scan") == 1
    assert E.count(plan, "HashAggregate") == 2  # partial + final, once
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_check_or_raise_gates_and_passes(spark):
    clean = _frame(spark).filter(
        F.col("event_id").isNotNull() & (F.col("value") >= 0)
    ).dropDuplicates(["event_id"])
    checks = [dq.not_null("event_id"), dq.unique(["event_id"]),
              dq.in_range("value", 0.0, 100.0)]
    dq.check_or_raise(clean, checks)  # no raise
    with pytest.raises(dq.QualityError) as ei:
        dq.check_or_raise(_frame(spark), checks)
    msg = str(ei.value)
    assert "not_null(event_id): 1/4" in msg
    assert "unique(event_id): 1/4" in msg
    with pytest.raises(ValueError):
        dq.quality_report(_frame(spark), [])
