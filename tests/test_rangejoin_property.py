"""Property test: the gap-bucketized range join must equal the naive
inequality join on arbitrary inputs — including rows landing exactly on
bucket and gap boundaries, the places an off-by-one in the bucket
arithmetic would hide."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators.rangejoin import bounded_range_join

BASE = dt.datetime(2022, 8, 5, 10, 0, 0)


def _frame(spark, rows):
    return spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(rows)],
        ["key", "ts", "row_id"],
    )


def _naive(left, right, gap_seconds):
    l = left.select("key", F.col("ts").alias("lts"), F.col("row_id").alias("lid"))
    r = right.select(
        F.col("key").alias("rkey"),
        F.col("ts").alias("rts"),
        F.col("row_id").alias("rid"),
    )
    cond = (
        (l["key"] == r["rkey"])
        & (r["rts"] >= l["lts"] - F.expr(f"INTERVAL {gap_seconds} SECONDS"))
        & (r["rts"] <= l["lts"])
    )
    return sorted((x["lid"], x["rid"]) for x in l.join(r, cond).collect())


CASES = [
    # boundary hits: exactly gap apart, exactly on bucket edges,
    # same instant, just outside
    ([("a", 0), ("a", 600)], [("a", 0), ("a", 599), ("a", 600), ("a", 601)], 600),
    # bucket-edge straddle: left at 1199 looks back across buckets 0/1
    ([("a", 1199)], [("a", 599), ("a", 600), ("a", 1199)], 600),
    # multiple keys, no cross-key leakage
    ([("a", 100), ("b", 100)], [("a", 50), ("b", 90), ("c", 100)], 120),
    # dense cluster inside one gap window
    ([("k", 300)], [("k", s) for s in range(0, 601, 60)], 300),
    # empty right / empty overlap
    ([("z", 10)], [("z", 5000)], 60),
]


@pytest.mark.parametrize("lrows,rrows,gap", CASES)
def test_bucketized_equals_naive(spark, lrows, rrows, gap):
    left, right = _frame(spark, lrows), _frame(spark, rrows)
    got = sorted(
        (r["l_row_id"], r["r_row_id"])
        for r in bounded_range_join(
            left, right, ["key"], "ts", "ts", gap_seconds=gap
        ).collect()
    )
    assert got == _naive(left, right, gap)


def test_bucketized_equals_naive_randomized(spark):
    """Deterministic pseudo-random sweep: 120 rows per side, several
    gaps, offsets designed to hit bucket multiples often."""
    import random

    rng = random.Random(20220805)
    keys = ["a", "b", "c"]
    for gap in (60, 97, 600):
        lrows = [
            (rng.choice(keys), rng.choice([0, 1, gap - 1, gap, gap + 1, rng.randrange(0, 5 * gap)]))
            for _ in range(120)
        ]
        rrows = [
            (rng.choice(keys), rng.choice([0, gap, 2 * gap, rng.randrange(0, 5 * gap)]))
            for _ in range(120)
        ]
        left, right = _frame(spark, lrows), _frame(spark, rrows)
        got = sorted(
            (r["l_row_id"], r["r_row_id"])
            for r in bounded_range_join(
                left, right, ["key"], "ts", "ts", gap_seconds=gap
            ).collect()
        )
        assert got == _naive(left, right, gap), f"gap={gap}"
