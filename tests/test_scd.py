"""SCD type-2 dimension build (`operators/scd.py`): episode collapse,
interval chaining, current-row semantics, deterministic versioning
under duplicate timestamps, NULL contracts."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators.scd import scd2_from_changelog


def _ts(i):
    return datetime(2024, 1, 1, 0, 0, i)


def _build(spark, rows):
    df = spark.createDataFrame(
        rows, "user string, ts timestamp, id long, st string"
    )
    return sorted(
        (
            r["user"], r["state"], r["valid_from"], r["valid_to"],
            r["is_current"], r["version_n"],
        )
        for r in scd2_from_changelog(
            df, ["user"], "ts", "id", "st"
        ).collect()
    )


def test_scd2_episodes_chain_and_collapse(spark):
    rows = [
        ("a", _ts(1), 1, "x"),
        ("a", _ts(2), 2, "x"),   # same state re-emitted: NOT a version
        ("a", _ts(3), 3, "y"),
        ("a", _ts(5), 4, "x"),   # back to x: a NEW episode, new version
        ("b", _ts(9), 5, "z"),
    ]
    got = _build(spark, rows)
    assert got == [
        ("a", "x", _ts(1), _ts(3), False, 1),
        ("a", "x", _ts(5), None, True, 3),
        ("a", "y", _ts(3), _ts(5), False, 2),
        ("b", "z", _ts(9), None, True, 1),
    ]
    # intervals tile: each valid_to equals the next version's valid_from
    by_user_ver = {(u, v): (f, t) for u, s, f, t, c, v in got}
    assert by_user_ver[("a", 1)][1] == by_user_ver[("a", 2)][0]
    assert by_user_ver[("a", 2)][1] == by_user_ver[("a", 3)][0]


def test_scd2_duplicate_timestamp_orders_by_id(spark):
    """Two changes at the same instant version by event id — the
    deterministic (ts, id) order, so the LATER id wins the episode."""
    rows = [
        ("a", _ts(1), 1, "x"),
        ("a", _ts(2), 2, "y"),
        ("a", _ts(2), 3, "z"),  # same ts, higher id: lands after y
    ]
    got = _build(spark, rows)
    assert [(s, v, c) for _, s, _, _, c, v in got] == [
        ("x", 1, False), ("y", 2, False), ("z", 3, True),
    ]
    # the y episode is zero-length but present (audit trail, not loss)
    y = [g for g in got if g[1] == "y"][0]
    assert y[2] == y[3] == _ts(2)


def test_scd2_null_rows_carry_no_observation(spark):
    rows = [
        ("a", _ts(1), 1, "x"),
        ("a", None, 2, "y"),      # untimed: dropped
        ("a", _ts(3), None, "y"),  # unidentified: dropped
        ("a", _ts(4), 4, None),    # stateless: dropped
        (None, _ts(5), 5, "y"),    # unkeyed: dropped
    ]
    got = _build(spark, rows)
    assert got == [("a", "x", _ts(1), None, True, 1)]
