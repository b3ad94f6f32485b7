from __future__ import annotations

import datetime

from purpleair_data_logger_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),  # after right@09:00 → match
            (1, _ts("2024-01-01T09:00:00"), 101),  # tie with right@09:00 → match (inclusive)
            (1, _ts("2024-01-01T08:00:00"), 102),  # before any right → NULL
            (2, _ts("2024-01-01T10:00:00"), 103),  # other key, no right rows → NULL
        ],
        "user_id int, ts timestamp, event_id int",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 9.0),
            (1, _ts("2024-01-01T09:30:00"), 9.5),
        ],
        "user_id int, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            left,
            right,
            on=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_payload=["ts", "value"],
        ).collect()
    }
    assert len(out) == 4
    assert out[100]["asof_value"] == 9.5  # latest at-or-before 10:00
    assert out[100]["asof_ts"] == _ts("2024-01-01T09:30:00")
    assert out[101]["asof_value"] == 9.0  # equal-ts tie matches
    assert out[102]["asof_value"] is None
    assert out[103]["asof_value"] is None


def test_forward_asof_next_match_and_ties(spark):
    """direction="forward": earliest right at-or-after each left row,
    equal timestamps match (inclusive boundary), no later right row
    -> NULLs."""

    def _t(s):
        return datetime.datetime(2024, 1, 1, 0, s // 60, s % 60)

    left = spark.createDataFrame(
        [(1, "u", _t(10)), (2, "u", _t(30)), (3, "u", _t(60))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _t(30), 7.0), ("u", _t(50), 9.0)],
        "user_id string, ts timestamp, value double",
    )
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(
            left,
            right,
            on=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_payload=["ts", "value"],
            direction="forward",
        ).collect()
    }
    assert out[1] == (_t(30), 7.0)   # next match strictly after
    assert out[2] == (_t(30), 7.0)   # equal ts matches (inclusive)
    assert out[3] == (None, None)    # nothing at-or-after

    import pytest

    with pytest.raises(ValueError):
        asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            right_payload=["value"], direction="sideways",
        )


def test_asof_tiebreaker_pins_same_timestamp_winner(spark):
    """Several right rows sharing the boundary timestamp: without a
    tiebreaker the carried payload is scan-order-dependent (round-4
    advisory); with one, backward replays ORDER BY ts DESC, tb DESC
    LIMIT 1 (greatest tb wins) and forward replays ORDER BY ts, tb
    LIMIT 1 (smallest tb wins) — deterministic under any
    partitioning."""

    def _t(s):
        return datetime.datetime(2024, 1, 1, 0, s // 60, s % 60)

    left = spark.createDataFrame(
        [(1, "u", _t(30))], "event_id long, user_id string, ts timestamp"
    )
    # three right rows at the same boundary ts, distinct ids/payloads
    right = spark.createDataFrame(
        [("u", _t(30), 201, 1.0), ("u", _t(30), 203, 3.0), ("u", _t(30), 202, 2.0)],
        "user_id string, ts timestamp, rid long, value double",
    ).repartition(4)

    (back,) = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_payload=["rid", "value"], tiebreaker="rid",
    ).collect()
    assert (back["asof_rid"], back["asof_value"]) == (203, 3.0)

    (fwd,) = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_payload=["rid", "value"], direction="forward",
        tiebreaker="rid",
    ).collect()
    assert (fwd["asof_rid"], fwd["asof_value"]) == (201, 1.0)


def test_asof_null_tiebreaker_loses(spark):
    """A right row with a NULL tiebreaker at the boundary timestamp
    must LOSE to any non-null tiebreaker (round-5 advisory:
    nulls_last let the NULL row win the F.last carry, inverting the
    documented greatest/smallest-wins contract). NULL beats nothing;
    it only wins when it is the sole candidate."""

    def _t(s):
        return datetime.datetime(2024, 1, 1, 0, s // 60, s % 60)

    left = spark.createDataFrame(
        [(1, "u", _t(30)), (2, "v", _t(30))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _t(30), None, 9.0),  # NULL tb: must lose
            ("u", _t(30), 201, 1.0),
            ("u", _t(30), 205, 5.0),   # greatest non-null tb: backward winner
            ("v", _t(30), None, 7.0),  # sole candidate: NULL still matches
        ],
        "user_id string, ts timestamp, rid long, value double",
    ).repartition(4)

    back = {
        r["event_id"]: (r["asof_rid"], r["asof_value"])
        for r in asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            right_payload=["rid", "value"], tiebreaker="rid",
        ).collect()
    }
    assert back[1] == (205, 5.0)
    assert back[2] == (None, 7.0)

    fwd = {
        r["event_id"]: (r["asof_rid"], r["asof_value"])
        for r in asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            right_payload=["rid", "value"], direction="forward",
            tiebreaker="rid",
        ).collect()
    }
    assert fwd[1] == (201, 1.0)  # smallest non-null wins forward
    assert fwd[2] == (None, 7.0)
