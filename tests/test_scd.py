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


def test_streaming_scd2_matches_batch_bit_exact(spark, tmp_path):
    """Closed episodes streamed across two micro-batches + the latest
    open emission equal the batch SCD2 build exactly, including an
    episode that spans the batch boundary; an out-of-order straggler
    is dropped per the disorder contract."""
    from purpleair_data_logger_spark.streaming.scd import scd2_by_key

    b1 = [
        ("a", _ts(1), 1, "x"),
        ("a", _ts(2), 2, "x"),
        ("a", _ts(3), 3, "y"),
        ("b", _ts(1), 4, "p"),
    ]
    b2 = [
        ("a", _ts(4), 5, "y"),   # extends the open y episode
        ("a", _ts(6), 6, "z"),   # closes it
        ("a", _ts(2), 7, "w"),   # STRAGGLER: at/before cursor → dropped
        ("b", _ts(8), 8, "q"),
    ]
    src = str(tmp_path / "scd_src")
    for chunk in (b1, b2):
        (
            spark.createDataFrame(
                chunk, "user string, ts timestamp, id long, st string"
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    stream = (
        spark.readStream.schema("user string, ts timestamp, id long, st string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        scd2_by_key(stream, "user", "ts", "id", "st")
        .writeStream.format("memory")
        .queryName("scd2_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    emitted = spark.sql("SELECT * FROM scd2_stream").collect()
    closed = {
        (r["user"], r["state"], r["valid_from"], r["valid_to"], r["version_n"])
        for r in emitted if not r["is_current"]
    }
    latest_seen = {}
    for r in emitted:
        if r["is_current"]:
            cur = latest_seen.get(r["user"])
            if cur is None or r["rows_seen"] > cur["rows_seen"]:
                latest_seen[r["user"]] = r
    open_rows = {
        (u, r["state"], r["valid_from"], r["valid_to"], r["version_n"])
        for u, r in latest_seen.items()
    }
    # the batch truth excludes the dropped straggler
    kept = b1 + [r for r in b2 if r[2] != 7]
    batch = scd2_from_changelog(
        spark.createDataFrame(
            kept, "user string, ts timestamp, id long, st string"
        ),
        ["user"], "ts", "id", "st",
    ).collect()
    want_closed = {
        (r["user"], r["state"], r["valid_from"], r["valid_to"], r["version_n"])
        for r in batch if not r["is_current"]
    }
    want_open = {
        (r["user"], r["state"], r["valid_from"], r["valid_to"], r["version_n"])
        for r in batch if r["is_current"]
    }
    assert closed == want_closed
    assert open_rows == want_open


def test_streaming_scd2_drops_null_keys(spark, tmp_path):
    """NULL-key changes carry no observation in the mirror, matching
    the batch operator's key filter (code-review r10: groupBy would
    otherwise form a NULL-key group and emit episodes batch never
    builds)."""
    from purpleair_data_logger_spark.streaming.scd import scd2_by_key

    rows = [
        ("a", _ts(1), 1, "x"),
        (None, _ts(2), 2, "y"),
        (None, _ts(3), 3, "z"),
    ]
    src = str(tmp_path / "scd_null")
    (
        spark.createDataFrame(
            rows, "user string, ts timestamp, id long, st string"
        )
        .coalesce(1)
        .write.parquet(src)
    )
    stream = spark.readStream.schema(
        "user string, ts timestamp, id long, st string"
    ).parquet(src)
    q = (
        scd2_by_key(stream, "user", "ts", "id", "st")
        .writeStream.format("memory")
        .queryName("scd_null")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM scd_null").collect()
    assert {r["user"] for r in got} == {"a"}
