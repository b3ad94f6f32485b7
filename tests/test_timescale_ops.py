"""Planted-fixture tests for the TimescaleDB-hyperfunction-parity
operators: gapfill+LOCF, time-weighted average, and the integer-exact
trailing z-score spike flags (reference read-path context:
PurpleAirPSQLQueryStatements.py:564-580, the Grafana dashboard panels).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators import aggregations as agg


def _ts(minute: int, second: int = 0, hour: int = 0):
    return datetime(2024, 1, 1, hour, minute, second)


def test_gapfill_locf_fills_interior_gaps_and_flags_them(spark):
    # sensor "a" reads in buckets 0 and 3 of [0..3]; "b" only in bucket 2.
    df = spark.createDataFrame(
        [
            ("a", _ts(0, 30), 1.0),
            ("a", _ts(0, 45), 5.0),  # max in bucket 0 -> 5.0
            ("a", _ts(3, 10), 7.0),
            ("b", _ts(2, 5), 9.0),
        ],
        "key string, ts timestamp, value double",
    )
    out = agg.gapfill_locf(df, "ts", 60, ["key"], "value").collect()
    got = {(r["key"], r["bucket_ts"].minute): (r["value_filled"], r["is_gapfilled"]) for r in out}
    # spine covers the global [min,max] bucket range for every key
    assert len(out) == 2 * 4
    assert got[("a", 0)] == (5.0, False)
    assert got[("a", 1)] == (5.0, True)   # carried forward
    assert got[("a", 2)] == (5.0, True)
    assert got[("a", 3)] == (7.0, False)
    # "b" has no reading before bucket 2: leading buckets stay NULL
    assert got[("b", 0)] == (None, True)
    assert got[("b", 1)] == (None, True)
    assert got[("b", 2)] == (9.0, False)
    assert got[("b", 3)] == (9.0, True)


def test_time_weighted_avg_weights_by_holding_duration(spark):
    # One 60 s bucket: value 1.0 held for 30 s, then 3.0 for the
    # remaining 30 s -> TWA = 2.0. A plain mean of samples would give
    # the same 2.0 here, so add a burst: three 3.0 readings in the
    # last second must NOT drag the TWA toward 3.0 the way a plain
    # mean (2.2) would.
    df = spark.createDataFrame(
        [
            ("a", 1, _ts(0, 0), 1.0),
            ("a", 2, _ts(0, 30), 3.0),
            ("b", 3, _ts(0, 0), 1.0),
            ("b", 4, _ts(0, 30), 3.0),
            ("b", 5, _ts(0, 58), 3.0),
            ("b", 6, _ts(0, 59), 3.0),
        ],
        "key string, id int, ts timestamp, value double",
    )
    out = {
        r["key"]: r
        for r in agg.time_weighted_avg(
            df, "ts", 60, ["key"], "value", "id"
        ).collect()
    }
    assert out["a"]["time_weighted_avg"] == 2.0
    assert out["a"]["covered_us"] == 60_000_000
    assert out["b"]["time_weighted_avg"] == 2.0  # duration-weighted, not sample-weighted
    assert out["b"]["n_samples"] == 4


def test_time_weighted_avg_last_sample_extends_to_bucket_end(spark):
    # single reading at t=45s of a 60s bucket: weight = 15s only
    df = spark.createDataFrame(
        [("a", 1, _ts(0, 45), 4.0)],
        "key string, id int, ts timestamp, value double",
    )
    row = agg.time_weighted_avg(df, "ts", 60, ["key"], "value", "id").collect()[0]
    assert row["time_weighted_avg"] == 4.0
    assert row["covered_us"] == 15_000_000


def test_rolling_zscore_flags_planted_spike_only(spark):
    # 10 calm readings (~10.0 +/- 0.3) then one 10x excursion; the
    # excursion flags, the calm rows (including the post-spike one,
    # whose window now contains the spike and thus a huge variance)
    # do not.
    base = [
        ("s", i, _ts(i), 10.0 + (0.1 * (i % 3) - 0.1)) for i in range(10)
    ]
    rows = base + [("s", 10, _ts(10), 100.0), ("s", 11, _ts(11), 10.0)]
    df = spark.createDataFrame(
        rows, "key string, id int, ts timestamp, value double"
    )
    out = agg.rolling_zscore_flags(
        df,
        "ts",
        "key",
        "value",
        "id",
        trailing_seconds=3600,
        z_threshold=3,
        min_samples=5,
    )
    flagged = {r["id"] for r in out.collect() if r["is_spike"]}
    assert flagged == {10}


def test_rolling_zscore_needs_min_samples_and_is_one_sided(spark):
    rows = [
        # only 3 readings before the jump -> below min_samples, no flag
        ("t", 0, _ts(0), 10.0),
        ("t", 1, _ts(1), 10.2),
        ("t", 2, _ts(2), 9.8),
        ("t", 3, _ts(3), 100.0),
        # downward excursion on a well-sampled key -> one-sided, no flag
        *[("u", 10 + i, _ts(i), 50.0 + (i % 5)) for i in range(10)],
        ("u", 30, _ts(30), 0.5),
    ]
    df = spark.createDataFrame(
        rows, "key string, id int, ts timestamp, value double"
    )
    out = agg.rolling_zscore_flags(
        df,
        "ts",
        "key",
        "value",
        "id",
        trailing_seconds=3600,
        z_threshold=3,
        min_samples=5,
    )
    assert {r["id"] for r in out.collect() if r["is_spike"]} == set()


def test_gapfill_corpus_scan_is_single_pass(spark, sf_dir):
    """The events table must be aggregated exactly once; spine +
    LOCF run over the bucket grid, and the 1-row bounds frame joins
    broadcast."""
    from purpleair_data_logger_spark import catalog
    from purpleair_data_logger_spark.plans import explain as E

    df = catalog.all_queries()["gapfill_locf_hourly"].fn(spark, sf_dir)
    plan = E.formatted_plan(df)
    # three column-pruned scans (keys / bounds / value-agg), every one
    # behind a map-side-combined HashAggregate; the 1-row bounds frame
    # and the bucket aggregate attach as broadcasts — the spine join
    # never sort-merges.
    assert len(E.read_schemas(plan)) <= 3
    for schema in E.read_schemas(plan):
        assert "value" not in schema or "user_id" in schema  # pruned reads
    assert "BroadcastNestedLoopJoin Cross" in plan  # 1-row bounds attach
    assert "SortMergeJoin" not in plan


def test_gapfill_interpolate_linear_fill_and_null_edges(spark):
    # key "a": observed at buckets 0 (v=3.0) and 3 (v=9.0) of a 4-bucket
    # range -> buckets 1,2 interpolate to 5.0, 7.0. Key "b" observed
    # only at bucket 2 -> its other buckets have one-sided context and
    # stay NULL (no extrapolation at series edges).
    df = spark.createDataFrame(
        [
            ("a", _ts(0, 10), 3.0),
            ("a", _ts(3, 20), 9.0),
            ("b", _ts(2, 5), 4.0),
        ],
        "key string, ts timestamp, value double",
    )
    out = agg.gapfill_interpolate(df, "ts", 60, ["key"], "value").collect()
    got = {
        (r["key"], r["bucket_ts"].minute): (r["value_filled"], r["is_gapfilled"])
        for r in out
    }
    assert len(out) == 8
    assert got[("a", 0)] == (3.0, False)
    assert got[("a", 1)] == (5.0, True)
    assert got[("a", 2)] == (7.0, True)
    assert got[("a", 3)] == (9.0, False)
    assert got[("b", 0)] == (None, True)
    assert got[("b", 1)] == (None, True)
    assert got[("b", 2)] == (4.0, False)
    assert got[("b", 3)] == (None, True)


def test_grouped_median_exact_odd_even_and_ties(spark):
    df = spark.createDataFrame(
        [
            # odd n: median = 3rd of 5
            *[("a", v) for v in (5.0, 1.0, 3.0, 2.0, 4.0)],
            # even n: LOWER median (2nd of 4), no interpolation
            *[("b", v) for v in (10.0, 20.0, 30.0, 40.0)],
            # ties straddling the median rank
            *[("c", v) for v in (1.0, 2.0, 2.0, 2.0, 9.0)],
        ],
        "key string, value double",
    )
    got = {
        r["key"]: (r["median"], r["n"])
        for r in agg.grouped_median_exact(df, "key", "value").collect()
    }
    assert got == {"a": (3.0, 5), "b": (20.0, 4), "c": (2.0, 5)}


def test_grouped_median_property_vs_sorted_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["g1", "g2", "g3"]),
                st.integers(min_value=-50, max_value=50),
            ),
            min_size=1,
            max_size=60,
        )
    )
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(rows):
        df = spark.createDataFrame(
            [(g, float(v)) for g, v in rows], "key string, value double"
        )
        got = {
            r["key"]: (r["median"], r["n"])
            for r in agg.grouped_median_exact(df, "key", "value").collect()
        }
        by_key: dict = {}
        for g, v in rows:
            by_key.setdefault(g, []).append(float(v))
        want = {
            g: (sorted(vs)[(len(vs) + 1) // 2 - 1], len(vs))
            for g, vs in by_key.items()
        }
        assert got == want

    check()
