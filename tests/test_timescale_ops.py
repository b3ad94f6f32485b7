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


# ---------------------------------------------------------------------------
# CUSUM drift detection (hyperfunctions.cusum_scan)
# ---------------------------------------------------------------------------


def _cusum_ref(rows, slack, threshold, decimals=2):
    """Sequential reference recurrence: per key, S_0=0,
    S_i = max(0, S_{i-1} + v_i - mu - k); alarm when S_i > h.
    Returns {(key, rid): cusum_in_value_units}."""
    scale = 10**decimals
    by_key = {}
    for key, rid, ts, v in rows:
        if v is not None:
            by_key.setdefault(key, []).append((ts, rid, int(round(v * scale))))
    out = {}
    k_s = int(round(slack * scale))
    h_s = int(round(threshold * scale))
    for key, items in by_key.items():
        items.sort()
        total = sum(v for _, _, v in items)
        # truncating division toward zero, as Spark `div` / DuckDB `//`
        mu = total // len(items) if total >= 0 else -((-total) // len(items))
        s = 0
        for ts, rid, v in items:
            s = max(0, s + v - mu - k_s)
            if s > h_s:
                out[(key, rid)] = s / scale
    return out


def _cusum_rows():
    """Two keys over several hours: key 'a' holds a baseline of 10.0
    then bursts to 25.0 for six readings spanning an HOUR BOUNDARY
    (exercises the cross-partition carry at partition_seconds=3600);
    key 'b' stays flat (never alarms). A NULL value is interleaved."""
    rows = []
    for i in range(40):
        rows.append(("a", i, datetime(2024, 1, 1, i // 10, (i % 10) * 6), 10.0))
    for j, i in enumerate(range(40, 46)):
        rows.append(("a", i, datetime(2024, 1, 1, i // 10, (i % 10) * 6), 25.0))
    rows.append(("a", 99, datetime(2024, 1, 1, 5, 0), None))
    for i in range(30):
        rows.append(("b", 200 + i, datetime(2024, 1, 1, i // 10, (i % 10) * 6), 7.5))
    return rows


def test_cusum_matches_sequential_recurrence(spark):
    from purpleair_data_logger_spark.operators import hyperfunctions as hf

    rows = _cusum_rows()
    df = spark.createDataFrame(rows, "key string, rid long, ts timestamp, value double")
    got = {
        (r["key"], r["rid"]): r["cusum"]
        for r in hf.cusum_scan(
            df, "ts", "key", "value", "rid",
            slack=1.0, threshold=20.0, partition_seconds=3600,
        ).collect()
    }
    want = _cusum_ref(rows, 1.0, 20.0)
    assert got == want
    assert want, "fixture must actually alarm"
    assert all(k == "a" for k, _ in want), "flat key must not alarm"


def test_cusum_two_tier_equals_single_partition(spark):
    """partition_seconds=3600 (many calendar partitions per key) and
    partition_seconds=10**9 (everything in one partition — the carry
    logic degenerates) must produce identical alarm sets."""
    from purpleair_data_logger_spark.operators import hyperfunctions as hf

    rows = _cusum_rows()
    df = spark.createDataFrame(rows, "key string, rid long, ts timestamp, value double")
    kw = dict(slack=1.0, threshold=20.0)
    a = hf.cusum_scan(df, "ts", "key", "value", "rid", partition_seconds=3600, **kw)
    b = hf.cusum_scan(df, "ts", "key", "value", "rid", partition_seconds=10**9, **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cusum_below_threshold_is_empty(spark):
    from purpleair_data_logger_spark.operators import hyperfunctions as hf

    rows = [("a", i, datetime(2024, 1, 1, 0, i), 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, "key string, rid long, ts timestamp, value double")
    assert (
        hf.cusum_scan(
            df, "ts", "key", "value", "rid", slack=1.0, threshold=3.0
        ).count()
        == 0
    )


# ---------------------------------------------------------------------------
# MAD robust outliers (aggregations.mad_outliers)
# ---------------------------------------------------------------------------


def test_mad_outliers_flags_planted_points_only(spark):
    """9 baseline points tightly around 50 plus one wild point: median
    50.0, MAD 1.0, so only |v-50| > 3.5 flags. The wild point cannot
    drag the threshold (robustness) — unlike a mean/stddev z-score."""
    base = [50.0 + d for d in (-2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0)]
    rows = [("t", i, v) for i, v in enumerate(base)] + [("t", 99, 500.0)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    got = agg.mad_outliers(df, "event_type", "value", ["event_id"], k=3.5).collect()
    assert [(r["event_id"], r["value"]) for r in got] == [(99, 500.0)]
    r = got[0]
    assert r["group_median"] == 50.0 and r["group_mad"] == 1.0
    assert r["robust_z"] == 450.0


def test_mad_outliers_degenerate_group_flags_nothing(spark):
    """>50% of mass on one value → MAD = 0 → no flags (not all flags)."""
    rows = [("t", i, 10.0) for i in range(6)] + [("t", 10, 99.0)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    assert agg.mad_outliers(df, "event_type", "value", ["event_id"]).count() == 0


def test_mad_outliers_matches_numpy_reference(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vals = np.round(rng.lognormal(3.0, 0.8, 400), 2)
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    got = {r["event_id"] for r in
           agg.mad_outliers(df, "event_type", "value", ["event_id"], k=3.5).collect()}

    def lower_median(a):
        s = np.sort(a)
        return float(s[(len(s) + 1) // 2 - 1])

    med = lower_median(vals)
    mad = lower_median(np.abs(vals - med))
    want = {i for i, v in enumerate(vals) if abs(v - med) > 3.5 * mad}
    assert got == want and want


# ---------------------------------------------------------------------------
# Exact 2-D stats (hyperfunctions.stats2d_exact)
# ---------------------------------------------------------------------------


def test_stats2d_matches_numpy(spark):
    import numpy as np
    from purpleair_data_logger_spark.operators import hyperfunctions as hf

    rng = np.random.RandomState(3)
    x = rng.randint(0, 50, 200)
    y = (0.6 * x + rng.randint(0, 20, 200)).astype("int64")
    rows = [("g", int(a), int(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    r = hf.stats2d_exact(df, "grp", "x", "y").collect()[0]
    assert r["n_pairs"] == 200
    assert r["sum_x"] == int(x.sum()) and r["sum_y"] == int(y.sum())
    assert abs(r["corr_xy"] - float(np.corrcoef(x, y)[0, 1])) < 1e-12
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(r["slope"] - slope) < 1e-9
    assert abs(r["intercept"] - intercept) < 1e-9


def test_stats2d_degenerate_and_nulls(spark):
    from purpleair_data_logger_spark.operators import hyperfunctions as hf

    rows = [
        ("const_x", 5, 1), ("const_x", 5, 9),        # zero x-variance
        ("ok", 1, 2), ("ok", 2, 4), ("ok", None, 7), # NULL pair dropped
        ("ok", 3, None),
    ]
    df = spark.createDataFrame(rows, "grp string, x int, y int")
    out = {r["grp"]: r for r in hf.stats2d_exact(df, "grp", "x", "y").collect()}
    assert out["const_x"]["corr_xy"] is None
    assert out["const_x"]["slope"] is None
    assert out["const_x"]["intercept"] is None
    ok = out["ok"]
    assert ok["n_pairs"] == 2 and ok["slope"] == 2.0 and ok["intercept"] == 0.0


def test_distribution_drift_planted_shift(spark):
    """distribution_drift: a planted mass shift between windows shows
    up bin-exact — counts, floored-bp shares, per-bin drift, and the
    report TVD all match hand arithmetic; an empty window yields zero
    shares, not a division error."""
    import datetime as _dt

    from purpleair_data_logger_spark.operators.aggregations import (
        distribution_drift,
    )

    ref_t = _dt.datetime(2024, 1, 1)
    cur_t = _dt.datetime(2024, 2, 1)
    # ref: 8 rows in bin 0, 2 in bin 1; cur: 2 in bin 0, 8 in bin 2
    rows = (
        [(ref_t, 1.0)] * 8 + [(ref_t, 7.0)] * 2
        + [(cur_t, 1.0)] * 2 + [(cur_t, 12.0)] * 8
    )
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {
        r["bin"]: r
        for r in distribution_drift(
            df, "ts", "value", split_ts="2024-01-16", bin_width=5.0
        ).collect()
    }
    assert set(got) == {0, 1, 2}
    b0, b1, b2 = got[0], got[1], got[2]
    assert (b0["n_ref"], b0["n_cur"]) == (8, 2)
    assert (b1["n_ref"], b1["n_cur"]) == (2, 0)
    assert (b2["n_ref"], b2["n_cur"]) == (0, 8)
    assert (b0["share_ref_bp"], b0["share_cur_bp"]) == (8000, 2000)
    assert (b1["share_ref_bp"], b1["share_cur_bp"]) == (2000, 0)
    assert (b2["share_ref_bp"], b2["share_cur_bp"]) == (0, 8000)
    assert b0["drift_bp"] == 6000 and b1["drift_bp"] == 2000
    assert b2["drift_bp"] == 8000
    # TVD = (6000 + 2000 + 8000) / 2
    assert all(r["tvd_bp"] == 8000 for r in got.values())
    # empty current window: shares 0, no division error
    ref_only = spark.createDataFrame(
        [(ref_t, 1.0)] * 4, "ts timestamp, value double"
    )
    one = distribution_drift(
        ref_only, "ts", "value", split_ts="2024-01-16", bin_width=5.0
    ).collect()
    assert len(one) == 1
    assert one[0]["share_ref_bp"] == 10000 and one[0]["share_cur_bp"] == 0
    assert one[0]["tvd_bp"] == 5000


def test_streaming_drift_matches_batch(spark, tmp_path):
    """The streaming drift mirror: after two micro-batches, the
    engine-maintained bin cells equal the batch binning exactly, and
    the report derived from the streamed snapshot is bit-identical to
    running batch distribution_drift over everything ingested."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from purpleair_data_logger_spark.operators.aggregations import (
        distribution_drift,
    )
    from purpleair_data_logger_spark.streaming.drift import (
        drift_bins_stream,
        drift_report_from_bins,
    )

    ref_t = _dt.datetime(2024, 1, 1)
    cur_t = _dt.datetime(2024, 2, 1)
    b1 = [(ref_t, 1.0)] * 6 + [(cur_t, 12.0)] * 3
    b2 = [(ref_t, 7.0)] * 2 + [(cur_t, 1.0)] * 4 + [(cur_t, 12.0)] * 5
    src = str(tmp_path / "drift_src")
    for rows in (b1, b2):
        (
            spark.createDataFrame(rows, "ts timestamp, value double")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = drift_bins_stream(
        stream, "ts", "value", split_ts="2024-01-16", bin_width=5.0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("drift_bins")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snap = spark.sql("SELECT * FROM drift_bins")
    streamed_report = sorted(
        tuple(r) for r in drift_report_from_bins(snap, bin_width=5.0).collect()
    )
    whole = spark.createDataFrame(b1 + b2, "ts timestamp, value double")
    batch_report = sorted(
        tuple(r)
        for r in distribution_drift(
            whole, "ts", "value", split_ts="2024-01-16", bin_width=5.0
        ).collect()
    )
    assert streamed_report == batch_report
    assert len(streamed_report) == 3  # bins 0, 1, 2 occupied
