"""Planted-fixture tests for the second hyperfunction wave: M4
downsampling, counter-reset deltas, heartbeat uptime, and weighted
A-Res sampling (reference read-path context:
PurpleAirPSQLQueryStatements.py:564-580 — the Grafana/TimescaleDB
stack these operators serve at scale).
"""

from __future__ import annotations

import math

import pytest
from datetime import datetime

from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators import hyperfunctions as hf
from purpleair_data_logger_spark.operators import sampling as smp
from purpleair_data_logger_spark.operators.dedup import md5_long


def _ts(minute: int, second: int = 0, hour: int = 0):
    return datetime(2024, 1, 1, hour, minute, second)


# ---------------------------------------------------------------------------
# M4 downsampling
# ---------------------------------------------------------------------------


def test_m4_extremes_and_tie_rules(spark):
    # one 60 s bucket for key "a": first reading 2.0, last 4.0, min
    # 1.0 achieved TWICE (t=10 and t=40) -> t_at_min is the earliest,
    # max 9.0 achieved twice (t=20, t=50) -> t_at_max is the latest.
    df = spark.createDataFrame(
        [
            ("a", _ts(0, 5), 2.0),
            ("a", _ts(0, 10), 1.0),
            ("a", _ts(0, 20), 9.0),
            ("a", _ts(0, 40), 1.0),
            ("a", _ts(0, 50), 9.0),
            ("a", _ts(0, 55), 4.0),
            ("a", _ts(0, 30), None),  # NULL carries no pixel
        ],
        "key string, ts timestamp, value double",
    )
    (row,) = hf.m4_downsample(df, "ts", "key", "value", 60).collect()
    assert row["n"] == 6
    assert row["v_first"] == 2.0 and row["v_last"] == 4.0
    assert row["v_min"] == 1.0 and row["t_at_min"] == _ts(0, 10)
    assert row["v_max"] == 9.0 and row["t_at_max"] == _ts(0, 50)


def test_m4_buckets_and_keys_are_independent(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts(0, 10), 1.0),
            ("a", _ts(1, 10), 5.0),
            ("b", _ts(0, 20), 3.0),
        ],
        "key string, ts timestamp, value double",
    )
    out = hf.m4_downsample(df, "ts", "key", "value", 60).collect()
    got = {(r["key"], r["bucket_ts"].minute): r["v_min"] for r in out}
    assert got == {("a", 0): 1.0, ("a", 1): 5.0, ("b", 0): 3.0}


# ---------------------------------------------------------------------------
# counter_delta
# ---------------------------------------------------------------------------


def test_counter_delta_resets_and_bucket_boundary(spark):
    # key "a": 10 -> 15 (+5) in bucket 0; bucket 1 opens at 3 (RESET:
    # +3, counted), then 3 -> 8 (+5). Bucket 0 delta = 5 (first-ever
    # reading contributes 0), bucket 1 delta = 3 + 5 = 8 with 1 reset.
    df = spark.createDataFrame(
        [
            (1, "a", _ts(0, 10), 10.0),
            (2, "a", _ts(0, 40), 15.0),
            (3, "a", _ts(1, 10), 3.0),
            (4, "a", _ts(1, 50), 8.0),
        ],
        "id long, key string, ts timestamp, value double",
    )
    out = hf.counter_delta(df, "ts", "key", "value", "id", 60).collect()
    got = {
        r["bucket_ts"].minute: (r["counter_delta"], r["n_resets"], r["n_samples"])
        for r in out
    }
    assert got == {0: (5.0, 0, 2), 1: (8.0, 1, 2)}


def test_counter_delta_monotone_equals_max_minus_first(spark):
    # no resets: total delta across buckets == last - first reading.
    rows = [(i, "k", _ts(i // 3, (i % 3) * 20), float(i * 7)) for i in range(9)]
    df = spark.createDataFrame(
        rows, "id long, key string, ts timestamp, value double"
    )
    out = hf.counter_delta(df, "ts", "key", "value", "id", 60).collect()
    assert sum(r["counter_delta"] for r in out) == 8 * 7.0
    assert all(r["n_resets"] == 0 for r in out)


def test_counter_delta_charges_boundary_pair_to_later_bucket(spark):
    # single pair straddling the bucket edge: bucket 0 has the first
    # reading only (delta 0), bucket 1 gets the +2 increment.
    df = spark.createDataFrame(
        [(1, "a", _ts(0, 50), 1.0), (2, "a", _ts(1, 5), 3.0)],
        "id long, key string, ts timestamp, value double",
    )
    out = hf.counter_delta(df, "ts", "key", "value", "id", 60).collect()
    got = {r["bucket_ts"].minute: r["counter_delta"] for r in out}
    assert got == {0: 0.0, 1: 2.0}


# ---------------------------------------------------------------------------
# heartbeat_uptime
# ---------------------------------------------------------------------------


def test_heartbeat_truncation_and_gap(spark):
    # timeout 30 s, bucket 60 s. Readings at t=0, 10 (truncates the
    # first to 10 s), then silence: second interval runs its full 30 s.
    # Coverage in bucket 0 = 10 + 30 = 40 s.
    df = spark.createDataFrame(
        [(1, "a", _ts(0, 0)), (2, "a", _ts(0, 10))],
        "id long, key string, ts timestamp",
    )
    (row,) = hf.heartbeat_uptime(df, "ts", "key", "id", 60, 30).collect()
    assert row["uptime_us"] == 40_000_000
    assert abs(row["uptime_ratio"] - 40 / 60) < 1e-12


def test_heartbeat_interval_spans_bucket_edge(spark):
    # reading at 0:50 with 30 s timeout: 10 s in bucket 0, 20 s in
    # bucket 1 — the explode attributes the split exactly.
    df = spark.createDataFrame(
        [(1, "a", _ts(0, 50))], "id long, key string, ts timestamp"
    )
    out = hf.heartbeat_uptime(df, "ts", "key", "id", 60, 30).collect()
    got = {r["bucket_ts"].minute: r["uptime_us"] for r in out}
    assert got == {0: 10_000_000, 1: 20_000_000}


def test_heartbeat_cross_bucket_next_reading_truncates(spark):
    # reading at 0:50, next reading at 1:05 (within timeout 60 s):
    # the first interval must truncate at 1:05 even though the next
    # reading lives in ANOTHER bucket (the two-tier lead stitch).
    df = spark.createDataFrame(
        [(1, "a", _ts(0, 50)), (2, "a", _ts(1, 5))],
        "id long, key string, ts timestamp",
    )
    out = hf.heartbeat_uptime(df, "ts", "key", "id", 60, 60).collect()
    got = {r["bucket_ts"].minute: r["uptime_us"] for r in out}
    # bucket 0: 10 s from the first interval; bucket 1: 5 s from the
    # first (50->65 clipped) + 60 s full timeout of the second = 65 s
    assert got == {0: 10_000_000, 1: 60_000_000, 2: 5_000_000}


def test_heartbeat_duplicate_timestamp_drops_empty_interval(spark):
    # two readings at the same microsecond: the earlier one's interval
    # is empty and must vanish (NOT generate a descending sequence).
    df = spark.createDataFrame(
        [(1, "a", _ts(0, 10)), (2, "a", _ts(0, 10))],
        "id long, key string, ts timestamp",
    )
    (row,) = hf.heartbeat_uptime(df, "ts", "key", "id", 60, 30).collect()
    assert row["uptime_us"] == 30_000_000  # one full interval, once


def test_heartbeat_uptime_never_exceeds_bucket(spark):
    # dense 5 s cadence for 3 minutes: every covered bucket saturates
    # at exactly the bucket length, never over (union, not sum).
    rows = [(i, "a", _ts(i // 12, (i % 12) * 5)) for i in range(36)]
    df = spark.createDataFrame(rows, "id long, key string, ts timestamp")
    out = hf.heartbeat_uptime(df, "ts", "key", "id", 60, 30).collect()
    assert all(r["uptime_us"] <= 60_000_000 for r in out)
    got = {r["bucket_ts"].minute: r["uptime_us"] for r in out}
    assert got[0] == 60_000_000 and got[1] == 60_000_000


# ---------------------------------------------------------------------------
# weighted_sample_per_group
# ---------------------------------------------------------------------------


def _python_a_res(rows: list[tuple[int, int]], k: int) -> list[int]:
    """Reference A-Res over the same portable uniforms: rows are
    (key, weight); returns the selected keys."""
    import hashlib

    M = 1 << 40
    scored = []
    for key, w in rows:
        h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
        u = ((h % M) + 1) / (M + 1)
        scored.append((math.log(u) / w, -key, key))
    scored.sort(reverse=True)
    return [key for _, _, key in scored[:k]]


def test_weighted_sample_matches_python_reference(spark):
    rows = [(i, (i * 37) % 19 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, weight long").withColumn(
        "grp", F.lit("g")
    )
    out = smp.weighted_sample_per_group(df, "doc_id", "grp", "weight", 25)
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == sorted(_python_a_res(rows, 25))


def test_weighted_sample_deterministic_across_partitioning(spark):
    rows = [(i, i % 7 + 1, "g%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, weight long, grp string")
    a = {
        (r["grp"], r["doc_id"], r["sample_rank"])
        for r in smp.weighted_sample_per_group(
            df, "doc_id", "grp", "weight", 10
        ).collect()
    }
    b = {
        (r["grp"], r["doc_id"], r["sample_rank"])
        for r in smp.weighted_sample_per_group(
            df.repartition(13, "doc_id"), "doc_id", "grp", "weight", 10
        ).collect()
    }
    assert a == b and len(a) == 30


def test_weighted_sample_small_group_returns_all(spark):
    df = spark.createDataFrame(
        [(1, 5, "g"), (2, 1, "g"), (3, 0, "g"), (4, None, "g")],
        "doc_id long, weight int, grp string",
    )
    out = smp.weighted_sample_per_group(df, "doc_id", "grp", "weight", 10)
    # zero/NULL weights have no defined priority and are excluded
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


def test_weighted_sample_prefers_heavy_rows(spark):
    # one row carries 10^6 × the weight of the rest: its priority
    # ln(u)/w is ~0⁻ and must win rank 1 for any u values.
    rows = [(i, 1) for i in range(1, 50)] + [(99, 1_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, weight long").withColumn(
        "grp", F.lit("g")
    )
    out = smp.weighted_sample_per_group(df, "doc_id", "grp", "weight", 5)
    top = {r["doc_id"]: r["sample_rank"] for r in out.collect()}
    assert top[99] == 1


# ---------------------------------------------------------------------------
# grouped_percentiles_exact
# ---------------------------------------------------------------------------


def test_percentiles_nearest_rank_small_groups(spark):
    from purpleair_data_logger_spark.operators import aggregations as agg

    # group g: values 1..10 -> P50 = ceil(0.5*10)=5th = 5.0,
    # P95 = ceil(9.5)=10th = 10.0, P99 = 10.0.
    rows = [("g", float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = agg.grouped_percentiles_exact(df, "grp", "v", (5000, 9500, 9900))
    got = {r["p_bp"]: r["pctl_value"] for r in out.collect()}
    assert got == {5000: 5.0, 9500: 10.0, 9900: 10.0}


def test_percentiles_p50_matches_exact_median(spark):
    from purpleair_data_logger_spark.operators import aggregations as agg

    rows = [("a", float((i * 13) % 7)) for i in range(25)] + [
        ("b", float((i * 5) % 11)) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    med = {
        r["grp"]: r["median"]
        for r in agg.grouped_median_exact(df, "grp", "v").collect()
    }
    p50 = {
        r["grp"]: r["pctl_value"]
        for r in agg.grouped_percentiles_exact(df, "grp", "v", (5000,)).collect()
    }
    assert med == p50


def test_percentiles_ties_share_rank_interval(spark):
    from purpleair_data_logger_spark.operators import aggregations as agg

    # 99 copies of 1.0 and one 2.0: P95 target rank 95 falls inside
    # the tie block -> 1.0; P99 -> rank 99 -> still 1.0; P100-equiv
    # via 10000 bp -> 2.0.
    rows = [("g", 1.0)] * 99 + [("g", 2.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = agg.grouped_percentiles_exact(df, "grp", "v", (9500, 9900, 10000))
    got = {r["p_bp"]: r["pctl_value"] for r in out.collect()}
    assert got == {9500: 1.0, 9900: 1.0, 10000: 2.0}


def test_state_agg_locf_durations_and_boundary_stitch(spark):
    """state_agg: LOCF durations per (key, state) — cross-DAY
    successor stitch (partition_seconds=86400 two-tier lead), the
    open-ended last reading contributes nothing, NULL states carry
    no sample."""
    d = datetime

    rows = [
        (1, "a", d(2024, 1, 1, 23, 0), "up"),
        (2, "a", d(2024, 1, 1, 23, 30), "down"),
        (3, "a", d(2024, 1, 2, 0, 30), "up"),    # day-boundary stitch
        (4, "a", d(2024, 1, 2, 1, 0), "up"),
        (5, "a", d(2024, 1, 2, 1, 30), None),    # no sample
        (6, "a", d(2024, 1, 2, 3, 0), "down"),   # open tail: 0 us
    ]
    df = spark.createDataFrame(rows, "id long, key string, ts timestamp, st string")
    got = {
        r["st"]: (r["duration_us"], r["n_samples"])
        for r in hf.state_agg(df, "ts", "key", "st", "id").collect()
    }
    # up: 30min (23:00->23:30) + 30min (00:30->01:00) + 120min
    # (01:00->03:00; the NULL reading is not a successor) = 180min
    # down: 60min (23:30->00:30, ACROSS the day partition)
    assert got == {
        "up": (180 * 60_000_000, 3),
        "down": (60 * 60_000_000, 1),
    }


def test_state_timeline_transitions_including_day_boundary(spark):
    """state_timeline: one row per state CHANGE; the first reading of
    a day stitches to the PREVIOUS day's last state (no phantom
    transition when the state held overnight, a real one when it
    changed)."""
    d = datetime

    rows = [
        (1, "a", d(2024, 1, 1, 23, 0), "up"),
        (2, "a", d(2024, 1, 1, 23, 30), "down"),
        (3, "a", d(2024, 1, 2, 0, 30), "up"),
        (4, "a", d(2024, 1, 2, 1, 0), "up"),     # same state: no row
        (6, "a", d(2024, 1, 2, 3, 0), "down"),
        (7, "b", d(2024, 1, 2, 0, 0), "ok"),     # first-ever: no row
        (8, "b", d(2024, 1, 3, 5, 0), "ok"),     # held overnight: no row
    ]
    df = spark.createDataFrame(rows, "id long, key string, ts timestamp, st string")
    got = sorted(
        (r["key"], r["transition_ts"], r["from_state"], r["to_state"])
        for r in hf.state_timeline(df, "ts", "key", "st", "id").collect()
    )
    assert got == [
        ("a", d(2024, 1, 1, 23, 30), "up", "down"),
        ("a", d(2024, 1, 2, 0, 30), "down", "up"),
        ("a", d(2024, 1, 2, 3, 0), "up", "down"),
    ]


def test_state_agg_bucketed_clips_and_sums_to_totals(spark):
    """duration_in-style bucketing: an interval spanning bucket edges
    is clipped exactly onto each hour it touches, and the per-bucket
    rows sum back to state_agg's per-state totals."""
    d = datetime

    rows = [
        (1, "a", d(2024, 1, 1, 0, 30), "up"),    # up 00:30 -> 01:15
        (2, "a", d(2024, 1, 1, 1, 15), "down"),  # down 01:15 -> 03:00
        (3, "a", d(2024, 1, 1, 3, 0), "up"),     # open tail: nothing
    ]
    df = spark.createDataFrame(rows, "id long, key string, ts timestamp, st string")
    out = {
        (r["st"], r["bucket_ts"].hour): r["duration_us"]
        for r in hf.state_agg_bucketed(df, "ts", "key", "st", "id", 3600).collect()
    }
    m = 60_000_000
    assert out == {
        ("up", 0): 30 * m,     # 00:30 -> 01:00
        ("up", 1): 15 * m,     # 01:00 -> 01:15
        ("down", 1): 45 * m,   # 01:15 -> 02:00
        ("down", 2): 60 * m,   # full hour
    }
    totals = {
        r["st"]: r["duration_us"]
        for r in hf.state_agg(df, "ts", "key", "st", "id").collect()
    }
    by_state: dict = {}
    for (st, _), v in out.items():
        by_state[st] = by_state.get(st, 0) + v
    assert by_state == totals


def test_order_statistics_family_ignores_nulls(spark):
    """Family NULL contract (round-4 advisory): NULL values carry no
    observation — median/percentiles/mode/winsorized must produce the
    same result with NULL rows present as without. Without the filter,
    Spark's NULLS FIRST window ordering shifts every rank (vs DuckDB's
    NULLS LAST) and winsorized's greatest() silently clips NULLs to
    lo_cut."""
    from purpleair_data_logger_spark.operators import aggregations as agg

    clean = [("g", float(i)) for i in range(1, 11)]
    rows = clean + [("g", None)] * 3
    df = spark.createDataFrame(rows, "grp string, v double")
    df_clean = spark.createDataFrame(clean, "grp string, v double")

    (m,) = agg.grouped_median_exact(df, "grp", "v").collect()
    assert (m["median"], m["n"]) == (5.0, 10)

    got = {
        r["p_bp"]: (r["pctl_value"], r["n"])
        for r in agg.grouped_percentiles_exact(
            df, "grp", "v", (5000, 10000)
        ).collect()
    }
    assert got == {5000: (5.0, 10), 10000: (10.0, 10)}

    (mo,) = agg.grouped_mode_exact(df, "grp", "v").collect()
    assert (mo["mode"], mo["n_distinct"]) == (10.0, 10)

    (w,) = agg.winsorized_stats(df, "grp", "v", lo_bp=500, hi_bp=9500).collect()
    (w_clean,) = agg.winsorized_stats(
        df_clean, "grp", "v", lo_bp=500, hi_bp=9500
    ).collect()
    assert w == w_clean
    assert w["n"] == 10


# ---------------------------------------------------------------------------
# LTTB downsampling
# ---------------------------------------------------------------------------


def _python_lttb(pts: list[tuple[int, int]], n_out: int) -> list[int]:
    """Independent reference LTTB (plain loops, pure Python ints, no
    numpy arithmetic) returning kept indices — guards the vectorized
    exact-integer kernel. Inputs are (x_int, v_scaled_int) points, the
    kernel's quantized domain; areas compare via the centroid-count-
    scaled integer cross product, exactly as documented in
    `lttb_indices`."""
    n = len(pts)
    if n_out >= n:
        return list(range(n))
    import numpy as np

    x0 = pts[0][0]
    pts = [(int(p[0] - x0), int(p[1])) for p in pts]  # same rebase
    bounds = np.linspace(1, n - 1, n_out - 1).astype("int64").tolist()
    keep = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo = bounds[i + 1]
        nhi = bounds[i + 2] if i + 2 < n_out - 1 else n
        c = nhi - nlo
        sx = sum(p[0] for p in pts[nlo:nhi])
        sv = sum(p[1] for p in pts[nlo:nhi])
        best, best_area = lo, -1
        for j in range(lo, hi):
            area = abs(
                (c * pts[a][0] - sx) * (pts[j][1] - pts[a][1])
                - (pts[a][0] - pts[j][0]) * (sv - c * pts[a][1])
            )
            if area > best_area:
                best, best_area = j, area
        keep.append(best)
        a = best
    keep.append(n - 1)
    return keep


def _quantized_pts(rows):
    """(x seconds offset, v scaled 2 decimals) in (ts, value) order —
    the operator's default quantization, applied independently."""
    srt = sorted(rows, key=lambda r: (r[1], r[2]))
    ns0 = int(srt[0][1].timestamp() * 1e9)
    pts = []
    for r in srt:
        ns = int(r[1].timestamp() * 1e9)
        x = (ns - ns0) // 1_000_000_000
        raw = r[2] * 100
        # exact half-away-from-zero (matches Spark/DuckDB round; the
        # naive floor(raw + 0.5) rounds in the addition itself)
        t = math.trunc(raw)
        frac = raw - t
        v = int(t + (math.copysign(1.0, raw) if abs(frac) >= 0.5 else 0.0))
        pts.append((x, v))
    return srt, pts


def test_lttb_matches_reference_and_keeps_endpoints(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, i // 60, i % 60), math.sin(i / 7.0) * 10 + (i % 13))
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "key int, ts timestamp, value double")
    out = (
        hf.lttb_downsample(df, "ts", "key", "value", 20)
        .orderBy("ts")
        .collect()
    )
    assert len(out) == 20
    srt, pts = _quantized_pts(rows)
    ref_keep = _python_lttb(pts, 20)
    got_ts = [r["ts"] for r in out]
    want_ts = [srt[i][1] for i in ref_keep]
    assert got_ts == want_ts
    assert out[0]["ts"] == rows[0][1] and out[-1]["ts"] == rows[-1][1]


def test_lttb_null_key_ts_rows_excluded(spark):
    """NULL key/ts rows carry no pixel (fuzz contract for the oracled
    form): they are dropped, not grouped or NaT-sorted."""
    rows = [(1, _ts(0, i), float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(
        rows + [(None, _ts(2, 1), 1.0), (1, None, 2.0)],
        "key int, ts timestamp, value double",
    )
    out = hf.lttb_downsample(df, "ts", "key", "value", 10).collect()
    assert len(out) == 10
    assert all(r["key"] == 1 and r["ts"] is not None for r in out)


def test_lttb_overflow_raises_loud(spark):
    """The exact-integer kernel's overflow contract: area terms past
    int64 raise the descriptive error instead of wrapping through
    numpy (the ACF/CUSUM discipline)."""
    import numpy as np

    import pytest as _pytest

    x = np.arange(100, dtype="int64") * 10**9  # huge offsets
    v = (np.arange(100, dtype="int64") % 7) * 10**9
    with _pytest.raises(ValueError, match="overflow int64"):
        hf.lttb_indices(x, v, 10)


def test_lttb_passthrough_when_series_small(spark):
    rows = [(1, _ts(0, i), float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "key int, ts timestamp, value double")
    out = hf.lttb_downsample(df, "ts", "key", "value", 50).collect()
    assert len(out) == 5


def test_lttb_partitioning_invariant(spark):
    rows = [
        (k, _ts(i // 60, i % 60), float((i * k) % 17))
        for k in (1, 2)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "key int, ts timestamp, value double")
    a = sorted(
        (r["key"], r["ts"], r["value"])
        for r in hf.lttb_downsample(df, "ts", "key", "value", 30).collect()
    )
    b = sorted(
        (r["key"], r["ts"], r["value"])
        for r in hf.lttb_downsample(
            df.repartition(17), "ts", "key", "value", 30
        ).collect()
    )
    assert a == b and len(a) == 60


def test_m4_then_lttb_equals_lttb_over_m4_extreme_points(spark):
    """VERDICT r4 #8: the composed corpus-series path. The composition
    must equal running `lttb_downsample` over the M4 extreme-point
    series computed independently in pandas (first/last by time,
    min/max by value per bucket, deduped) — and stay bounded by
    n_out per key."""
    import pandas as pd

    rows = [
        (k, datetime(2024, 1, 1, i // 60, i % 60),
         math.sin(i / 5.0 + k) * 10 + ((i * k) % 11))
        for k in (1, 2)
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "key int, ts timestamp, value double")
    got = sorted(
        (r["key"], r["ts"], r["value"])
        for r in hf.m4_then_lttb(df, "ts", "key", "value", 900, 12).collect()
    )

    # independent M4 point set: 15-min buckets, four extremes each
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    pdf["bucket"] = pdf["ts"].dt.floor("900s")
    pts = set()
    for (k, _b), g in pdf.groupby(["key", "bucket"]):
        g = g.sort_values(["ts", "value"], kind="stable")
        first, last = g.iloc[0], g.iloc[-1]
        by_v = g.sort_values(["value", "ts"], kind="stable")
        lo, hi = by_v.iloc[0], by_v.iloc[-1]
        for r in (first, last, lo, hi):
            pts.add((int(k), r["ts"].to_pydatetime(), float(r["value"])))
    pts_df = spark.createDataFrame(
        sorted(pts), "key int, ts timestamp, value double"
    )
    want = sorted(
        (r["key"], r["ts"], r["value"])
        for r in hf.lttb_downsample(pts_df, "ts", "key", "value", 12).collect()
    )
    assert got == want
    from collections import Counter

    per_key = Counter(k for k, _, _ in got)
    assert all(v == 12 for v in per_key.values())


def test_frequent_items_exact_counts_and_partition_invariance(spark):
    """Two-scan heavy hitters: exact counts for every value at/above
    support, nothing below, NULLs carry no row — and the pigeonhole
    candidate guarantee must hold under ANY partitioning (a value
    locally rare everywhere but globally frequent is impossible; a
    value locally frequent somewhere but globally rare is filtered by
    the verify pass)."""
    from purpleair_data_logger_spark.operators import aggregations as agg

    # 1000 rows: 'a' x300, 'b' x120, 'c' x99, 481 distinct fillers,
    # plus NULLs (excluded from the denominator)
    vals = (
        ["a"] * 300 + ["b"] * 120 + ["c"] * 99
        + [f"f{i}" for i in range(481)] + [None] * 50
    )
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    for parts in (1, 7, 32):
        got = {
            r["tok"]: (r["n_occurrences"], r["n_total"])
            for r in agg.frequent_items(
                df.repartition(parts), "tok", support_bp=1000
            ).collect()
        }
        # support 10%: threshold cnt*10000 >= 1000*1000 -> cnt >= 100
        assert got == {"a": (300, 1000), "b": (120, 1000)}, parts

    # boundary: exactly at support is kept (c at 99/990 = 10% once
    # NULL handling shrinks nothing further -> craft exact boundary)
    df2 = spark.createDataFrame(
        [(v,) for v in ["x"] * 10 + [f"y{i}" for i in range(90)]],
        "tok string",
    )
    (r,) = agg.frequent_items(df2.repartition(5), "tok", support_bp=1000).collect()
    assert (r["tok"], r["n_occurrences"], r["n_total"]) == ("x", 10, 100)
    assert abs(r["freq"] - 0.1) < 1e-15


def test_grouped_frequent_items_per_group_support(spark):
    """Per-group heavy hitters: support applies within each group's
    own denominator — a value frequent in a small group must surface
    even when globally rare, and vice versa; partition-invariant."""
    from purpleair_data_logger_spark.operators import aggregations as agg

    vals = (
        [("en", "the")] * 50 + [("en", f"e{i}") for i in range(450)]
        + [("fr", "le")] * 8 + [("fr", f"f{i}") for i in range(12)]
    )
    df = spark.createDataFrame(vals, "lang string, tok string")
    for parts in (1, 9):
        got = {
            (r["lang"], r["tok"]): (r["n_occurrences"], r["n_total"])
            for r in agg.grouped_frequent_items(
                df.repartition(parts), ["lang"], "tok", support_bp=1000
            ).collect()
        }
        # en: 50/500 = 10% -> kept; fr: 8/20 = 40% -> kept despite
        # being globally 8/520 ≈ 1.5%
        assert got == {
            ("en", "the"): (50, 500),
            ("fr", "le"): (8, 20),
        }, parts


def test_grouped_frequent_items_null_group_keys_excluded(spark):
    """Round-5 advisory: NULL group keys carry no observation (the
    documented repo-wide NULL contract) — they must be excluded
    CONSISTENTLY from both the candidate scan and the verify pass,
    never half-counted (pandas dropna in one pass, SQL join-miss in
    the other), and must not perturb non-null groups' denominators."""
    from purpleair_data_logger_spark.operators import aggregations as agg

    vals = (
        [("en", "the")] * 50 + [("en", f"e{i}") for i in range(50)]
        + [(None, "ghost")] * 40 + [(None, f"g{i}") for i in range(10)]
    )
    df = spark.createDataFrame(vals, "lang string, tok string")
    for parts in (1, 7):
        got = {
            (r["lang"], r["tok"]): (r["n_occurrences"], r["n_total"])
            for r in agg.grouped_frequent_items(
                df.repartition(parts), ["lang"], "tok", support_bp=1000
            ).collect()
        }
        assert got == {("en", "the"): (50, 100)}, parts


def test_frequent_items_plan_has_no_full_distinct_shuffle(spark):
    """The verify pass must be a broadcast LEFT-SEMI against the
    candidate set followed by one hash aggregate — never a sort-merge
    join. Exactly two shuffle exchanges may appear: the candidate-set
    distinct (over the tiny checkpointed stats frame — bounded by
    partitions/support) and the exact-count aggregate (carrying
    candidate rows only). The corpus scan itself must feed the join
    directly, never a groupBy over the full distinct-value table."""
    import re

    from purpleair_data_logger_spark.operators import aggregations as agg
    from purpleair_data_logger_spark.plans.explain import formatted_plan

    df = spark.createDataFrame(
        [(f"t{i % 13}",) for i in range(1000)], "tok string"
    )
    out = agg.frequent_items(df, "tok", support_bp=500)
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    # the corpus side (the join's left branch, rendered with ':'
    # prefixes in the tree): scan -> filter -> join, no exchange
    tree = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
    corpus_branch = [l for l in tree.splitlines() if l.lstrip().startswith(":")]
    assert corpus_branch and not any("Exchange" in l for l in corpus_branch)


# ---------------------------------------------------------------------------
# property tests: random inputs vs brute-force references
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _brute_uptime(ts_list: list[int], bucket_us: int, timeout_us: int):
    """O(n + covered-us-sampled) reference: per-bucket union coverage
    computed from the interval definition directly, sampling nothing —
    sweep the sorted intervals and clip against bucket edges."""
    out: dict[int, int] = {}
    ts_sorted = sorted(ts_list)
    for i, t in enumerate(ts_sorted):
        nxt = ts_sorted[i + 1] if i + 1 < len(ts_sorted) else None
        e = min(nxt, t + timeout_us) if nxt is not None else t + timeout_us
        if e <= t:
            continue
        b = t // bucket_us
        while b * bucket_us < e:
            lo = max(t, b * bucket_us)
            hi = min(e, (b + 1) * bucket_us)
            out[b] = out.get(b, 0) + (hi - lo)
            b += 1
    return out


@given(
    secs=st.lists(
        st.integers(min_value=0, max_value=600), min_size=1, max_size=40
    ),
    timeout=st.integers(min_value=1, max_value=180),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_heartbeat_property_matches_brute_force(spark, secs, timeout):
    rows = [
        (i, "k", datetime(2024, 1, 1, 0, s // 60, s % 60))
        for i, s in enumerate(sorted(set(secs)))
    ]
    df = spark.createDataFrame(rows, "id long, key string, ts timestamp")
    got = {
        (r["bucket_ts"].hour * 60 + r["bucket_ts"].minute): r["uptime_us"]
        for r in hf.heartbeat_uptime(df, "ts", "key", "id", 60, timeout).collect()
    }
    # build the reference in absolute epoch-us exactly as the operator does
    ts_us = [
        int((datetime(2024, 1, 1, 0, s // 60, s % 60)
             - datetime(1970, 1, 1)).total_seconds() * 1_000_000)
        for s in sorted(set(secs))
    ]
    want = _brute_uptime(ts_us, 60_000_000, timeout * 1_000_000)
    # rekey reference buckets to minutes-of-day for comparison
    day0 = ts_us[0] - (ts_us[0] % 86_400_000_000)
    want_m = {
        int((b * 60_000_000 - day0) // 60_000_000): v for b, v in want.items()
    }
    assert got == want_m


def _brute_counter(rows, bucket_s):
    """Reference: global consecutive diffs, bucket by the CURRENT
    reading, reset adds the new value."""
    out: dict[int, float] = {}
    resets: dict[int, int] = {}
    ordered = sorted(rows, key=lambda r: (r[2], r[0]))
    for i, (_, _, ts, v) in enumerate(ordered):
        b = (ts.hour * 3600 + ts.minute * 60 + ts.second) // bucket_s
        out.setdefault(b, 0.0)
        resets.setdefault(b, 0)
        if i == 0:
            continue
        prev = ordered[i - 1][3]
        if v >= prev:
            out[b] += v - prev
        else:
            out[b] += v
            resets[b] += 1
    return out, resets


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=30
    ),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_counter_delta_property_matches_brute_force(spark, vals):
    # strictly increasing timestamps 37 s apart spanning bucket edges
    rows = [
        (i, "k", _ts((i * 37) // 60, (i * 37) % 60), float(v) / 4)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "id long, key string, ts timestamp, value double"
    )
    out = hf.counter_delta(df, "ts", "key", "value", "id", 120).collect()
    got = {
        (r["bucket_ts"].minute * 60 + r["bucket_ts"].second) // 120
        + r["bucket_ts"].hour * 30: (
            round(r["counter_delta"], 6),
            r["n_resets"],
        )
        for r in out
    }
    want_d, want_r = _brute_counter(rows, 120)
    want = {b: (round(want_d[b], 6), want_r[b]) for b in want_d}
    assert got == want


# ---------------------------------------------------------------------------
# grouped mode + winsorized stats
# ---------------------------------------------------------------------------


def test_grouped_mode_counts_and_tie_rule(spark):
    from purpleair_data_logger_spark.operators import aggregations as agg

    rows = (
        [("a", 1.0)] * 3 + [("a", 2.0)] * 3 + [("a", 9.0)]  # tie 1.0/2.0
        + [("b", 5.0)] * 2 + [("b", 7.0)]
    )
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {
        r["grp"]: (r["mode"], r["mode_count"], r["n_distinct"])
        for r in agg.grouped_mode_exact(df, "grp", "v").collect()
    }
    # tie at count 3 -> the GREATEST tied value wins by contract
    assert got == {"a": (2.0, 3, 3), "b": (5.0, 2, 2)}


def test_winsorized_stats_clips_tails_exactly(spark):
    from purpleair_data_logger_spark.operators import aggregations as agg

    # values 1..100: P5 (nearest rank ceil(.05*100)=5) = 5, P95 = 95.
    # winsorized mean = (5*5 + sum(5..95) + 5*95) / 100
    rows = [("g", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "grp string, v double")
    (r,) = agg.winsorized_stats(
        df, "grp", "v", lo_bp=500, hi_bp=9500
    ).collect()
    assert (r["lo_cut"], r["hi_cut"]) == (5.0, 95.0)
    assert r["n"] == 100
    assert (r["n_clipped_low"], r["n_clipped_high"]) == (4, 5)
    # 4 values below the cut clip to 5; 5..95 unchanged; 5 clip to 95
    expected = (4 * 5 + sum(range(5, 96)) + 5 * 95) / 100
    assert abs(r["winsorized_mean"] - expected) < 1e-9
    # robustness: an absurd outlier moves the winsorized mean by at
    # most (outlier->hi_cut is clipped), unlike the raw mean
    df2 = df.union(spark.createDataFrame([("g", 1e9)], "grp string, v double"))
    (r2,) = agg.winsorized_stats(
        df2, "grp", "v", lo_bp=500, hi_bp=9500
    ).collect()
    assert r2["winsorized_mean"] < expected + 2.0


# ---------------------------------------------------------------------------
# trend_stats (stats_agg -> slope/intercept)
# ---------------------------------------------------------------------------


def test_trend_slope_recovers_planted_line(spark):
    # value = 10 + 0.5 * hours_elapsed, sampled every 12 min -> slope
    # exactly 0.5/h, intercept exactly 10 at t0 (integer Gram, exact).
    rows = [
        (i, "a", _ts((i * 12) % 60, 0, (i * 12) // 60), 10.0 + 0.5 * (i * 12) / 60)
        for i in range(11)
    ]
    df = spark.createDataFrame(
        rows, "id long, key string, ts timestamp, value double"
    )
    (r,) = hf.trend_stats(df, "ts", "key", "value").collect()
    assert r["n"] == 11
    assert abs(r["slope_per_hour"] - 0.5) < 1e-12
    assert abs(r["intercept"] - 10.0) < 1e-12
    assert r["t0"] == _ts(0)


def test_trend_degenerate_single_timestamp(spark):
    # all readings at one instant: slope undefined (NULL), intercept
    # falls back to the plain mean.
    df = spark.createDataFrame(
        [(1, "a", _ts(5), 2.0), (2, "a", _ts(5), 4.0)],
        "id long, key string, ts timestamp, value double",
    )
    (r,) = hf.trend_stats(df, "ts", "key", "value").collect()
    assert r["slope_per_hour"] is None
    assert abs(r["intercept"] - 3.0) < 1e-12


@given(
    vals=st.lists(
        st.integers(min_value=-2000, max_value=2000), min_size=2, max_size=25
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_trend_property_matches_numpy_lstsq(spark, vals):
    """Random series: the exact-Gram slope/intercept must agree with
    numpy's float least squares to float tolerance (the Gram sums are
    exact, so any disagreement beyond rounding is a formula bug)."""
    import numpy as np

    rows = [
        (i, "k", _ts((i * 7) // 60, (i * 7) % 60), v / 100.0)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "id long, key string, ts timestamp, value double"
    )
    (r,) = hf.trend_stats(df, "ts", "key", "value").collect()
    t = np.array([7.0 * i for i in range(len(vals))])
    v = np.array(vals, dtype=np.float64) / 100.0
    if np.all(t == t[0]):
        assert r["slope_per_hour"] is None
        return
    slope_s, intercept = np.polyfit(t, v, 1)
    assert abs(r["slope_per_hour"] - slope_s * 3600) < 1e-6 * max(
        1.0, abs(slope_s * 3600)
    )
    assert abs(r["intercept"] - intercept) < 1e-6


# ---------------------------------------------------------------------------
# gap_incidents
# ---------------------------------------------------------------------------


def test_gap_incidents_cross_partition_boundary(spark):
    """A gap spanning the calendar-partition edge must still be
    detected (the boundary stitch), with exact start/end/duration; a
    key's first-ever reading reports nothing."""
    from datetime import datetime as dt

    df = spark.createDataFrame(
        [
            (1, "a", dt(2024, 1, 1, 23, 0)),
            (2, "a", dt(2024, 1, 2, 1, 30)),   # 2.5 h gap across midnight
            (3, "a", dt(2024, 1, 2, 1, 40)),   # 10 min — under threshold
            (4, "b", dt(2024, 1, 5, 0, 0)),    # first-ever: no report
        ],
        "id long, key string, ts timestamp",
    )
    out = hf.gap_incidents(df, "ts", "key", "id", 1800).collect()
    assert len(out) == 1
    (r,) = out
    assert r["key"] == "a"
    assert r["gap_start_ts"] == dt(2024, 1, 1, 23, 0)
    assert r["gap_end_ts"] == dt(2024, 1, 2, 1, 30)
    assert r["gap_us"] == 2 * 3600 * 1_000_000 + 30 * 60 * 1_000_000


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=25
    ),
    support_bp=st.sampled_from([500, 1000, 2000, 5000]),
    parts=st.sampled_from([1, 5, 16]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_frequent_items_property_matches_brute_force(
    spark, counts, support_bp, parts
):
    """Random multisets under random partitionings: frequent_items
    must return EXACTLY the brute-force answer — every value with
    cnt*10⁴ ≥ support*N, with exact counts, nothing else. Exercises
    the pigeonhole candidate guarantee at boundaries (values exactly
    at support, single-partition, many-partition)."""
    from purpleair_data_logger_spark.operators import aggregations as agg

    rows = [(f"v{i}",) for i, c in enumerate(counts) for _ in range(c)]
    n = len(rows)
    want = {
        f"v{i}": c
        for i, c in enumerate(counts)
        if c * 10000 >= support_bp * n
    }
    df = spark.createDataFrame(rows, "tok string").repartition(parts)
    got = {
        r["tok"]: r["n_occurrences"]
        for r in agg.frequent_items(df, "tok", support_bp=support_bp).collect()
    }
    assert got == want


def _brute_asap(vs, max_window):
    """Independent plain-loop ASAP reference: exhaustive window scan,
    numpy used only for the convolution-free running mean."""
    def kurt(x):
        n = len(x)
        m = sum(x) / n
        m2 = sum((v - m) ** 2 for v in x) / n
        if m2 == 0:
            return float("-inf")
        return (sum((v - m) ** 4 for v in x) / n) / (m2 * m2)

    def rough(x):
        if len(x) < 2:
            return 0.0
        d = [b - a for a, b in zip(x, x[1:])]
        mu = sum(d) / len(d)
        return (sum((v - mu) ** 2 for v in d) / len(d)) ** 0.5

    ok_orig = kurt(vs)
    best = (1, list(vs), rough(vs))
    for w in range(2, min(max_window, len(vs)) + 1):
        sm = [sum(vs[i : i + w]) / w for i in range(len(vs) - w + 1)]
        if kurt(sm) >= ok_orig and rough(sm) < best[2]:
            best = (w, sm, rough(sm))
    return best


def test_asap_kernel_matches_reference_and_preserves_anomaly(spark):
    """The vectorized kernel must pick the same window as the
    independent loop reference. The planted 16-point anomaly plateau
    is the paper's motivating case: windows narrower than the plateau
    shrink noise while keeping its amplitude (kurtosis RISES — the
    constraint admits them), wider windows flatten it (kurtosis falls
    below original — rejected), so the chosen window smooths as much
    as possible WITHOUT averaging the anomaly away."""
    import numpy as np

    vs = [
        ((((i * 2654435761) ^ (i >> 3)) % 1000) / 1000.0 - 0.5) * 1.2
        for i in range(240)
    ]
    for j in range(120, 136):
        vs[j] += 6.0
    w, sm = hf.asap_window_and_smooth(vs, 40)
    bw, bsm, _ = _brute_asap(vs, 40)
    assert w == bw
    assert 1 < w < 16  # smooths, but never wider than the anomaly
    assert np.allclose(sm, bsm, rtol=0, atol=1e-9)
    # anomaly survives at (nearly) full amplitude
    assert max(sm) > 5.0
    # roughness reduced vs raw
    assert np.diff(sm).std() < np.diff(np.array(vs)).std()


def test_asap_overwhelming_spike_keeps_identity(spark):
    """A single-point spike in an otherwise smooth series drives the
    ORIGINAL kurtosis so high no window can preserve it — ASAP then
    refuses to smooth (window 1, identity): averaging would be the
    silent anomaly-erasure the constraint exists to prevent."""
    vs = [math.sin(i / 3.0) + 0.3 * math.sin(i * 1.7) for i in range(120)]
    vs[60] += 8.0
    w, sm = hf.asap_window_and_smooth(vs, 30)
    assert w == 1 and list(sm) == vs


def test_asap_operator_applies_kernel_per_key(spark):
    """Operator ≡ kernel per key, trailing alignment, and partition
    invariance (the mapInPandas carry-buffer path)."""
    import numpy as np

    rows = []
    for k in (1, 2):
        for i in range(90):
            v = ((((i * 2654435761 * k) ^ (i >> 2)) % 1000) / 1000.0 - 0.5)
            if 40 <= i < 40 + 8 * k:  # per-key anomaly plateau
                v += 4.0
            rows.append((k, datetime(2024, 1, 1, i // 60, i % 60), v))
    df = spark.createDataFrame(rows, "key int, ts timestamp, v double")
    for parts in (1, 7):
        out = hf.asap_smooth(
            df.repartition(parts), "ts", "key", "v", max_window=20
        )
        got = {}
        for r in out.collect():
            got.setdefault(r["key"], []).append(
                (r["ts"], r["value_smoothed"], r["window"])
            )
        for k in (1, 2):
            series = sorted(
                (t, v) for kk, t, v in rows if kk == k
            )
            w, sm = hf.asap_window_and_smooth(
                [v for _, v in series], 20
            )
            pts = sorted(got[k])
            assert len(pts) == len(series) - w + 1
            assert all(p[2] == w for p in pts)
            assert np.allclose([p[1] for p in pts], sm, atol=1e-9)
            # trailing alignment: first output ts is the w-th input ts
            assert pts[0][0] == series[w - 1][0]


def test_autocorr_exact_alternating_and_constant(spark):
    """A perfectly alternating series has ACF(1) = -1 and ACF(2) = +1
    exactly (y is ±x elementwise, so the closed form collapses);
    a constant series has zero variance ⇒ NULL, never ±inf/NaN."""
    from purpleair_data_logger_spark.operators.hyperfunctions import (
        autocorr_exact,
    )

    rows = [("alt", i, i, float(1 if i % 2 == 0 else -1)) for i in range(40)]
    rows += [("const", i, i, 7.5) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, t long, id long, v double")
    df = df.select("k", F.col("t").cast("timestamp").alias("t"), "id", "v")
    got = {
        (r["k"], r["lag"]): (r["n_pairs"], r["acf"])
        for r in autocorr_exact(
            df, ["k"], "t", "id", "v", lags=(1, 2)
        ).collect()
    }
    assert got[("alt", 1)] == (39, -1.0)
    assert got[("alt", 2)] == (38, 1.0)
    assert got[("const", 1)] == (39, None)
    assert got[("const", 2)] == (38, None)


def test_autocorr_exact_matches_numpy(spark):
    """On an arbitrary series the exact-integer ACF equals numpy's
    Pearson corr of the scaled series against its shift (float
    reference, so approx)."""
    import numpy as np

    from purpleair_data_logger_spark.operators.hyperfunctions import (
        autocorr_exact,
    )

    vals = [((i * 37) % 19) / 4.0 + (1.0 if i % 5 == 0 else 0.0)
            for i in range(200)]
    rows = [("u", i, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, id long, v double")
    df = df.select("k", F.col("t").cast("timestamp").alias("t"), "id", "v")
    got = {
        r["lag"]: r["acf"]
        for r in autocorr_exact(
            df, ["k"], "t", "id", "v", lags=(1, 2, 3)
        ).collect()
    }
    scaled = np.round(np.array(vals) * 100)
    for lag in (1, 2, 3):
        ref = np.corrcoef(scaled[:-lag], scaled[lag:])[0, 1]
        assert got[lag] == pytest.approx(ref, abs=1e-12)


def test_autocorr_exact_rejects_bad_lags(spark):
    from purpleair_data_logger_spark.operators.hyperfunctions import (
        autocorr_exact,
    )

    df = spark.createDataFrame(
        [("u", 1, 1, 1.0)], "k string, t long, id long, v double"
    )
    with pytest.raises(ValueError, match="lags"):
        autocorr_exact(df, ["k"], "t", "id", "v", lags=(0,))


def test_streaming_acf_matches_batch_bit_exact(spark, tmp_path):
    """The streaming ACF's final snapshot equals `autocorr_exact` on
    the full series — exact integer sums AND the float statistic —
    with a boundary-spanning pair set (two micro-batches) and a
    dropped out-of-order straggler."""
    from purpleair_data_logger_spark.operators.hyperfunctions import (
        autocorr_exact,
    )
    from purpleair_data_logger_spark.streaming.acf import acf_by_key

    rows = [
        ("u", i, i, ((i * 37) % 19) / 4.0 + (i % 3)) for i in range(200)
    ]
    rows += [("w", i, 1000 + i, float((i * i) % 11)) for i in range(45)]
    half = 120
    b2 = rows[half:] + [("u", 5, 9999, 99.0)]  # straggler: ts 5 << cursor
    src = str(tmp_path / "acf_src")
    for chunk in (rows[:half], b2):
        (
            spark.createDataFrame(chunk, "k string, t long, id long, v double")
            .select("k", F.col("t").cast("timestamp").alias("t"), "id", "v")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        acf_by_key(stream, "k", "t", "id", "v", lags=(1, 2, 3))
        .writeStream.format("memory")
        .queryName("acf_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    emitted = spark.sql("SELECT * FROM acf_stream").collect()
    latest = {}
    for r in emitted:
        cur = latest.get((r["k"], r["lag"]))
        if cur is None or r["rows_seen"] > cur["rows_seen"]:
            latest[(r["k"], r["lag"])] = r
    full = spark.createDataFrame(
        rows, "k string, t long, id long, v double"
    ).select("k", F.col("t").cast("timestamp").alias("t"), "id", "v")
    batch = {
        (r["k"], r["lag"]): r
        for r in autocorr_exact(
            full, ["k"], "t", "id", "v", lags=(1, 2, 3)
        ).collect()
    }
    assert set(latest) == set(batch)
    for kq, r in latest.items():
        want = batch[kq]
        assert (r["n_pairs"], r["sum_x"], r["sum_y"]) == (
            want["n_pairs"], want["sum_x"], want["sum_y"],
        ), kq
        assert r["acf"] == want["acf"], kq  # bit-exact float


def test_streaming_acf_short_key_emits_no_phantom_lags(spark, tmp_path):
    """A key with fewer observations than a configured lag must not
    emit an n_pairs=0 phantom row — batch emits no row at all for a
    pairless (key, lag), and snapshot parity depends on the row SETS
    matching (code-review r10)."""
    from purpleair_data_logger_spark.operators.hyperfunctions import (
        autocorr_exact,
    )
    from purpleair_data_logger_spark.streaming.acf import acf_by_key

    rows = [("s", 1, 1, 2.0), ("s", 2, 2, 5.0)]  # 2 obs: lag-3 has 0 pairs
    src = str(tmp_path / "acf_short")
    (
        spark.createDataFrame(rows, "k string, t long, id long, v double")
        .select("k", F.col("t").cast("timestamp").alias("t"), "id", "v")
        .coalesce(1)
        .write.parquet(src)
    )
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        acf_by_key(stream, "k", "t", "id", "v", lags=(1, 3))
        .writeStream.format("memory")
        .queryName("acf_short")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["lag"]): (r["n_pairs"], r["sum_x"], r["sum_y"])
        for r in spark.sql("SELECT * FROM acf_short").collect()
    }
    full = spark.createDataFrame(
        rows, "k string, t long, id long, v double"
    ).select("k", F.col("t").cast("timestamp").alias("t"), "id", "v")
    want = {
        (r["k"], r["lag"]): (r["n_pairs"], r["sum_x"], r["sum_y"])
        for r in autocorr_exact(
            full, ["k"], "t", "id", "v", lags=(1, 3)
        ).collect()
    }
    assert got == want  # exactly the lag-1 row; no phantom lag-3


def test_streaming_acf_overflow_raises_loud(spark, tmp_path):
    """The mirror enforces the batch path's loud-overflow contract:
    scaled values whose power sums would exceed int64 raise instead of
    silently wrapping through numpy (code-review r10)."""
    from py4j.protocol import Py4JJavaError

    from purpleair_data_logger_spark.streaming.acf import acf_by_key

    rows = [("o", 1, 1, 4.0e16), ("o", 2, 2, 4.1e16)]
    src = str(tmp_path / "acf_ovf")
    (
        spark.createDataFrame(rows, "k string, t long, id long, v double")
        .select("k", F.col("t").cast("timestamp").alias("t"), "id", "v")
        .coalesce(1)
        .write.parquet(src)
    )
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        acf_by_key(stream, "k", "t", "id", "v", lags=(1,))
        .writeStream.format("memory")
        .queryName("acf_ovf")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="overflow|OVERFLOW|StreamingQuery"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
        raise AssertionError("stream finished without the overflow error")


def test_streaming_acf_cumulative_overflow_raises_loud():
    """ADVICE r10: the per-batch bound (max|x|^2 * n < 2^63) does not
    cap the ACCUMULATED power sums — values that individually pass can
    push sxx past int64 across micro-batches, which previously failed
    later inside state.update's Arrow serialization with an opaque
    error. The designed descriptive ValueError must fire instead."""
    import pandas as pd

    from purpleair_data_logger_spark.streaming.acf import acf_stateful_func

    class _FakeState:
        exists = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists = True
            self._v = v

    fn = acf_stateful_func((1,), 0)
    state = _FakeState()

    def batch(ts, idv, val):
        return pd.DataFrame(
            {"k": ["o"], "t": [ts], "id": [idv], "v": [float(val)]}
        )

    # each batch passes the per-batch bound (mx^2 * 1 < 2^63) ...
    list(fn(("o",), [batch(1, 1, 2.9e9)], state))
    list(fn(("o",), [batch(2, 2, 3.0e9)], state))  # sxx = 8.41e18, ok
    # ... but the third pair pushes cumulative sxx to ~1.74e19 > 2^63
    with pytest.raises(ValueError, match="accumulated.*overflow int64"):
        list(fn(("o",), [batch(3, 3, 2.9e9)], state))
