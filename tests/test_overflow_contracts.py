"""Executable overflow contracts for the scaled-BIGINT operator family
(VERDICT r5 #7).

Several operators document a Σ < 2⁶³ bound in prose (exact-cents
pricing, time-weighted averages, trend/Gram sums, 2-D stats, CUSUM
prefix sums, winsorized sums). These tests make each contract
executable in both directions:

* JUST INSIDE the bound: the operator runs and its integer
  arithmetic is exact (asserted strictly wherever the final
  float descale is representable; within ~1 ulp where it is not —
  each case states which).
* BEYOND the bound: the operator fails LOUDLY. Spark 4 runs ANSI
  mode by default, so every long add/multiply/sum/cast raises
  ``ARITHMETIC_OVERFLOW`` (or a numeric cast error) instead of
  wrapping — silent wraparound is structurally impossible in the JVM
  plans. These tests pin that, and would catch anyone disabling ANSI
  mode session-wide, which would silently void every documented
  contract at once.

Input magnitudes are chosen so the DOUBLE→BIGINT decimal scaling is
itself exact (scaled values ≤ 2⁵³ or with enough trailing binary
zeros), keeping the in-bound expectations deterministic.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators import aggregations as agg
from purpleair_data_logger_spark.operators import hyperfunctions as hf

BASE = dt.datetime(2024, 5, 1, 0, 0, 0)


def _raises_overflow(fn):
    with pytest.raises(Exception) as exc:
        fn()
    msg = str(exc.value)
    assert (
        "ARITHMETIC_OVERFLOW" in msg
        or "overflow" in msg
        or "CAST_OVERFLOW" in msg
        or "out of range" in msg
    ), f"expected a loud overflow, got: {msg[:300]}"


def _events(spark, rows):
    return spark.createDataFrame(
        [(rid, k, BASE + dt.timedelta(seconds=s), v) for rid, k, s, v in rows],
        "id long, key string, ts timestamp, value double",
    )


# -- time_weighted_avg: numerator Σ value_scaled·Δus < 2⁶³ --------------
# (aggregations.py docstring "Overflow bound" paragraph)


def test_time_weighted_avg_exact_at_bound(spark):
    # 1 h bucket, value flips halfway: each numerator term is
    # 2.5e9 · 1.8e9 µs = 4.5e18 — the sum sits at 9.0e18, ~98% of
    # 2⁶³. The integer sums are exact; only the final descale divides
    # doubles, so the LOCF midpoint comes back within 1 ulp.
    v = 2.5e7
    df = _events(spark, [(1, "a", 0, v), (2, "a", 1800, v + 2.0)])
    row = agg.time_weighted_avg(df, "ts", 3600, ["key"], "value", "id").collect()[0]
    assert row["n_samples"] == 2
    assert row["time_weighted_avg"] == pytest.approx(v + 1.0, rel=1e-12)


def test_time_weighted_avg_overflows_loudly(spark):
    # one term alone breaks the documented bound:
    # 9e18 (scaled) · 3.6e9 µs ≫ 2⁶³ → the multiply raises.
    df = _events(spark, [(1, "a", 0, 9.0e16)])
    _raises_overflow(
        lambda: agg.time_weighted_avg(
            df, "ts", 3600, ["key"], "value", "id"
        ).collect()
    )


# -- trend_stats: rows·c_max·range < 2⁶³ (Gram sums) --------------------
# (hyperfunctions.py docstring "Overflow contract" paragraph)


def test_trend_stats_at_bound(spark):
    # Σc·dt ≈ 8.0e14 · 10800 s = 8.6e18, ~94% of 2⁶³. The BIGINT Gram
    # sums are exact; the slope's float cross-term difference
    # (n·Σct − Σc·Σt) cancels 13 orders of magnitude, so the
    # recovered slope carries the documented float tail — the
    # contract here is "runs, no overflow, slope within the
    # cancellation tolerance", not bit-exactness.
    v = 8.0e12
    df = _events(
        spark, [(i, "a", i * 3600, v + float(i)) for i in range(3)]
    )
    row = hf.trend_stats(df, "ts", "key", "value").collect()[0]
    assert row["n"] == 3
    assert row["slope_per_hour"] == pytest.approx(1.0, rel=5e-3)


def test_trend_stats_overflows_loudly(spark):
    df = _events(
        spark, [(i, "a", i * 3600, 9.0e16) for i in range(3)]
    )  # Σc = 2.7e19 > 2⁶³
    _raises_overflow(lambda: hf.trend_stats(df, "ts", "key", "value").collect())


# -- stats2d_exact: |nΣxy| < 2⁶³ (power sums) ---------------------------
# (hyperfunctions.py docstring "BIGINT overflow bound" paragraph)


def test_stats2d_exact_at_bound(spark):
    # the binding terms are the BIGINT cross-products n·Σy² and
    # (Σy)²: with y ≈ 0.9e9 both sit at ~7.3e18, ~79% of 2⁶³. The
    # cross-term DIFFERENCES (n·Σxy − ΣxΣy etc.) are computed in
    # BIGINT too — no float cancellation at all — so the perfect line
    # y = 3x + 7 comes back with slope exactly 3 (cov_n = 3·varx_n as
    # integers) and corr within a sqrt ulp.
    xs = [280_000_000, 300_000_000, 320_000_000]
    df = spark.createDataFrame(
        [("g", x, 3 * x + 7) for x in xs], "g string, x long, y long"
    )
    row = hf.stats2d_exact(df, "g", "x", "y").collect()[0]
    assert row["n_pairs"] == 3
    assert row["slope"] == 3.0
    assert row["corr_xy"] == pytest.approx(1.0, rel=1e-12)


def test_stats2d_overflows_loudly(spark):
    xs = [4_000_000_000, 4_000_000_001]  # x² = 1.6e19 > 2⁶³ per row
    df = spark.createDataFrame(
        [("g", x, x) for x in xs], "g string, x long, y long"
    )
    _raises_overflow(lambda: hf.stats2d_exact(df, "g", "x", "y").collect())


# -- cusum_scan: Σv target + deviation prefix sums < 2⁶³ ----------------


def test_cusum_at_bound(spark):
    # values {0, 8e16}: the target sum (8e18) and the deviation
    # prefix swing (±4e18) both sit inside 2⁶³; the second row's
    # statistic is S₂ = 4e18 − 50 scaled — an alarm computed from
    # integer prefix algebra at ~87% of the bound.
    df = _events(spark, [(1, "a", 0, 0.0), (2, "a", 60, 8.0e16)])
    alarms = hf.cusum_scan(
        df, "ts", "key", "value", "id", slack=0.5, threshold=5.0
    ).collect()
    assert [r["id"] for r in alarms] == [2]
    assert alarms[0]["cusum"] == pytest.approx(4.0e16, rel=1e-12)


def test_cusum_overflows_loudly(spark):
    df = _events(spark, [(1, "a", 0, 5.0e16), (2, "a", 60, 5.0e16)])
    _raises_overflow(  # Σv = 1.0e19 > 2⁶³ in the target mean
        lambda: hf.cusum_scan(
            df, "ts", "key", "value", "id", slack=0.5, threshold=5.0
        ).collect()
    )


# -- winsorized_stats: Σ clipped scaled values < 2⁶³ --------------------


def test_winsorized_exact_at_bound(spark):
    # two identical near-bound values (clip is a no-op): Σ = 8e18,
    # ~87% of 2⁶³, and every float in the descale chain (8e18 → /2 →
    # /100) is exactly representable → STRICT equality.
    v = 4.0e16
    df = _events(spark, [(1, "a", 0, v), (2, "a", 60, v)]).select(
        F.col("key").alias("grp"), "value"
    )
    row = agg.winsorized_stats(
        df, "grp", "value", lo_bp=2500, hi_bp=7500
    ).collect()[0]
    assert row["n"] == 2
    assert row["winsorized_mean"] == v


def test_winsorized_overflows_loudly(spark):
    df = _events(
        spark, [(i, "a", i * 60, 9.0e16) for i in range(3)]
    ).select(F.col("key").alias("grp"), "value")
    _raises_overflow(  # Σ clipped = 2.7e19 > 2⁶³
        lambda: agg.winsorized_stats(
            df, "grp", "value", lo_bp=2500, hi_bp=7500
        ).collect()
    )


# -- pricing_summary: Σ price_c·(100−d)·(100+t) < 2⁶³ -------------------
# (catalog.py docstring "Overflow contract" paragraph)


def _lineitem_dir(spark, tmp_path, price: float, n: int) -> str:
    # single-file layout, like the driver testdata (load_table reads
    # <sf_dir>/<table>.parquet as a file, not a Spark directory)
    import pyarrow as pa
    import pyarrow.parquet as pq

    ship = dt.datetime(1998, 1, 1)  # inside Q1's shipdate predicate
    table = pa.table(
        {
            "l_returnflag": pa.array(["A"] * n),
            "l_linestatus": pa.array(["F"] * n),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array([price] * n, pa.float64()),
            "l_discount": pa.array([0.10] * n, pa.float64()),
            "l_tax": pa.array([0.05] * n, pa.float64()),
            "l_shipdate": pa.array([ship] * n, pa.timestamp("us")),
        }
    )
    pq.write_table(table, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_pricing_summary_exact_cents_at_bound(spark, tmp_path):
    from purpleair_data_logger_spark import catalog

    # price 9.2e12 at 10% discount / 5% tax: the charge term is
    # price_c·90·105 = 8.694e18 — ~94% of 2⁶³ from a single lineitem —
    # and every descaled output (8.28e16/10⁴, 8.694e18/10⁶) is
    # exactly representable → STRICT cents equality where a float64
    # charge sum would already be off by whole dollars.
    sf = _lineitem_dir(spark, tmp_path, 9.2e12, 1)
    row = catalog._REGISTRY["pricing_summary"].fn(spark, sf).collect()[0]
    assert row["count_order"] == 1
    assert row["sum_base_price"] == 9.2e12
    assert row["sum_disc_price"] == 8.28e12
    assert row["sum_charge"] == 8.694e12


def test_pricing_summary_overflows_loudly(spark, tmp_path):
    from purpleair_data_logger_spark import catalog

    # two such lineitems in one group: Σ charge = 1.74e19 > 2⁶³ — the
    # documented "widen the charge sum to DECIMAL(38,0)" boundary
    # must announce itself, never wrap.
    sf = _lineitem_dir(spark, tmp_path, 9.2e12, 2)
    _raises_overflow(
        lambda: catalog._REGISTRY["pricing_summary"].fn(spark, sf).collect()
    )
