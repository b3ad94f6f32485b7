"""Time-series hyperfunctions beyond the gapfill/time-weight trio:
M4 downsampling, counter-reset deltas, and heartbeat uptime.

The reference's read path is a Grafana dashboard over TimescaleDB
(reference ``PurpleAirPSQLQueryStatements.py:564-580`` continuous
aggregate + the shipped dashboard's ``$__timeGroupAlias … max(...)``
panels). At production scale that stack pushes three more operators
server-side, re-expressed here Spark-first:

- `m4_downsample`: the M4 width-aware downsampling aggregation
  (Jugel et al., "M4: A Visualization-Oriented Time Series Data
  Aggregation", VLDB 2014) — per pixel-column time bucket keep the
  first/last/min/max extremes, the minimal set that renders a
  line-chart pixel-identically to the raw series. What a dashboard
  should run instead of ``LIMIT 10000`` over raw readings.
- `counter_delta`: TimescaleDB ``counter_agg``-style per-bucket
  increase of a monotone-but-resetting counter (device reboots reset
  uptime/packet counters to zero; a plain ``max - min`` misses every
  reset's contribution).
- `heartbeat_uptime`: TimescaleDB ``heartbeat_agg``-style liveness —
  each reading asserts the sensor alive for ``timeout`` seconds; the
  per-bucket union of those intervals is the sensor's measured
  uptime. The reference polls on a 65 s cadence
  (``PurpleAirDataLogger.py`` retry loop), so a 2–3× timeout is the
  natural "did the logger stay up" SLO query.

All three are single-scan, aggregate-first plans. The scale rule this
module inherits from `aggregations.py` / VERDICT r3: never a window
partitioned by a low-cardinality key over corpus rows. `counter_delta`
and `heartbeat_uptime` need sequential (prev/next reading) context,
which IS a per-key window — so both run it over (key, bucket)
partitions (bounded by per-bucket sample count: ≤ 56 rows at the
reference's 65 s cadence and 1 h buckets) and stitch bucket boundaries
with a second window over the per-(key, bucket) AGGREGATE (calendar-
bounded rows, never corpus rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators.aggregations import time_bucket


def _spread_by_key(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition by key with an EXPLICIT partition count — the
    `text._repartition_by_key` / `dedup.parallelize_small_scan`
    pattern, applied to the mapInPandas stages here (r13): a bare
    ``repartition(col)`` lets AQE coalesce the exchange to ONE
    partition at local data sizes (its advisory is BYTE-based, and a
    few MB of series rows look trivially small), which serialized the
    whole per-key Python kernel into a single worker — measured
    `lttb_downsample` 2.4 s with 1 task vs ~0.7 s at 32. The explicit
    count is never coalesced; max(defaultParallelism, input
    partitions) stays scan-sized on a cluster, so at scale this is
    the same one-shuffle shape, never a constriction."""
    sc = df.sparkSession.sparkContext
    n = max(sc.defaultParallelism, df.rdd.getNumPartitions())
    return df.repartition(n, F.col(key_col))


def _placeable(df: DataFrame, *cols: str) -> DataFrame:
    """NULL contract for the sequential/two-tier operators (fuzz
    sweep, r6): a reading missing its key, timestamp, or PK tiebreaker
    cannot be placed on the (key, time) axis — it is dropped, in BOTH
    engines. Leaving such rows in would make every lag/lead and
    boundary stitch engine-dependent (Spark windows sort NULLS FIRST,
    DuckDB NULLS LAST; SQL joins never match NULL keys), which is
    exactly the divergence class the round-6 fuzz sweep surfaced."""
    for c in cols:
        df = df.filter(F.col(c).isNotNull())
    return df


def m4_downsample(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    bucket_seconds: int,
    *,
    bucket_alias: str = "bucket_ts",
) -> DataFrame:
    """M4 downsampling: per (key, pixel-bucket) the four extremes that
    make a downsampled line chart pixel-exact — first/last by time,
    min/max by value, each with its timestamp where meaningful.

    One hash aggregate, map-side combined: the corpus collapses to
    |keys| × |buckets| rows in the mappers, so the shuffle carries the
    rendered chart, not the data. Every extreme is a lexicographic
    struct min/max (exact comparisons, no floats summed), so rows
    hash identically cross-engine. Tie rules are part of the
    contract: ``first`` is the value at the smallest (ts, value)
    pair, ``last`` at the largest; ``t_at_min`` is the EARLIEST
    timestamp achieving the minimum value, ``t_at_max`` the LATEST
    achieving the maximum (min/max struct ordering respectively).
    NULL values carry no pixel and are excluded.
    """
    b = time_bucket(ts_col, bucket_seconds).alias(bucket_alias)
    t, v = F.col(ts_col), F.col(value_col)
    agg = (
        df.filter(v.isNotNull())
        .groupBy(b, key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct(t.alias("t"), v.alias("v"))).alias("_first"),
            F.max(F.struct(t.alias("t"), v.alias("v"))).alias("_last"),
            F.min(F.struct(v.alias("v"), t.alias("t"))).alias("_lo"),
            F.max(F.struct(v.alias("v"), t.alias("t"))).alias("_hi"),
        )
    )
    return agg.select(
        bucket_alias,
        key_col,
        "n",
        F.col("_first.v").alias("v_first"),
        F.col("_last.v").alias("v_last"),
        F.col("_lo.v").alias("v_min"),
        F.col("_lo.t").alias("t_at_min"),
        F.col("_hi.v").alias("v_max"),
        F.col("_hi.t").alias("t_at_max"),
    )


def lttb_indices(xs, vs, n_out: int):
    """Largest-Triangle-Three-Buckets point selection (Steinarsson
    2013): indices of the ``n_out`` points that best preserve the
    series' visual shape. Pure numpy on one series — the per-group
    kernel of `lttb_downsample`, importable for reference testing.

    First and last points are always kept; each interior bucket keeps
    the point maximizing the triangle area with the previously kept
    point and the NEXT bucket's centroid. Ties take the earliest
    point (np.argmax), so selection is deterministic for a
    deterministically ordered series.

    EXACT INTEGER arithmetic (VERDICT r10 #8, the house exact-BIGINT
    style): inputs are int64 x offsets and int64 scaled values
    (`lttb_downsample` quantizes), and the per-point triangle area is
    compared via the centroid-count-scaled cross product

        |(c·x_a − Σx)·(v_i − v_a) − (x_a − x_i)·(Σv − c·v_a)|

    — the float formula times c (argmax-invariant, c > 0), with the
    next-bucket mean replaced by its exact (count, sum) pair. Every
    comparison is therefore exact: selection is bit-identical across
    partitionings, engines, and summation orders, which is what makes
    the chain-dependent argmax replayable by the DuckDB recursive-CTE
    oracle (a float kernel's np pairwise-summation means cannot be
    reproduced bit-for-bit in SQL). Overflow contract (the ACF/CUSUM
    discipline): |terms| ≤ 2·c·max(x)·range(v) must stay below 2⁶³,
    checked executably before any product — raise, never wrap.
    """
    import numpy as np

    n = len(xs)
    if n_out >= n:
        return np.arange(n)
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    # rebase x to the series start: offsets are small and exact
    xs = (xs - xs[0]).astype("int64")
    vs = vs.astype("int64")
    # bucket boundaries over the interior points [1, n-1)
    bounds = np.linspace(1, n - 1, n_out - 1).astype("int64")
    x_max = int(xs[-1])
    v_range = int(vs.max()) - int(vs.min())
    c_max = int(np.max(np.diff(np.append(bounds, n))))
    if 2 * max(c_max, 1) * max(x_max, 1) * max(v_range, 1) >= 2**63:
        raise ValueError(
            "lttb: exact area terms overflow int64 "
            f"(2*{c_max}*{x_max}*{v_range}) — use a coarser ts_unit_us "
            "or fewer decimals"
        )
    keep = np.empty(n_out, dtype="int64")
    keep[0], keep[-1] = 0, n - 1
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = bounds[i + 1], (bounds[i + 2] if i + 2 < n_out - 1 else n)
        c = int(nhi - nlo)
        sx = int(xs[nlo:nhi].sum())
        sv = int(vs[nlo:nhi].sum())
        area = np.abs(
            (c * xs[a] - sx) * (vs[lo:hi] - vs[a])
            - (xs[a] - xs[lo:hi]) * (sv - c * vs[a])
        )
        a = lo + int(np.argmax(area))
        keep[i + 1] = a
    return keep


def lttb_downsample(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    n_out: int,
    *,
    ts_unit_us: int = 1_000_000,
    decimals: int = 2,
) -> DataFrame:
    """Per-key LTTB downsampling to ``n_out`` points — the
    perception-optimal companion to `m4_downsample` (M4 is
    pixel-exact and pure-aggregate; LTTB picks the points a human
    would call the shape of the line, but is inherently sequential
    per series).

    Spark shape: the algorithm's chain dependency (each kept point
    depends on the previous) cannot be a window expression, so this
    is the documented pandas-UDF case (SURVEY §7.3 rule (b)) — but
    NOT one Python call per key: `applyInPandas` invokes the worker
    function once per group, and per-call overhead dominates when
    series are short (measured 9.0 s → 2.6 s at sf0.1's 1 500 keys).
    Instead: hash-repartition on the key, sort within partitions by
    (key, ts, value), and run `mapInPandas` — one Python call per
    ARROW BATCH, with keys contiguous inside each partition and a
    carry buffer stitching the key that straddles a batch boundary.
    Contract: a key's series must fit one worker — true by
    construction for dashboard renders (a render window is
    calendar-bounded, same contract every LTTB server has). For
    corpus-sized series, pre-aggregate with `m4_downsample` or
    `bucketed_agg` first, then LTTB the bounded result. NULL
    key/ts/value rows are excluded (no pixel without a series, a
    time, or a value); the (ts, value) sort makes tie order
    deterministic.

    Geometry is quantized for the exact-integer kernel: x = the ns
    offset from the series start floored to ``ts_unit_us``
    microseconds (default 1 s — render-resolution time), v = the value
    scaled to ``decimals`` with Spark's half-away-from-zero `F.round`
    rule. Selection preserves shape at that resolution and is
    bit-deterministic (see `lttb_indices`), which is what lets the
    DuckDB oracle replay the whole selection chain.
    """
    from pyspark.sql.types import StructType

    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [fields[key_col], fields[ts_col], fields[value_col]]
    )
    unit_ns = int(ts_unit_us) * 1000
    scale = 10 ** int(decimals)

    def _select(pdf):
        import numpy as np
        import pandas as pd

        picked = []
        from purpleair_data_logger_spark.streaming.counter import (
            scale_half_up,
        )

        for _, g in pdf.groupby(key_col, sort=False):
            ns = g[ts_col].to_numpy().astype("int64")
            x = (ns - ns[0]) // unit_ns
            # half-away-from-zero via the exact-frac helper — the
            # naive floor(raw + 0.5) diverges from Spark/DuckDB round
            # on boundary doubles (the +0.5 addition itself rounds)
            v = scale_half_up(
                g[value_col].to_numpy(dtype="float64"), scale
            )
            keep = lttb_indices(x, v, n_out)
            picked.append(g.iloc[keep])
        return pd.concat(picked, ignore_index=True)

    def fn(batches):
        import pandas as pd

        buf = None
        for pdf in batches:
            if buf is not None:
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if len(pdf) == 0:
                buf = None
                continue
            # hold back the (possibly incomplete) trailing key; keys
            # are contiguous, so everything before it is complete
            last = pdf[key_col].iloc[-1]
            tail_mask = pdf[key_col] == last
            buf = pdf[tail_mask]
            done = pdf[~tail_mask]
            if len(done):
                yield _select(done)
        if buf is not None and len(buf):
            yield _select(buf)

    pre = df.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(key_col, ts_col, value_col)
    return (
        _spread_by_key(pre, key_col)
        .sortWithinPartitions(key_col, ts_col, value_col)
        .mapInPandas(fn, out_schema)
    )


def asap_window_and_smooth(vs, max_window: int):
    """ASAP smoothing-parameter search (Rong & Bailis, "ASAP:
    Prioritizing Attention via Time Series Smoothing", VLDB 2017;
    TimescaleDB ``asap_smooth``): pick the moving-average window that
    MINIMIZES ROUGHNESS (std of the smoothed series' first
    differences) SUBJECT TO preserving kurtosis (smoothed kurtosis ≥
    original — so spikes/anomalies survive the smoothing instead of
    being averaged away). Returns (window, trailing-aligned smoothed
    values of length len(vs) − window + 1).

    The paper prunes the search with autocorrelation peaks because it
    targets million-point raw series; this engine's contract (same as
    `lttb_downsample`) pre-aggregates to a calendar-bounded series
    first, so the search space is ≤ ``max_window`` candidates over ≤ a
    few thousand points and an EXHAUSTIVE scan is cheaper than the
    pruning bookkeeping — and exactly reproducible by an independent
    reference loop, which the pytest does.
    """
    import numpy as np

    vs = np.asarray(vs, dtype=np.float64)
    n = len(vs)

    def kurtosis(x):
        m = x.mean()
        d = x - m
        m2 = (d * d).mean()
        if m2 == 0:
            return float("-inf")
        return float((d**4).mean() / (m2 * m2))

    def roughness(x):
        if len(x) < 2:
            return 0.0
        return float(np.diff(x).std())

    orig_kurt = kurtosis(vs)
    best_w, best_vals, best_r = 1, vs, roughness(vs)
    hi = min(int(max_window), n)
    for w in range(2, hi + 1):
        sm = np.convolve(vs, np.full(w, 1.0 / w), mode="valid")
        if kurtosis(sm) >= orig_kurt and roughness(sm) < best_r:
            best_w, best_vals, best_r = w, sm, roughness(sm)
    return best_w, best_vals


def asap_smooth(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    *,
    max_window: int = 100,
) -> DataFrame:
    """Per-key ASAP smoothing: the automatically-parameterized moving
    average a dashboard should draw instead of a hand-tuned one —
    roughness-minimal, kurtosis-preserving (see
    `asap_window_and_smooth`).

    Spark shape: identical to `lttb_downsample` (the chain-dependent
    pandas case): hash-repartition on the key, sort within partitions,
    ONE Python call per Arrow batch via ``mapInPandas`` with a carry
    buffer for the key straddling a batch boundary. Same
    series-fits-one-worker contract — pre-aggregate corpus-sized
    series (`bucketed_agg` / `m4_downsample`) first. Output: one row
    per smoothed point (trailing-aligned: a point's timestamp is its
    window's END) plus the chosen window, NULL values excluded.
    """
    from pyspark.sql import types as T

    fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            fields[key_col],
            fields[ts_col],
            T.StructField("value_smoothed", T.DoubleType()),
            T.StructField("window", T.IntegerType()),
        ]
    )

    def _smooth(pdf):
        import pandas as pd

        out = []
        for _, g in pdf.groupby(key_col, sort=False):
            vs = g[value_col].to_numpy(dtype="float64")
            w, sm = asap_window_and_smooth(vs, max_window)
            out.append(
                pd.DataFrame(
                    {
                        key_col: g[key_col].iloc[w - 1 :].to_numpy(),
                        ts_col: g[ts_col].iloc[w - 1 :].to_numpy(),
                        "value_smoothed": sm,
                        "window": w,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    def fn(batches):
        import pandas as pd

        buf = None
        for pdf in batches:
            if buf is not None:
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if len(pdf) == 0:
                buf = None
                continue
            last = pdf[key_col].iloc[-1]
            tail_mask = pdf[key_col] == last
            buf = pdf[tail_mask]
            done = pdf[~tail_mask]
            if len(done):
                yield _smooth(done)
        if buf is not None and len(buf):
            yield _smooth(buf)

    # NULL key/ts rows are unplaceable and dropped (the `_placeable`
    # family contract, and exactly what `lttb_downsample` does). Found
    # by the r14 fuzz twin: the r13 `_spread_by_key` change hashes NULL
    # keys into their own partition, where pandas `groupby` (which
    # drops NaN keys) left `_smooth` with zero groups and
    # `pd.concat([])` raised — before the spread, NULL-key rows rode a
    # mixed partition and were dropped silently by the same groupby.
    pre = df.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        key_col, ts_col, F.col(value_col).cast("double").alias(value_col)
    )
    return (
        _spread_by_key(pre, key_col)
        .sortWithinPartitions(key_col, ts_col, value_col)
        .mapInPandas(fn, out_schema)
    )


def m4_then_lttb(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    bucket_seconds: int,
    n_out: int,
) -> DataFrame:
    """The corpus-scale LTTB path SCALE.md prescribes, as one
    operator: `lttb_downsample`'s contract is that a key's series fits
    one worker, which raw corpus series violate — so pre-aggregate
    with M4 first (pure distributed aggregate, collapses each series
    to ≤ 4 points per bucket while preserving the rendered shape
    pixel-exactly), then run LTTB over the bounded extreme-point
    series.

    The M4 stage here keeps each extreme's TIMESTAMP (first/last by
    time, min/max by value — the same struct-extreme aggregate and tie
    rules as `m4_downsample`, which the driver gate oracles), explodes
    the ≤ 4 (ts, value) points per (key, bucket), dedupes points that
    are several extremes at once, and hands the result — |buckets|-
    bounded per key, worker-sized by construction — to
    `lttb_downsample`. Composition output is exactly
    ``lttb_downsample(m4_points)``, pinned by the pytest parity test;
    the stage is rows-only at the driver because LTTB's sequential
    selection is not SQL-expressible.
    """
    b = time_bucket(ts_col, bucket_seconds).alias("_mb")
    t, v = F.col(ts_col), F.col(value_col)
    agg = (
        df.filter(v.isNotNull())
        .groupBy(b, key_col)
        .agg(
            F.min(F.struct(t.alias("t"), v.alias("v"))).alias("_first"),
            F.max(F.struct(t.alias("t"), v.alias("v"))).alias("_last"),
            F.min(F.struct(v.alias("v"), t.alias("t"))).alias("_lo"),
            F.max(F.struct(v.alias("v"), t.alias("t"))).alias("_hi"),
        )
    )
    pts = (
        agg.select(
            key_col,
            F.explode(
                F.array(
                    F.struct(
                        F.col("_first.t").alias(ts_col),
                        F.col("_first.v").alias(value_col),
                    ),
                    F.struct(
                        F.col("_last.t").alias(ts_col),
                        F.col("_last.v").alias(value_col),
                    ),
                    F.struct(
                        F.col("_lo.t").alias(ts_col),
                        F.col("_lo.v").alias(value_col),
                    ),
                    F.struct(
                        F.col("_hi.t").alias(ts_col),
                        F.col("_hi.v").alias(value_col),
                    ),
                )
            ).alias("_p"),
        )
        .select(key_col, F.col(f"_p.{ts_col}"), F.col(f"_p.{value_col}"))
        .distinct()
    )
    return lttb_downsample(pts, ts_col, key_col, value_col, n_out)


def gap_incidents(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    id_col: str,
    threshold_seconds: int,
    *,
    partition_seconds: int = 86_400,
) -> DataFrame:
    """Downtime incident report: per key, every gap between
    consecutive readings longer than ``threshold`` — the inverse of
    `heartbeat_uptime` (that answers "how covered was each bucket";
    this answers "WHEN exactly did the sensor go dark, and for how
    long", the row an alerting pipeline files a ticket from).

    Same two-tier rule as `counter_delta`: the consecutive-pair lag
    runs over (key, calendar-partition) windows — bounded partitions —
    and the partition-boundary pair stitches via ``lag`` over the
    per-(key, partition) AGGREGATE, so no corpus-row window ever keys
    on the bare sensor id. A reading's in-partition ``lag`` is NULL
    exactly when it's the partition's first row, which is when the
    boundary value applies — so one ``coalesce`` resolves both tiers.
    Gaps are exact microsecond longs; a key's first-ever reading has
    no predecessor and reports nothing.
    """
    threshold_us = int(threshold_seconds) * 1_000_000
    df = _placeable(df, key_col, ts_col, id_col)
    b = time_bucket(ts_col, partition_seconds).alias("_pb")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w_in = Window.partitionBy(key_col, "_pb").orderBy("_t", id_col)
    staged = (
        df.select(F.col(key_col), b, F.col(id_col), ts_us.alias("_t"))
        .withColumn("_prev_in", F.lag("_t").over(w_in))
    )
    lasts = staged.groupBy(key_col, "_pb").agg(F.max("_t").alias("_plast"))
    w_b = Window.partitionBy(key_col).orderBy("_pb")
    boundary = lasts.select(
        key_col, "_pb", F.lag("_plast").over(w_b).alias("_prev_bound")
    )
    joined = staged.join(boundary, on=[key_col, "_pb"], how="left")
    prev = F.coalesce(F.col("_prev_in"), F.col("_prev_bound"))
    gap = F.col("_t") - prev
    return joined.filter(prev.isNotNull() & (gap > threshold_us)).select(
        key_col,
        F.timestamp_micros(prev).alias("gap_start_ts"),
        F.timestamp_micros(F.col("_t")).alias("gap_end_ts"),
        gap.alias("gap_us"),
    )


def state_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    state_col: str,
    id_col: str,
    *,
    partition_seconds: int = 86_400,
) -> DataFrame:
    """TimescaleDB ``state_agg``-style time-in-state: per (key, state)
    the total microseconds the key spent in that state, LOCF semantics
    — each reading's state holds until the key's NEXT reading (the
    reference schema's ``channel_state``/``channel_flags`` columns,
    ``PurpleAirPSQLQueryStatements.py:28-31``, are exactly this shape:
    a categorical that changes rarely and is sampled every poll).

    A key's LAST reading has no successor and contributes no duration
    (the open-ended tail is unknowable in a batch report — the
    streaming heartbeat/downtime mirrors own the live tail). NULL
    states carry no sample. Consecutive same-state readings need no
    merging: summing per-reading ``next − cur`` grouped by state
    equals summing merged runs.

    Scale shape: the same two-tier rule as `counter_delta`/
    `gap_incidents` — the successor lookup is an in-partition ``lead``
    over bounded (key, calendar-partition) windows, stitched at the
    boundary by a ``lead`` over the per-(key, partition) AGGREGATE;
    no corpus-row window ever keys on the bare sensor id. Durations
    are exact BIGINT microseconds (engine-portable, no floats).

    Output: (key, state_col, duration_us, n_samples).
    """
    b = time_bucket(ts_col, partition_seconds).alias("_pb")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w_in = Window.partitionBy(key_col, "_pb").orderBy("_t", id_col)
    staged = (
        _placeable(df, key_col, ts_col, id_col)
        .filter(F.col(state_col).isNotNull())
        .select(
            F.col(key_col),
            b,
            F.col(id_col),
            F.col(state_col).alias("_st"),
            ts_us.alias("_t"),
        )
        .withColumn("_next_in", F.lead("_t").over(w_in))
    )
    firsts = staged.groupBy(key_col, "_pb").agg(F.min("_t").alias("_pfirst"))
    w_b = Window.partitionBy(key_col).orderBy("_pb")
    boundary = firsts.select(
        key_col, "_pb", F.lead("_pfirst").over(w_b).alias("_next_bound")
    )
    joined = staged.join(boundary, on=[key_col, "_pb"], how="left")
    # in-partition lead is NULL exactly for the partition's last row,
    # which is when the next partition's first reading applies
    nxt = F.coalesce(F.col("_next_in"), F.col("_next_bound"))
    return (
        joined.filter(nxt.isNotNull())
        .groupBy(key_col, F.col("_st").alias(state_col))
        .agg(
            F.sum(nxt - F.col("_t")).cast("long").alias("duration_us"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


def state_agg_bucketed(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    state_col: str,
    id_col: str,
    bucket_seconds: int,
    *,
    partition_seconds: int = 86_400,
    bucket_alias: str = "bucket_ts",
) -> DataFrame:
    """TimescaleDB ``duration_in(state, agg, bucket)``-style bucketed
    time-in-state: per (key, state, bucket) the exact microseconds the
    key spent in that state within the bucket — `state_agg`'s totals
    resolved onto a dashboard time axis ("hourly seconds-in-'error'
    per channel").

    Same LOCF interval per reading as `state_agg` (``[ts, next_ts)``
    via the two-tier lead; the open-ended last reading contributes
    nothing), then the heartbeat-uptime explode: each interval lands
    on every bucket it touches (JVM-side ``sequence``, no shuffle) and
    is clipped exactly. Consecutive intervals never overlap, so the
    clipped lengths sum without an interval-merge pass.

    Scale note the bounded-timeout heartbeat doesn't need: the explode
    factor here is interval-span / bucket — a state held for a month
    over hourly buckets explodes ×720. That is the same expansion any
    engine materializing a month of hourly rows pays (it IS the output
    size), but pick ``bucket_seconds`` accordingly for sparse keys.
    """
    bucket_us = int(bucket_seconds) * 1_000_000
    b = time_bucket(ts_col, partition_seconds).alias("_pb")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w_in = Window.partitionBy(key_col, "_pb").orderBy("_t", id_col)
    staged = (
        _placeable(df, key_col, ts_col, id_col)
        .filter(F.col(state_col).isNotNull())
        .select(
            F.col(key_col),
            b,
            F.col(id_col),
            F.col(state_col).alias("_st"),
            ts_us.alias("_t"),
        )
        .withColumn("_next_in", F.lead("_t").over(w_in))
    )
    firsts = staged.groupBy(key_col, "_pb").agg(F.min("_t").alias("_pfirst"))
    w_b = Window.partitionBy(key_col).orderBy("_pb")
    boundary = firsts.select(
        key_col, "_pb", F.lead("_pfirst").over(w_b).alias("_next_bound")
    )
    nxt = F.coalesce(F.col("_next_in"), F.col("_next_bound"))
    iv = (
        staged.join(boundary, on=[key_col, "_pb"], how="left")
        .withColumn("_nxt", nxt)
        .filter(F.col("_nxt").isNotNull() & (F.col("_nxt") > F.col("_t")))
    )
    lo_b = F.expr(f"_t div {bucket_us}L")
    hi_b = F.expr(f"(_nxt - 1) div {bucket_us}L")
    exploded = iv.select(
        F.col(key_col),
        F.col("_st"),
        F.col("_t"),
        F.col("_nxt"),
        F.explode(F.sequence(lo_b, hi_b)).alias("_b"),
    )
    covered = F.least(F.col("_nxt"), (F.col("_b") + 1) * bucket_us) - F.greatest(
        F.col("_t"), F.col("_b") * bucket_us
    )
    return (
        exploded.groupBy(
            key_col,
            F.col("_st").alias(state_col),
            F.timestamp_seconds(F.col("_b") * bucket_seconds).alias(
                bucket_alias
            ),
        )
        .agg(F.sum(covered).cast("long").alias("duration_us"))
    )


def state_timeline(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    state_col: str,
    id_col: str,
    *,
    partition_seconds: int = 86_400,
) -> DataFrame:
    """TimescaleDB ``timeline_agg``-style state-transition log: one
    row per reading whose state DIFFERS from the key's previous
    reading — (key, transition_ts, from_state, to_state), the ordered
    edge list from which any state timeline reconstructs (the
    companion read to `state_agg`'s per-state totals: state_agg says
    how long, this says when).

    Same two-tier shape as `gap_incidents`, applied to the state
    column: in-partition ``lag(state)`` over bounded (key,
    calendar-partition) windows; the partition's first row (its lag is
    NULL exactly then) stitches to the PREVIOUS partition's last state
    via a lag over the per-(key, partition) aggregate, where "last"
    is a lexicographic struct max over (ts, id, state) — deterministic
    under duplicate timestamps. NULL states carry no sample; a key's
    first-ever reading has no predecessor and is not a transition.
    """
    b = time_bucket(ts_col, partition_seconds).alias("_pb")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w_in = Window.partitionBy(key_col, "_pb").orderBy("_t", id_col)
    staged = (
        _placeable(df, key_col, ts_col, id_col)
        .filter(F.col(state_col).isNotNull())
        .select(
            F.col(key_col),
            b,
            F.col(id_col),
            F.col(state_col).alias("_st"),
            ts_us.alias("_t"),
        )
        .withColumn("_prev_in", F.lag("_st").over(w_in))
    )
    lasts = staged.groupBy(key_col, "_pb").agg(
        F.max(
            F.struct(
                F.col("_t").alias("t"),
                F.col(id_col).alias("i"),
                F.col("_st").alias("s"),
            )
        )["s"].alias("_plast")
    )
    w_b = Window.partitionBy(key_col).orderBy("_pb")
    boundary = lasts.select(
        key_col, "_pb", F.lag("_plast").over(w_b).alias("_prev_bound")
    )
    joined = staged.join(boundary, on=[key_col, "_pb"], how="left")
    prev = F.coalesce(F.col("_prev_in"), F.col("_prev_bound"))
    return joined.filter(prev.isNotNull() & (prev != F.col("_st"))).select(
        key_col,
        F.timestamp_micros(F.col("_t")).alias("transition_ts"),
        prev.alias("from_state"),
        F.col("_st").alias("to_state"),
    )


def trend_stats(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    *,
    decimals: int = 2,
) -> DataFrame:
    """TimescaleDB ``stats_agg → slope/intercept``: per-key least-
    squares linear trend of a value over time — the "is this sensor
    drifting, and how fast" read.

    Determinism discipline: the Gram sums (n, Σc, Σt, Σct, Σt²) are
    EXACT BIGINTs — value scaled to its decimal granularity,
    timestamps rebased to the key's first reading (two-scan shape, the
    `winsorized_stats` pattern: per-key min broadcast back) so the
    products fit int64 — and only the final slope/intercept divisions
    are floats, in a fixed expression order, so results are
    bit-identical cross-engine. Overflow contract (documented, like
    `time_weighted_avg`): rows_per_key · c_max · range_seconds < 2⁶³ —
    with 2-decimal readings (c_max ≈ 10⁶) and a 1-year window
    (3.2·10⁷ s) safe through ~2.9·10⁵ rows per key, i.e. ~20× the
    reference's 65 s cadence over that year.

    A key with all readings at one timestamp has an undefined slope —
    emitted NULL, with the intercept falling back to the plain mean.

    Output: (key, n, t0, slope_per_hour, intercept) — slope in value
    units per hour, intercept in value units at t0.
    """
    scale = 10**decimals
    t = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    staged = _placeable(df, key_col, ts_col).filter(
        F.col(value_col).isNotNull()
    ).select(
        F.col(key_col),
        t.alias("_t"),
        _scaled(value_col, decimals).alias("_c"),
    )
    t0s = staged.groupBy(key_col).agg(F.min("_t").alias("_t0"))
    j = staged.join(F.broadcast(t0s), on=key_col).withColumn(
        "_dt", F.col("_t") - F.col("_t0")
    )
    g = j.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_t0").alias("_t0"),
        F.sum("_c").alias("_sc"),
        F.sum("_dt").alias("_st"),
        F.sum(F.col("_c") * F.col("_dt")).alias("_sct"),
        F.sum(F.col("_dt") * F.col("_dt")).alias("_stt"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("_sct") - d("_sc") * d("_st")
    den = d("n") * d("_stt") - d("_st") * d("_st")
    slope = num / den  # value-scale units per second
    return g.select(
        key_col,
        "n",
        F.timestamp_seconds(F.col("_t0")).alias("t0"),
        F.when(den != 0.0, slope * 3600.0 / scale).alias("slope_per_hour"),
        F.when(
            den != 0.0,
            (d("_sc") - slope * d("_st")) / d("n") / scale,
        )
        .otherwise(d("_sc") / d("n") / scale)
        .alias("intercept"),
    )


def _scaled(value_col: str, decimals: int) -> Column:
    """Value scaled to an exact integer at its decimal granularity —
    the same cross-engine-determinism trick `time_weighted_avg` uses:
    integer sums are order-independent, float sums are not."""
    return F.round(F.col(value_col) * (10**decimals)).cast("long")


def counter_delta(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    id_col: str,
    bucket_seconds: int,
    *,
    decimals: int = 2,
    bucket_alias: str = "bucket_ts",
) -> DataFrame:
    """TimescaleDB ``counter_agg → delta``: per-bucket increase of a
    monotone counter that resets to zero (reboots, rollovers).

    Semantics: order each key's readings by (ts, id); for every
    consecutive pair the increment is ``cur − prev`` if the counter
    grew, else ``cur`` (a reset restarts the count from 0 and the new
    reading is all growth). A bucket's delta sums the increments of
    pairs whose CURRENT reading falls in the bucket — so the pair
    straddling a bucket edge is charged to the later bucket, and the
    key's first-ever reading contributes nothing (no prior to diff
    against). ``n_resets`` counts downward steps the same way.

    Scale shape: the sequential dependency is resolved in two tiers —
    a lag window over (key, bucket) partitions (bounded by per-bucket
    sample count, never corpus-sized), then the bucket-boundary pair
    via ``lag`` over the per-(key, bucket) aggregate, whose partition
    is calendar-bounded (8 760 rows/key/year at 1 h). No window ever
    partitions corpus rows by the bare key. Arithmetic is exact: the
    value is scaled to an integer at its decimal granularity, all
    sums are BIGINT, and the only float op is one final division.
    """
    scale = 10**decimals
    b = time_bucket(ts_col, bucket_seconds).alias(bucket_alias)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w_in = Window.partitionBy(key_col, bucket_alias).orderBy("_ts_us", id_col)
    staged = (
        _placeable(df, key_col, ts_col, id_col)
        .filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col),
            b,
            F.col(id_col),
            ts_us.alias("_ts_us"),
            _scaled(value_col, decimals).alias("_c"),
        )
        .withColumn("_p", F.lag("_c").over(w_in))
    )
    inc_in = (
        F.when(F.col("_p").isNull(), F.lit(0))
        .when(F.col("_c") >= F.col("_p"), F.col("_c") - F.col("_p"))
        .otherwise(F.col("_c"))
    )
    reset_in = F.when(
        F.col("_p").isNotNull() & (F.col("_c") < F.col("_p")), F.lit(1)
    ).otherwise(F.lit(0))
    bagg = staged.groupBy(key_col, bucket_alias).agg(
        F.sum(inc_in).alias("_inc"),
        F.sum(reset_in).alias("_res"),
        F.min(F.struct(F.col("_ts_us"), F.col(id_col), F.col("_c"))).alias(
            "_first"
        ),
        F.max(F.struct(F.col("_ts_us"), F.col(id_col), F.col("_c"))).alias(
            "_last"
        ),
        F.count(F.lit(1)).alias("n_samples"),
    )
    # bucket-boundary pair: previous bucket's last reading vs this
    # bucket's first — a window over AGGREGATE rows only.
    w_b = Window.partitionBy(key_col).orderBy(bucket_alias)
    prev_last = F.lag(F.col("_last._c")).over(w_b)
    first_c = F.col("_first._c")
    b_inc = (
        F.when(prev_last.isNull(), F.lit(0))
        .when(first_c >= prev_last, first_c - prev_last)
        .otherwise(first_c)
    )
    b_res = F.when(
        prev_last.isNotNull() & (first_c < prev_last), F.lit(1)
    ).otherwise(F.lit(0))
    return bagg.select(
        key_col,
        bucket_alias,
        (
            (F.col("_inc") + b_inc).cast("double") / F.lit(float(scale))
        ).alias("counter_delta"),
        (F.col("_res") + b_res).cast("long").alias("n_resets"),
        "n_samples",
    )


def heartbeat_uptime(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    id_col: str,
    bucket_seconds: int,
    timeout_seconds: int,
    *,
    bucket_alias: str = "bucket_ts",
) -> DataFrame:
    """TimescaleDB ``heartbeat_agg``-style uptime: each reading
    asserts liveness for ``[ts, ts + timeout)``; a reading before that
    expires extends the live interval. Per (key, bucket) the output
    is the union coverage of those intervals clipped to the bucket —
    exact microseconds, plus the one-division ratio.

    Construction: a reading's live interval is
    ``[ts, min(next_ts, ts + timeout))`` — truncated at the next
    reading, so consecutive intervals never overlap and their clipped
    lengths SUM to the union (no interval-merge pass needed). The
    last reading of a key runs the full timeout. Intervals may span
    bucket edges, so each is exploded onto the buckets it covers —
    the explode factor is bounded by ``ceil(timeout/bucket) + 1``
    (generated JVM-side via ``sequence``, no shuffle), and the final
    hash aggregate is map-side combined.

    The "next reading" lookup follows the module's two-tier rule:
    ``lead`` within (key, bucket) partitions resolves every pair but
    the bucket-last, which takes the next bucket's first reading from
    a ``lead`` over the per-(key, bucket) aggregate — never a
    corpus-row window on the bare key.

    Duplicate timestamps (two readings at the same microsecond) yield
    an empty interval for the earlier one — dropped, since Spark's
    ``sequence(lo, hi)`` would otherwise generate a DESCENDING range
    for hi < lo and silently invent coverage.
    """
    bucket_us = int(bucket_seconds) * 1_000_000
    timeout_us = int(timeout_seconds) * 1_000_000
    b = time_bucket(ts_col, bucket_seconds).alias(bucket_alias)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w_in = Window.partitionBy(key_col, bucket_alias).orderBy("_t", id_col)
    staged = (
        _placeable(df, key_col, ts_col, id_col)
        .select(
            F.col(key_col), b, F.col(id_col), ts_us.alias("_t")
        )
        .withColumn("_nxt_in", F.lead("_t").over(w_in))
    )
    # next bucket's first reading, from the aggregate (tiny partitions)
    firsts = staged.groupBy(key_col, bucket_alias).agg(
        F.min("_t").alias("_bfirst")
    )
    w_b = Window.partitionBy(key_col).orderBy(bucket_alias)
    nxt_bucket = firsts.select(
        key_col,
        bucket_alias,
        F.lead("_bfirst").over(w_b).alias("_nxt_bfirst"),
    )
    iv = (
        staged.join(nxt_bucket, on=[key_col, bucket_alias], how="left")
        .withColumn(
            "_end",
            F.least(
                F.coalesce(
                    F.col("_nxt_in"),
                    F.col("_nxt_bfirst"),
                    F.col("_t") + timeout_us,
                ),
                F.col("_t") + timeout_us,
            ),
        )
        .filter(F.col("_end") > F.col("_t"))
    )
    # explode the interval onto every bucket index it touches. Integer
    # `div`, not a double division: epoch micros (~1.7e15) divided as
    # doubles sit within a few ulp of integer bucket boundaries.
    lo_b = F.expr(f"_t div {bucket_us}L")
    hi_b = F.expr(f"(_end - 1) div {bucket_us}L")
    exploded = iv.select(
        F.col(key_col),
        F.col("_t"),
        F.col("_end"),
        F.explode(F.sequence(lo_b, hi_b)).alias("_b"),
    )
    covered = F.least(F.col("_end"), (F.col("_b") + 1) * bucket_us) - F.greatest(
        F.col("_t"), F.col("_b") * bucket_us
    )
    return (
        exploded.groupBy(
            key_col,
            F.timestamp_seconds(F.col("_b") * bucket_seconds).alias(
                bucket_alias
            ),
        )
        .agg(F.sum(covered).alias("uptime_us"))
        .select(
            key_col,
            bucket_alias,
            "uptime_us",
            (
                F.col("uptime_us").cast("double") / F.lit(float(bucket_us))
            ).alias("uptime_ratio"),
        )
    )


def candlestick(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    id_col: str,
    bucket_seconds: int,
    *,
    decimals: int = 2,
    bucket_alias: str = "bucket_ts",
) -> DataFrame:
    """TimescaleDB ``candlestick_agg`` (OHLC): per (key, bucket) the
    open/high/low/close of the value series plus an exact mean and the
    sample count — the financial-rollup read every Grafana candlestick
    panel issues, and the compaction step that turns a raw tick table
    into a per-bucket OHLC hypertable.

    open/close are the values at the lexicographically first/last
    (ts, id) of the bucket — the ``counter_delta`` struct-extreme
    trick, deterministic under duplicate timestamps because the id
    breaks ties. Scale shape: ONE map-side-combined aggregate (the M4
    shape) — the shuffle carries |keys| × |buckets| rows, never raw
    ticks; no window, no sort, no join. o/h/l/c are raw values (no
    float summation anywhere); the mean sums the value scaled to its
    decimal granularity as BIGINT and divides once, in a fixed order
    mirrored by the oracle.
    """
    scale = 10**decimals
    b = time_bucket(ts_col, bucket_seconds).alias(bucket_alias)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    staged = _placeable(df, key_col, ts_col, id_col).filter(
        F.col(value_col).isNotNull()
    ).select(
        F.col(key_col),
        b,
        ts_us.alias("_ts_us"),
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("double").alias("_v"),
        _scaled(value_col, decimals).alias("_c"),
    )
    g = staged.groupBy(key_col, bucket_alias).agg(
        F.min(F.struct("_ts_us", "_id", "_v")).alias("_o"),
        F.max(F.struct("_ts_us", "_id", "_v")).alias("_cl"),
        F.max("_v").alias("high_value"),
        F.min("_v").alias("low_value"),
        F.sum("_c").alias("_s"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    return g.select(
        key_col,
        bucket_alias,
        F.col("_o._v").alias("open_value"),
        "high_value",
        "low_value",
        F.col("_cl._v").alias("close_value"),
        (
            F.col("_s").cast("double")
            / F.col("n_samples")
            / F.lit(float(scale))
        ).alias("avg_value"),
        F.col("_o._ts_us").alias("open_ts_us"),
        F.col("_cl._ts_us").alias("close_ts_us"),
        "n_samples",
    )


def cusum_scan(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    id_col: str,
    *,
    slack: float,
    threshold: float,
    decimals: int = 2,
    partition_seconds: int = 86_400,
) -> DataFrame:
    """One-sided upward CUSUM change-point detection per key — the
    classic Page (1954) drift detector a monitoring stack runs next to
    the Grafana threshold panels (the reference's alerting read is a
    plain MAX panel, ``PurpleAirPSQLQueryStatements.py:564-580``;
    CUSUM catches the slow drift a MAX threshold misses).

    Semantics: per key, readings ordered by (ts, id). The target is
    the key's integer-truncated mean (exact: BIGINT sum of the
    decimal-scaled values, integer division by n — Spark ``div`` and
    DuckDB ``//`` both truncate toward zero, so the target is
    bit-identical cross-engine). With
    d_i = v_i − target − slack, the detector is the recurrence
    S_0 = 0, S_i = max(0, S_{i−1} + d_i), and a row alarms when
    S_i > threshold.

    The recurrence is NOT evaluated sequentially: by the prefix
    identity S_i = P_i − min_{0≤j≤i} P_j (P = prefix sum of d,
    P_0 = 0), the whole scan is two window functions — a running sum
    and a running min of that sum — pure window algebra, no UDF, no
    driver loop. Arithmetic is exact BIGINT end-to-end (decimal-scaled
    values), so the alarm set is bit-identical across engines; the
    only float op is the final descale of the emitted statistic.

    Scale shape: the same two-tier rule as `counter_delta` — both
    windows run inside (key, calendar-partition) partitions, then the
    cross-partition carry (running total and running min-prefix) is
    resolved by windows over the per-(key, partition) AGGREGATE and
    joined back. No window ever partitions corpus rows by the bare
    key. The target-mean join is a plain equi-join on the key (AQE
    picks broadcast when the per-key aggregate is small).

    Output: the alarm rows only —
    (key, id, ts_col, value_col, cusum) with ``cusum`` = S_i in value
    units.
    """
    scale = 10**decimals
    k_scaled = int(round(slack * scale))
    h_scaled = int(round(threshold * scale))
    b = time_bucket(ts_col, partition_seconds).alias("_pb")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    filtered = _placeable(df, key_col, ts_col, id_col).filter(
        F.col(value_col).isNotNull()
    ).select(
        F.col(key_col),
        b,
        F.col(id_col),
        F.col(ts_col),
        F.col(value_col),
        ts_us.alias("_t"),
        _scaled(value_col, decimals).alias("_v"),
    )
    targets = filtered.groupBy(key_col).agg(
        F.sum("_v").alias("_sv"), F.count(F.lit(1)).alias("_n")
    )
    targets = targets.select(
        key_col, F.expr("_sv div _n").alias("_mu")
    )
    staged = filtered.join(targets, on=key_col).withColumn(
        "_d", F.col("_v") - F.col("_mu") - F.lit(k_scaled)
    )
    w_in = (
        Window.partitionBy(key_col, "_pb")
        .orderBy("_t", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = staged.withColumn("_ps", F.sum("_d").over(w_in))
    w_in2 = (
        Window.partitionBy(key_col, "_pb")
        .orderBy("_t", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = staged.withColumn("_pm", F.min("_ps").over(w_in2))
    # per-(key, partition) aggregate: partition total and min-prefix
    pagg = staged.groupBy(key_col, "_pb").agg(
        F.sum("_d").alias("_tot"), F.min("_ps").alias("_minp")
    )
    w_b_off = (
        Window.partitionBy(key_col)
        .orderBy("_pb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pagg = pagg.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_b_off), F.lit(0))
    ).withColumn("_gm", F.col("_off") + F.col("_minp"))
    w_b_carry = (
        Window.partitionBy(key_col)
        .orderBy("_pb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = pagg.select(
        key_col,
        "_pb",
        "_off",
        # min global-prefix over PREVIOUS partitions; 0 (= P_0, the
        # empty prefix) is folded in below, so NULL→0 is harmless
        F.coalesce(F.min("_gm").over(w_b_carry), F.lit(0)).alias("_carry"),
    )
    joined = staged.join(boundary, on=[key_col, "_pb"])
    p_global = F.col("_off") + F.col("_ps")
    prefmin = F.least(
        F.lit(0).cast("long"),
        F.col("_carry"),
        F.col("_off") + F.col("_pm"),
    )
    s_stat = p_global - prefmin
    return (
        joined.withColumn("_s", s_stat)
        .filter(F.col("_s") > F.lit(h_scaled))
        .select(
            key_col,
            id_col,
            ts_col,
            value_col,
            (F.col("_s").cast("double") / F.lit(float(scale))).alias("cusum"),
        )
    )


def cusum_scan_twosided(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    id_col: str,
    *,
    slack: float,
    threshold: float,
    decimals: int = 2,
    partition_seconds: int = 86_400,
) -> DataFrame:
    """Two-sided Page CUSUM (VERDICT r5 #4): `cusum_scan` detects only
    upward drift, but the equally-common sensor failure drifts DOWN
    (e.g. a clogged PM inlet under-reading) — Page's detector is
    two-sided. Both accumulators run in the same pass:

      up:   d⁺_i = v_i − μ − k,  S⁺_i = max(0, S⁺_{i−1} + d⁺_i)
      down: d⁻_i = v_i − μ + k,  S⁻_i = max(0, S⁻_{i−1} − d⁻_i)

    The prefix identity applies symmetrically — with P⁺/P⁻ the prefix
    sums of d⁺/d⁻:

      S⁺_i = P⁺_i − min_{0≤j≤i} P⁺_j   (running MIN of prefix)
      S⁻_i = max_{0≤j≤i} P⁻_j − P⁻_i   (running MAX of prefix)

    — still pure window algebra, zero Python. All four window
    aggregates (two prefix sums, one running min, one running max)
    share one (key, calendar-partition) partitioning and ordering, so
    Catalyst evaluates them in a single Window node per tier: the
    two-sided scan costs the SAME shuffles as the one-sided one. The
    cross-partition carry follows `cusum_scan`'s two-tier rule with a
    running max of per-partition max-prefixes on the down side.
    Arithmetic is exact BIGINT end-to-end; alarm sets are
    bit-identical cross-engine.

    Output: alarm rows only — (key, id, ts_col, value_col,
    cusum_high, cusum_low, alarm_side) where ``alarm_side`` ∈
    {'up', 'down', 'both'} and the statistics are in value units.
    """
    scale = 10**decimals
    k_scaled = int(round(slack * scale))
    h_scaled = int(round(threshold * scale))
    b = time_bucket(ts_col, partition_seconds).alias("_pb")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    filtered = _placeable(df, key_col, ts_col, id_col).filter(
        F.col(value_col).isNotNull()
    ).select(
        F.col(key_col),
        b,
        F.col(id_col),
        F.col(ts_col),
        F.col(value_col),
        ts_us.alias("_t"),
        _scaled(value_col, decimals).alias("_v"),
    )
    targets = filtered.groupBy(key_col).agg(
        F.sum("_v").alias("_sv"), F.count(F.lit(1)).alias("_n")
    )
    targets = targets.select(key_col, F.expr("_sv div _n").alias("_mu"))
    staged = (
        filtered.join(targets, on=key_col)
        .withColumn("_du", F.col("_v") - F.col("_mu") - F.lit(k_scaled))
        .withColumn("_dd", F.col("_v") - F.col("_mu") + F.lit(k_scaled))
    )
    w_in = (
        Window.partitionBy(key_col, "_pb")
        .orderBy("_t", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = (
        staged.withColumn("_psu", F.sum("_du").over(w_in))
        .withColumn("_psd", F.sum("_dd").over(w_in))
        .withColumn("_pmu", F.min("_psu").over(w_in))
        .withColumn("_pxd", F.max("_psd").over(w_in))
    )
    pagg = staged.groupBy(key_col, "_pb").agg(
        F.sum("_du").alias("_totu"),
        F.min("_psu").alias("_minpu"),
        F.sum("_dd").alias("_totd"),
        F.max("_psd").alias("_maxpd"),
    )
    w_b_off = (
        Window.partitionBy(key_col)
        .orderBy("_pb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pagg = (
        pagg.withColumn(
            "_offu", F.coalesce(F.sum("_totu").over(w_b_off), F.lit(0))
        )
        .withColumn(
            "_offd", F.coalesce(F.sum("_totd").over(w_b_off), F.lit(0))
        )
        .withColumn("_gmu", F.col("_offu") + F.col("_minpu"))
        .withColumn("_gxd", F.col("_offd") + F.col("_maxpd"))
    )
    w_b_carry = (
        Window.partitionBy(key_col)
        .orderBy("_pb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = pagg.select(
        key_col,
        "_pb",
        "_offu",
        "_offd",
        # min/max global-prefix over PREVIOUS partitions; 0 (= P_0,
        # the empty prefix) is folded in below, so NULL→0 is harmless
        F.coalesce(F.min("_gmu").over(w_b_carry), F.lit(0)).alias("_carryu"),
        F.coalesce(F.max("_gxd").over(w_b_carry), F.lit(0)).alias("_carryd"),
    )
    joined = staged.join(boundary, on=[key_col, "_pb"])
    p_glob_u = F.col("_offu") + F.col("_psu")
    prefmin = F.least(
        F.lit(0).cast("long"), F.col("_carryu"), F.col("_offu") + F.col("_pmu")
    )
    p_glob_d = F.col("_offd") + F.col("_psd")
    prefmax = F.greatest(
        F.lit(0).cast("long"), F.col("_carryd"), F.col("_offd") + F.col("_pxd")
    )
    s_up = p_glob_u - prefmin
    s_dn = prefmax - p_glob_d
    return (
        joined.withColumn("_su", s_up)
        .withColumn("_sd", s_dn)
        .filter(
            (F.col("_su") > F.lit(h_scaled)) | (F.col("_sd") > F.lit(h_scaled))
        )
        .select(
            key_col,
            id_col,
            ts_col,
            value_col,
            (F.col("_su").cast("double") / F.lit(float(scale))).alias(
                "cusum_high"
            ),
            (F.col("_sd").cast("double") / F.lit(float(scale))).alias(
                "cusum_low"
            ),
            F.when(
                (F.col("_su") > F.lit(h_scaled))
                & (F.col("_sd") > F.lit(h_scaled)),
                F.lit("both"),
            )
            .when(F.col("_su") > F.lit(h_scaled), F.lit("up"))
            .otherwise(F.lit("down"))
            .alias("alarm_side"),
        )
    )


def stats2d_exact(
    df: DataFrame,
    group_col: str | list[str],
    x_col: str,
    y_col: str,
    *,
    corr_alias: str = "corr_xy",
    slope_alias: str = "slope",
    intercept_alias: str = "intercept",
) -> DataFrame:
    """TimescaleDB ``stats_agg(y, x)``-style two-variable statistics
    (corr / OLS slope / intercept) per group, computed from EXACT
    integer power sums so the result is bit-identical across engines.

    Float `corr()`/`covar_samp()` aggregates are summation-order
    sensitive — Spark and DuckDB disagree in the last ulps. Here
    ``x_col``/``y_col`` must be integer-valued (counts, decimal-scaled
    readings); the six power sums (n, Σx, Σy, Σxy, Σx², Σy²) are then
    exact BIGINTs with map-side partial aggregation, and the closed
    forms are evaluated in ONE fixed float expression each:

        slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        corr      = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)·(nΣy²−(Σy)²))
        intercept = (Σy − slope·Σx) / n

    NULL in x or y drops the row (a pair needs both coordinates);
    degenerate groups (zero variance) emit NULL for the undefined
    statistics rather than ±inf. BIGINT overflow bound: |nΣxy| must
    stay under 2⁶³ — fine for count-valued series (10⁶ buckets ×
    10⁶-scale counts); decimal-scale wider inputs down first.

    Single-shuffle plan: one hash aggregate on the group key.
    Output: (group, n_pairs, sum_x, sum_y, corr, slope, intercept).
    """
    keys = [group_col] if isinstance(group_col, str) else list(group_col)
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    g = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(x).alias("sum_x"),
            F.sum(y).alias("sum_y"),
            F.sum(x * y).alias("_sxy"),
            F.sum(x * x).alias("_sxx"),
            F.sum(y * y).alias("_syy"),
        )
    )
    n = F.col("n_pairs")
    cov_n = n * F.col("_sxy") - F.col("sum_x") * F.col("sum_y")
    varx_n = n * F.col("_sxx") - F.col("sum_x") * F.col("sum_x")
    vary_n = n * F.col("_syy") - F.col("sum_y") * F.col("sum_y")
    slope = cov_n.cast("double") / varx_n.cast("double")
    return g.select(
        *keys,
        "n_pairs",
        "sum_x",
        "sum_y",
        F.when(
            (varx_n > 0) & (vary_n > 0),
            cov_n.cast("double")
            / F.sqrt(varx_n.cast("double") * vary_n.cast("double")),
        ).alias(corr_alias),
        F.when(varx_n > 0, slope).alias(slope_alias),
        F.when(
            varx_n > 0,
            (F.col("sum_y").cast("double") - slope * F.col("sum_x").cast("double"))
            / n.cast("double"),
        ).alias(intercept_alias),
    )


def autocorr_exact(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    *,
    lags: tuple[int, ...] = (1, 2, 3),
    decimals: int = 2,
) -> DataFrame:
    """Per-key lag-k autocorrelation of a time series, exactly — the
    feature-engineering / seasonality probe (is the series sticky at
    lag 1? periodic at lag k?) computed with the repo's exact-integer
    discipline: ACF(k) is Pearson corr between the decimal-scaled
    series and itself shifted k observations, so the six power sums
    are exact BIGINTs (`stats2d_exact`) and the one float expression
    per statistic is bit-identical cross-engine — unlike any
    float-accumulating corr aggregate.

    Pairing is OBSERVATION-lag (the ACF of the observed sequence
    ordered by (ts, id) — the deterministic two-column order every
    sequential operator here uses), not calendar-lag; resample first
    (`time_bucket` aggregates / gapfill) for fixed-period ACF.

    Scale shape: ONE window shuffle on the key computes every lag's
    lead in the same pass; the explode emits |lags| pairs per row; one
    map-side-combined aggregate per (key, lag) finishes. Overflow
    contract (the `stats2d_exact` bound): n·Σx² < 2⁶³ — at scale 10²
    and values ≤ 10³ that is ~10⁸ observations per key; wider keys or
    values scale `decimals` down first. NULL value/ts/id rows carry
    no observation (they would silently shift the pairing otherwise).

    Output: (keys..., lag, n_pairs, sum_x, sum_y, acf) — sum_y differs
    from sum_x only by the series' k-row head/tail, a cheap audit that
    the shift really happened.
    """
    if not lags or any(int(k) < 1 for k in lags):
        raise ValueError(f"lags must be positive integers, got {lags}")
    x = _scaled(value_col, decimals)
    base = df.filter(
        F.col(value_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(*key_cols, ts_col, id_col, x.alias("_x"))
    w = (
        Window.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy(F.col(ts_col), F.col(id_col))
    )
    led = base.select(
        *key_cols,
        "_x",
        *[F.lead("_x", int(k)).over(w).alias(f"_y{k}") for k in lags],
    )
    pairs = (
        led.select(
            *key_cols,
            "_x",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(int(k)).cast("long").alias("lag"),
                            F.col(f"_y{k}").alias("_y"),
                        )
                        for k in lags
                    ]
                )
            ).alias("_p"),
        )
        .select(*key_cols, F.col("_p.lag").alias("lag"), "_x", F.col("_p._y").alias("_y"))
        .filter(F.col("_y").isNotNull())
    )
    return stats2d_exact(
        pairs,
        list(key_cols) + ["lag"],
        "_x",
        "_y",
        corr_alias="acf",
    ).select(*key_cols, "lag", "n_pairs", "sum_x", "sum_y", "acf")
