"""Sessionization: gap-based session windows via gaps-and-islands.

The reference has no session concept (SURVEY.md §2.9 R4: none); a
training-data/event pipeline needs it (user activity bounding,
document-interaction grouping). Two formulations provided:

* `sessionize` — the portable gaps-and-islands window algebra
  (lag → gap flag → cumulative sum = session id), identical semantics
  in any SQL engine, used for the oracled catalog query. One shuffle
  on the key, one sort, two window passes over the same spec.
* Spark also has native `session_window` for streaming aggregation —
  `streaming/continuous_aggregate.py` covers the windowed-agg path;
  this module is the batch/SQL-portable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_seconds: int,
) -> DataFrame:
    """Assign a session id per key: a new session starts when the gap
    from the previous event reaches ``gap_seconds``.

    Boundary semantics match Spark's native ``session_window`` (an
    event exactly ``gap_seconds`` after the latest one falls OUTSIDE
    the session: sessions are half-open ``[start, last+gap)``), so the
    batch and streaming formulations agree row-for-row —
    `streaming.sessionize` pins that equality in tests.

    Output: input columns + ``session_id`` (1-based per key, ordered by
    time). Deterministic for unique (key, ts) pairs.

    NULL contract (fuzz-found, r6): an event without a timestamp
    cannot be placed in any session and is dropped — leaving it in
    would make the numbering engine-dependent (Spark windows sort
    NULLS FIRST, DuckDB NULLS LAST, shifting every lag). NULL keys
    form their own single group, identically in both engines.
    """
    df = df.filter(F.col(ts_col).isNotNull())
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(ts_us)
    prev_ts = F.lag(ts_us).over(w)
    new_session = F.when(
        prev_ts.isNull() | ((ts_us - prev_ts) >= gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_seconds: int,
) -> DataFrame:
    """Per-session aggregates: bounds, duration, event count."""
    s = sessionize(df, key_col, ts_col, gap_seconds=gap_seconds)
    return s.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        )
        .cast("long")
        .alias("duration_us"),
    )
