"""Single-pass data-quality constraint checking — the write-gate a
production lake runs before publishing a batch (the Deequ/expectations
pattern, Spark-first).

The reference trusts its API sanitizer (`PurpleAirAPI.py:348-363`
null-fill) and never validates at the sink; at 100 TB a bad batch that
lands is a reprocessing incident, so the lake needs declarative
constraints checked BEFORE the write commits. Design rules:

* **One scan.** Every constraint compiles to an aggregate expression;
  the whole report is ONE map-side-combined aggregate pass producing a
  single row, exploded into one row per constraint. N constraints
  never cost N scans.
* **Exact and engine-portable.** Violation counts are plain integer
  aggregates (no sampling, no sketches), so the report is oracle-able
  and a pass/fail verdict is deterministic.
* **Composable with the sinks.** `check_or_raise` gates a write: the
  report computes on the batch, and any failed constraint raises with
  the full report rendered — the batch never lands.

Constraints (each a (name, Column-violations, Column-denominator)
triple internally):

- ``not_null(col)`` — rows where col IS NULL.
- ``unique(cols)`` — rows beyond the first per duplicate key group
  (exact: n − countDistinct over the key tuple; NULL-keyed rows are
  counted by their distinct tuple like SQL GROUP BY).
- ``in_range(col, lo, hi)`` — non-null rows outside [lo, hi].
- ``accepted_values(col, values)`` — non-null rows outside the set.
- ``matches(col, regexp)`` — non-null rows not fully matching.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    violations: Column  # aggregate expression counting violating rows


def not_null(col: str) -> Constraint:
    return Constraint(
        f"not_null({col})",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def unique(cols: Sequence[str]) -> Constraint:
    # The key is wrapped in a struct, so a NULL field does NOT drop the
    # tuple from countDistinct (a struct with NULL fields is itself
    # non-null): two NULL-keyed rows are one distinct key and one
    # violation, exactly Deequ's uniqueness-with-NULL semantics. An
    # oracle replaying this must wrap the key the same way —
    # `count(DISTINCT struct_pack(k := col))` in DuckDB — since a bare
    # `count(DISTINCT col)` excludes NULLs and undercounts distinct
    # keys by one whenever any NULL key exists (round-4 advisory).
    key = F.struct(*[F.col(c) for c in cols])
    return Constraint(
        f"unique({','.join(cols)})",
        F.count(F.lit(1)) - F.countDistinct(key),
    )


def in_range(col: str, lo: float, hi: float) -> Constraint:
    c = F.col(col)
    return Constraint(
        f"in_range({col},{lo},{hi})",
        F.sum(
            F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1).otherwise(0)
        ),
    )


def accepted_values(col: str, values: Sequence[str]) -> Constraint:
    c = F.col(col)
    return Constraint(
        f"accepted_values({col})",
        F.sum(
            F.when(c.isNotNull() & ~c.isin(list(values)), 1).otherwise(0)
        ),
    )


def matches(col: str, pattern: str) -> Constraint:
    c = F.col(col)
    return Constraint(
        f"matches({col})",
        F.sum(
            F.when(c.isNotNull() & ~c.rlike(pattern), 1).otherwise(0)
        ),
    )


def quality_report(df: DataFrame, constraints: Sequence[Constraint]) -> DataFrame:
    """One row per constraint: (constraint, n_rows, violations,
    passed). ONE aggregate pass regardless of constraint count — the
    agg produces a single row whose columns explode into the report.
    """
    if not constraints:
        raise ValueError("at least one constraint required")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(constraints):
        aggs.append(c.violations.cast("long").alias(f"_v{i}"))
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("constraint"),
                F.col(f"_v{i}").alias("violations"),
            )
            for i, c in enumerate(constraints)
        ]
    )
    return row.select(
        F.explode(entries).alias("_e"), F.col("_n").alias("n_rows")
    ).select(
        F.col("_e.constraint").alias("constraint"),
        "n_rows",
        F.col("_e.violations").alias("violations"),
        (F.col("_e.violations") == 0).alias("passed"),
    )


class QualityError(RuntimeError):
    pass


def check_or_raise(df: DataFrame, constraints: Sequence[Constraint]) -> None:
    """Gate a write: compute the report and raise `QualityError`
    listing every failed constraint if any row violates — the batch
    must not land. One action, one scan."""
    report = quality_report(df, constraints).collect()
    failed = [r for r in report if not r["passed"]]
    if failed:
        lines = ", ".join(
            f"{r['constraint']}: {r['violations']}/{r['n_rows']}"
            for r in failed
        )
        raise QualityError(f"quality gate failed — {lines}")
