"""Scalar function surface (SURVEY.md §2.7 X1-X7).

Thin, named wrappers over built-in expressions so the reference's
scalar vocabulary has first-class, documented equivalents. All stay in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def concat_name_index(name: Column | str, index: Column | str, *, sep: str = ", ") -> Column:
    """X1: ``CONCAT(name, ', ', sensor_index)`` (Grafana templating)."""
    n = F.col(name) if isinstance(name, str) else name
    i = F.col(index) if isinstance(index, str) else index
    return F.concat(n, F.lit(sep), i.cast("string"))


def split_part(s: Column | str, *, sep: str = ", ", part: int = 2) -> Column:
    """X2: ``string_to_array(s, ', ')[part]`` — 1-based, like PSQL."""
    c = F.col(s) if isinstance(s, str) else s
    return F.element_at(F.split(c, sep), part)


def epoch_to_timestamp(epoch: Column | str) -> Column:
    """X5/T5: epoch seconds → UTC timestamp (NULL passes through)."""
    c = F.col(epoch) if isinstance(epoch, str) else epoch
    return F.timestamp_seconds(c)


def timestamp_to_epoch(ts: Column | str) -> Column:
    """X5 inverse: timestamp → epoch seconds (floor)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_timestamp(c)


def time_bucket_expr(ts: Column | str, seconds: int) -> Column:
    """X4: ``time_bucket('N seconds', ts)`` — epoch-aligned bucket start."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(c) / seconds).cast("long") * seconds
    )


def json_get(col: Column | str, path: str) -> Column:
    """X7: JSON field extraction (``json.loads`` equivalent per field)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)
