"""Stream-static enrichment join: attach dimension attributes to a
stream without any streaming state.

The reference's read path joins sensor readings to the station
directory at query time (Grafana panels over
`PurpleAirPSQLQueryStatements.py` views); the streaming-native version
joins each micro-batch against a static dimension as it arrives, so
sinks hold enriched rows and no dashboard-side join is needed.

Spark executes a stream-static equi-join statelessly: the static side
is planned per micro-batch (and broadcast when small — pinned in
tests), the stream side never buffers. This is the correct shape for
dimension enrichment at any scale; only stream-stream joins need
watermarked state, and nothing here requires one. The static frame is
re-read per trigger, so slowly-changing dimensions pick up updates on
the next batch when the source supports refresh (parquet re-read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    *,
    dim_cols: list[str] | None = None,
    broadcast_dim: bool = True,
    how: str = "left",
) -> DataFrame:
    """Join a streaming frame against a static dimension.

    ``dim_cols``: dimension columns to carry (defaults to all non-key
    columns). ``broadcast_dim`` forces a broadcast hash join — the
    right plan whenever the dimension fits an executor (directories,
    station metadata); disable for huge dims and let AQE pick.
    ``how`` is left/inner; left keeps stream rows with no dim match
    (nulls), the usual enrichment semantic.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"unsupported join type for enrichment: {how!r}")
    keep = dim_cols if dim_cols is not None else [
        c for c in dim.columns if c not in on
    ]
    d = dim.select(*on, *keep)
    if broadcast_dim:
        d = F.broadcast(d)
    return stream.join(d, on=on, how=how)
