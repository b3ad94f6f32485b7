"""Streaming distribution-drift monitoring: the incremental mirror of
`operators/aggregations.py::distribution_drift`.

The batch operator's per-bin window counts are CASE-gated SUMS — a
commutative monoid, the `streaming/countmin.py` situation — so the
streaming mirror IS the batch binning half (`aggregations.drift_bins`)
applied to a streaming DataFrame: Spark's native incremental
aggregation keeps one (n_ref, n_cur) pair per occupied bin (bounded by
value range / bin width, a constant), updated per micro-batch with
map-side partials, exact under any arrival order or batch split. No
watermark closes a bin — a drift monitor never stops watching — so the
stream emits in update/complete mode and readers take the newest cell
values.

The REPORT (shares, per-bin drift, TVD) is the batch operator's other
half (`aggregations.drift_report_from_bins`), run batch-side over the
bins-sized snapshot. Both halves are the SAME functions the batch
operator composes, so streamed reports are bit-identical to running
batch `distribution_drift` over everything ingested BY CONSTRUCTION
(still pinned end-to-end in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from purpleair_data_logger_spark.operators.aggregations import (
    drift_bins,
    drift_report_from_bins,  # noqa: F401  (re-export: snapshot readers)
)


def drift_bins_stream(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    split_ts: str,
    bin_width: float,
) -> DataFrame:
    """The streaming bin-count plan: (bin, n_ref, n_cur) maintained
    incrementally — literally the batch binning applied to the stream,
    so cells are interchangeable between the two by construction."""
    return drift_bins(
        stream, ts_col, value_col, split_ts=split_ts, bin_width=bin_width
    )
