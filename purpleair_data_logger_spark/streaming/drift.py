"""Streaming distribution-drift monitoring: the incremental mirror of
`operators/aggregations.py::distribution_drift`.

The batch operator's per-bin window counts are CASE-gated SUMS — a
commutative monoid, the `streaming/countmin.py` situation — so the
streaming mirror is the same binning projection feeding Spark's
NATIVE incremental aggregation: state is one (n_ref, n_cur) pair per
occupied bin (bounded by value range / bin width, a constant),
updated per micro-batch with map-side partials, exact under any
arrival order or batch split. No watermark closes a bin — a drift
monitor never stops watching — so the stream emits in update/complete
mode and readers take the newest cell values.

The REPORT (shares, per-bin drift, TVD) is derived arithmetic over
the bins-sized snapshot; `drift_report_from_bins` computes it
batch-side from any snapshot with the exact integer rules the batch
operator uses, so streamed reports are bit-identical to running the
batch operator over everything ingested (pinned in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drift_bins_stream(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    split_ts: str,
    bin_width: float,
) -> DataFrame:
    """The streaming bin-count plan: (bin, n_ref, n_cur) maintained
    incrementally — identical binning and window-split arithmetic to
    the batch operator, so cells are interchangeable."""
    split = F.lit(split_ts).cast("timestamp")
    is_cur = (F.col(ts_col) >= split).cast("long")
    return (
        stream.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.floor(F.col(value_col) / F.lit(bin_width))
            .cast("long")
            .alias("bin"),
            is_cur.alias("_c"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.lit(1) - F.col("_c")).alias("n_ref"),
            F.sum("_c").alias("n_cur"),
        )
    )


def drift_report_from_bins(bins: DataFrame, *, bin_width: float) -> DataFrame:
    """The batch report arithmetic over any (bin, n_ref, n_cur)
    snapshot — floored-basis-point shares, per-bin drift, TVD — with
    the same global-windows-over-aggregate shape as
    `distribution_drift` (the input is bins-sized by construction)."""
    w_all = Window.partitionBy()
    share = lambda n, t: F.when(
        F.col(t) > 0, F.expr(f"({n} * 10000) DIV {t}")
    ).otherwise(F.lit(0).cast("long"))
    per_bin = (
        bins.withColumn("_t_ref", F.sum("n_ref").over(w_all))
        .withColumn("_t_cur", F.sum("n_cur").over(w_all))
        .select(
            "bin",
            (F.col("bin").cast("double") * F.lit(bin_width)).alias("bin_lo"),
            "n_ref",
            "n_cur",
            share("n_ref", "_t_ref").alias("share_ref_bp"),
            share("n_cur", "_t_cur").alias("share_cur_bp"),
        )
        .withColumn(
            "drift_bp", F.abs(F.col("share_cur_bp") - F.col("share_ref_bp"))
        )
    )
    return per_bin.withColumn(
        "tvd_bp", F.expr("sum(drift_bp) OVER () DIV 2")
    ).select(
        "bin", "bin_lo", "n_ref", "n_cur",
        "share_ref_bp", "share_cur_bp", "drift_bp", "tvd_bp",
    )
