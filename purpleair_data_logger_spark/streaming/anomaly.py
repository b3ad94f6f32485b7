"""Streaming anomaly flags: per-key EWMA mean + EWMA variance state
with a pre-update z-test — the streaming mirror of the batch
`operators/aggregations.py::rolling_zscore_flags`.

A trailing-window z-score needs the window's raw readings; streaming
state must be O(1) per key, so the streaming formulation swaps the
sliding window for exponentially-weighted moments (the standard
monitoring trade — an EWMA is a soft window with horizon ≈ 1/α):

    mean_t = mean_{t−1} + α·d,          d = x_t − mean_{t−1}
    var_t  = (1−α)·(var_{t−1} + α·d²)       (West 1979 EWMV)

Each reading is judged against the state BEFORE it updates it
(``d > z·sqrt(var_{t−1})``), so a spike cannot inflate its own
baseline, and flags only fire once ``min_samples`` readings have
seeded the moments. Recursive and order-dependent ⇒ inexpressible as
a built-in streaming aggregate ⇒ the `applyInPandasWithState` case,
exactly like `ewma.py` (same state-store partitioning, same
watermark-bounded lifecycle, numpy inner loop per Arrow chunk).

Unlike the batch operator's exact integer test, the streaming flag is
float (state is a running float moment by construction); parity with
a sequential reference implementation is pinned in pytest instead of
a SQL oracle — the honest check for a recursive operator.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("mean", T.DoubleType()),
        T.StructField("var", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def ewmv_flags_pandas(
    values: np.ndarray,
    alpha: float,
    z: float,
    min_samples: int,
    seed: tuple[float, float, int] | None,
) -> tuple[np.ndarray, tuple[float, float, int]]:
    """Sequential EWMA-mean/variance pass returning per-row flags and
    the final state. Separate so tests replay the exact arithmetic."""
    flags = np.zeros(len(values), dtype=bool)
    if seed is None:
        mean, var, n = 0.0, 0.0, 0
    else:
        mean, var, n = seed
    for i, x in enumerate(values):
        if n == 0:
            mean, var, n = float(x), 0.0, 1
            continue
        d = float(x) - mean
        flags[i] = n >= min_samples and d > z * np.sqrt(var)
        mean += alpha * d
        var = (1.0 - alpha) * (var + alpha * d * d)
        n += 1
    return flags, (mean, var, n)


def anomaly_stateful_func(alpha: float, z: float, min_samples: int):
    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values([pdf.columns[1]], kind="stable")  # event time
        seed = tuple(state.get) if state.exists else None
        vals = pdf.iloc[:, 2].to_numpy(dtype=np.float64)
        flags, (mean, var, n) = ewmv_flags_pandas(
            vals, alpha, z, min_samples, seed
        )
        state.update((float(mean), float(var), int(n)))
        out = pdf.iloc[:, :3].copy()
        out["is_spike"] = flags
        yield out

    return update


def spike_flags_by_key(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    alpha: float = 0.1,
    z: float = 3.0,
    min_samples: int = 5,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key streaming spike flags: one output row per event with
    ``is_spike``; O(1) state (mean, var, n) per active key."""
    src = stream.select(
        key_col,
        F.col(ts_col).cast("timestamp").alias(ts_col),
        F.col(value_col).cast("double").alias("value"),
    ).withWatermark(ts_col, watermark)
    out_schema = T.StructType(
        [
            src.schema[key_col],
            src.schema[ts_col],
            T.StructField("value", T.DoubleType()),
            T.StructField("is_spike", T.BooleanType()),
        ]
    )
    return src.groupBy(key_col).applyInPandasWithState(
        anomaly_stateful_func(alpha, z, min_samples),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
