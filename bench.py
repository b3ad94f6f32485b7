#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no
driver-side collect) and timed individually.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from purpleair_data_logger_spark import catalog  # noqa: E402
from purpleair_data_logger_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "reconstruction_join",
    "hourly_continuous_aggregate",
    "dashboard_bucketed_max",
    "tumbling_avg_10min",
    "rolling_avg_trailing_1h",
    "rolling_pseudo_averages",
    "vertical_split_rejoin",
    "historic_range_downsample",
    "semi_join_show_only",
    "pk_dedup",
    "topk_orders",
    "dedup_exact_docs",
    "text_quality",
    "lang_id",
    "jaccard_neardup_blocked",
    "minhash_lsh_candidates",
    "knn_cosine_bruteforce",
    "knn_lsh_bucketed",
    "embedding_neardup_cosine",
    "multimodal_metadata",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("purpleair-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    queries = catalog.all_queries()
    # Warm up the JVM/parquet footer caches with the flagship query.
    queries["reconstruction_join"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        q = queries[name]
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline-queries wall time (noop sink, local)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
