#!/usr/bin/env python3
"""Per-query optimization harness (r13): time a named catalog query in
isolation with the noop sink (min-of-N, same methodology as bench.py)
and optionally dump its `.explain("formatted")` to a file.

Usage:
    python scripts/opt_bench.py q1 [q2 ...] [--sf DIR] [--runs N]
                                [--explain-dir plans/r13] [--suffix before]

Timing covers fn(spark, sf_dir) + noop write — identical to bench.py's
timed region, so numbers are directly comparable to BENCH_DETAIL.json.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from purpleair_data_logger_spark import catalog  # noqa: E402
from purpleair_data_logger_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    qs = catalog.all_queries()
    unknown = [n for n in args.queries if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("opt-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/parquet caches the same way bench.py does.
    qs["reconstruction_join"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in args.queries:
        q = qs[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        secs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            q.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(secs), "runs": secs}
        print(f"## {name}: min={min(secs)} runs={secs}", flush=True)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                q.fn(spark, args.sf).explain("formatted")
            path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
