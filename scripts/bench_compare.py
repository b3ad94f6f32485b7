#!/usr/bin/env python3
"""Compare a bench.py JSON line against a recorded round artifact.

Usage:
    python bench.py | tail -1 > /tmp/bench_now.json
    python scripts/bench_compare.py /tmp/bench_now.json [BENCH_rN.json]

The baseline defaults to BENCH_r01.json (the first complete recorded
run). Driver artifacts wrap the JSON line inside a "tail" field; raw
bench output is accepted too. Exit code 1 if any shared query runs
slower than REGRESSION_FACTOR x its baseline time (the round-verdict
criterion), listing the offenders.
"""

from __future__ import annotations

import json
import os
import re
import sys

REGRESSION_FACTOR = 2.0
#: queries under this baseline time are jitter-dominated at local
#: scale; a factor regression there is noise, an absolute check isn't.
MIN_BASELINE_SEC = 0.3
#: absolute guard for sub-threshold baselines: a 0.1 s query drifting
#: to 0.15 s is noise, one jumping past base + this many seconds isn't.
ABS_REGRESSION_SEC = 1.0


def load_bench(path: str) -> dict:
    with open(path) as fh:
        data = json.load(fh)
    if "queries" in data:
        return data
    m = re.search(r'\{"metric".*\}', data.get("tail", ""))
    if not m:
        raise SystemExit(f"{path}: no bench JSON found (rc={data.get('rc')})")
    return json.loads(m.group(0))


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    now = load_bench(sys.argv[1])
    base_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_r01.json",
    )
    base = load_bench(base_path)
    evidence = set(now.get("evidence_legs", []))
    shared = sorted(
        (set(now["queries"]) & set(base["queries"])) - evidence
    )
    regressions = []
    for name in shared:
        b, n = base["queries"][name], now["queries"][name]
        if b >= MIN_BASELINE_SEC:
            if n > REGRESSION_FACTOR * b:
                regressions.append((name, b, n))
        elif n > b + ABS_REGRESSION_SEC:
            regressions.append((name, b, n))
        print(f"{name:38s} base {b:7.3f}  now {n:7.3f}  x{n / b if b else 0:5.2f}")
    new = sorted(set(now["queries"]) - set(base["queries"]) - evidence)
    print(f"\nshared={len(shared)} new={len(new)} evidence={len(evidence)}")
    if regressions:
        print(f"\nREGRESSIONS (> {REGRESSION_FACTOR}x baseline):")
        for name, b, n in regressions:
            print(f"  {name}: {b:.3f} -> {n:.3f}")
        raise SystemExit(1)
    print("no regressions")


if __name__ == "__main__":
    main()
