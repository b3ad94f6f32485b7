#!/usr/bin/env python3
"""Compare a bench.py JSON line against recorded round artifacts.

Usage:
    python bench.py | tail -1 > /tmp/bench_now.json
    python scripts/bench_compare.py /tmp/bench_now.json [BENCH_rN.json ...]

With no explicit baselines, every complete BENCH_r*.json in the repo
root is loaded and each query compares against its BEST (minimum)
recorded prior time — a regression vs the best round ever is the loud
signal, not a regression vs whichever single round was chosen. Driver
artifacts wrap the JSON line inside a "tail" field; raw bench output is
accepted too (artifacts without a bench line, e.g. a crashed round, are
skipped when globbed, fatal when named explicitly). Exit code 1 if any
shared query runs slower than REGRESSION_FACTOR x its best-prior time
(or, for jitter-dominated sub-threshold baselines, more than
ABS_REGRESSION_SEC over it), listing the offenders.

Also prints the stable-subset subtotal (bench.py's r1-era rows) when
present, so round-over-round totals compare like for like.
"""

from __future__ import annotations

import glob
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

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_bench(path: str) -> tuple[dict | None, str]:
    """(bench dict or None, status string for the loaded/skipped report)."""
    with open(path) as fh:
        data = json.load(fh)
    if "queries" in data:
        return data, f"loaded ({len(data['queries'])} queries)"
    tail = data.get("tail", "")
    m = re.search(r'\{"metric".*\}', tail)
    if not m:
        return None, (
            "SKIPPED: no bench JSON line in artifact tail "
            f"({len(tail)} chars — driver truncates at 2000; per-query "
            "data for such rounds survives only in BENCH_HISTORY.jsonl)"
        )
    try:
        bench = json.loads(m.group(0))
    except json.JSONDecodeError:
        return None, (
            "SKIPPED: bench JSON line truncated mid-object by the "
            "driver's 2000-char tail"
        )
    return bench, f"loaded ({len(bench['queries'])} queries)"


def load_history(
    path: str, sf: float, exclude_run_id: str | None = None
) -> list[tuple[str, dict]]:
    """Same-SF entries from the append-only BENCH_HISTORY.jsonl — the
    durable per-run record that driver tail-truncation cannot lose.
    ``exclude_run_id`` drops the run under comparison itself (a bench
    run appends to history BEFORE this script reads it; without the
    exclusion every query would baseline against its own time at
    x1.00 and real regressions vs prior rounds would be masked)."""
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as fh:
        for i, line in enumerate(fh):
            line = line.strip()
            if not line:
                continue
            try:
                entry = json.loads(line)
            except json.JSONDecodeError:
                continue
            if entry.get("sf") != sf or "queries" not in entry:
                continue
            if exclude_run_id and entry.get("run_id") == exclude_run_id:
                continue
            out.append((f"history#{i + 1}", entry))
    return out


def best_baseline(
    sources: list[tuple[str, dict]]
) -> tuple[dict[str, float], dict[str, str]]:
    """Per-query minimum across (tag, bench) sources + which holds it."""
    best: dict[str, float] = {}
    src: dict[str, str] = {}
    for tag, bench in sources:
        for name, sec in bench["queries"].items():
            if name not in best or sec < best[name]:
                best[name] = sec
                src[name] = tag
    return best, src


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    now, _ = load_bench(sys.argv[1])
    if now is None:
        raise SystemExit(f"{sys.argv[1]}: no bench JSON found")
    explicit = len(sys.argv) > 2
    if explicit:
        paths = sys.argv[2:]
    else:
        paths = sorted(glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json")))
        paths = [p for p in paths if os.path.abspath(p) != os.path.abspath(sys.argv[1])]
    sources: list[tuple[str, dict]] = []
    print("baseline artifacts:")
    for p in paths:
        bench, status = load_bench(p)
        print(f"  {os.path.basename(p):24s} {status}")
        if bench is None:
            if explicit:
                raise SystemExit(f"{p}: no bench JSON found")
            continue
        sources.append((os.path.basename(p), bench))
    if not explicit:
        hist = load_history(
            os.path.join(REPO_ROOT, "BENCH_HISTORY.jsonl"),
            now.get("sf"),
            exclude_run_id=now.get("run_id"),
        )
        if hist:
            print(f"  BENCH_HISTORY.jsonl      loaded ({len(hist)} same-sf runs)")
        sources.extend(hist)
    print()
    base, src = best_baseline(sources)
    if not base:
        raise SystemExit(f"no usable baselines among {paths}")
    evidence = set(now.get("evidence_legs", []))
    shared = sorted((set(now["queries"]) & set(base)) - evidence)
    regressions = []
    for name in shared:
        b, n = base[name], now["queries"][name]
        if b >= MIN_BASELINE_SEC:
            if n > REGRESSION_FACTOR * b:
                regressions.append((name, b, n))
        elif n > b + ABS_REGRESSION_SEC:
            regressions.append((name, b, n))
        print(
            f"{name:38s} best {b:7.3f} ({src[name]:>14s})  "
            f"now {n:7.3f}  x{n / b if b else 0:5.2f}"
        )
    new = sorted(set(now["queries"]) - set(base) - evidence)
    print(f"\nshared={len(shared)} new={len(new)} evidence={len(evidence)}")
    if "value" in now:
        print(
            f"headline (value): {now['value']:.3f}s — evidence foils "
            f"EXCLUDED ({now.get('evidence_sec', 0):.3f}s timed "
            "separately); grows with catalog size, compare per-query "
            "or via the stable subset"
        )
    if "stable_subset_sec" in now:
        print(f"stable-subset subtotal: {now['stable_subset_sec']:.3f}s "
              f"(r1-era rows, comparable round-over-round)")
    if regressions:
        print(f"\nREGRESSIONS (> {REGRESSION_FACTOR}x best prior, or "
              f"+{ABS_REGRESSION_SEC}s on sub-{MIN_BASELINE_SEC}s rows):")
        for name, b, n in regressions:
            print(f"  {name}: {b:.3f} -> {n:.3f}")
        raise SystemExit(1)
    print("no regressions")


if __name__ == "__main__":
    main()
