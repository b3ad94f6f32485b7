#!/usr/bin/env python3
"""Simulate the driver's verify: smoke entry(), then run every
queries() entry at the given sf dir and compare against oracle_sql()
via DuckDB — the same flow the round gate runs.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from purpleair_data_logger_spark.session import get_spark  # noqa: E402
from tests.oracle import compare  # noqa: E402


def sweep(
    sf_dir: str,
    only: set[str] | None = None,
    *,
    smoke: bool = True,
    failures: list[tuple[str, str]] | None = None,
    results: dict[str, dict] | None = None,
) -> int:
    """Run the driver's verify flow against ``sf_dir``. Importable so
    scripts/fuzz_oracle.py can re-run the identical comparison over a
    mutated copy of the testdata. ``failures`` (if given) collects
    (query, message) pairs for the caller; ``results`` (if given)
    collects every query's {pass, oracled, detail, secs} — the shape
    scripts/fuzz_oracle.py persists as FUZZ_r{N}.json."""
    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")

    if smoke:
        t0 = time.time()
        sm = entrymod.entry(spark)
        rows = sm.collect()
        print(f"[smoke] entry() -> {len(rows)} rows, schema={sm.columns} "
              f"({time.time()-t0:.1f}s)")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, msg = compare(df, oracles[name], sf_dir)
            else:
                cnt = df.count()
                ok, msg = True, f"rows-only ({cnt} rows)"
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(exc).__name__}: {exc}"
        status = "OK " if ok else "BAD"
        n_ok += ok
        n_bad += not ok
        if not ok and failures is not None:
            failures.append((name, msg))
        if results is not None:
            results[name] = {
                "pass": bool(ok),
                "oracled": name in oracles,
                "detail": msg,
                "secs": round(time.time() - t0, 2),
            }
        print(f"[{status}] {name}: {msg} ({time.time()-t0:.1f}s)", flush=True)
    print(f"passed={n_ok} failed={n_bad}")
    return 1 if n_bad else 0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    return sweep(sf_dir, only)


if __name__ == "__main__":
    raise SystemExit(main())
