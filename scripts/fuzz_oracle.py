#!/usr/bin/env python3
"""NULL/duplicate-injection fuzz sweep (VERDICT r5 #2).

Three of the five round-5 advisories were the same latent class:
operators correct on the clean driver testdata but divergent from
their DuckDB oracles once a NULL or a duplicate key appears (NULL
group keys, NULL window ranks, NULL tiebreakers). This script makes
that class testable wholesale instead of letting the judge find one
instance per round:

1. copy the given sf dir into a mutated twin (deterministic, seeded):
   * events — NULLs injected into value / ts / user_id / event_type /
     props / event_id; duplicated (user_id, ts) pairs under fresh
     event_ids; exact full-row duplicates (PK violations);
   * documents — NULLs in text / lang / source; empty-string text;
     exact duplicate doc_id rows;
   * embeddings — exact duplicate vec_id rows (vector NULLs are out
     of contract: every similarity operator documents non-null
     vectors, and the ANN float tie-break under NULL scores is not
     cross-engine comparable);
2. re-run the exact driver comparison (scripts/driver_sim.sweep) on
   the twin: every oracled query runs on Spark AND DuckDB over the
   SAME mutated parquet, so any mismatch is a real engine-semantics
   divergence (NULL grouping, NULL ordering in windows, NULL
   arithmetic), not a data artifact.

Divergences are fixed operator+oracle pairwise under the repo's NULL
contract ("a NULL carries no observation — filter it in BOTH
engines"); the sweep is then kept green by
tests/test_fuzz_contract.py, which fuzzes a small slice per run.

A FULL sweep (no query filter) also writes a committed per-query
artifact ``FUZZ_r{N}.json`` at the repo root (VERDICT r6 #7 — fuzz
regressions as visible as gate regressions), where N is the upcoming
round inferred from the newest CORRECTNESS_r*.json; ``--out PATH``
overrides, ``--no-artifact`` suppresses.

Usage:
    python scripts/fuzz_oracle.py [sf_dir] [query ...]
    python scripts/fuzz_oracle.py --keep ...   # leave the twin on disk
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 20260814

#: fraction of rows whose column is nulled, per (table, column)
NULL_RATES = {
    ("events", "value"): 0.02,
    ("events", "ts"): 0.005,
    ("events", "user_id"): 0.01,
    ("events", "event_type"): 0.01,
    ("events", "props"): 0.01,
    ("events", "event_id"): 0.003,
    ("documents", "text"): 0.01,
    ("documents", "lang"): 0.01,
    ("documents", "source"): 0.01,
    # r8: the TPC-H fact/dim tables joined the fuzz surface once the
    # order/lineitem query family grew past ten members — their NULL
    # contracts were documented filters but never executable. Rates
    # stay low: the spec declares these columns NOT NULL, so the twin
    # models ingestion damage, not normal data.
    ("orders", "o_custkey"): 0.01,
    ("orders", "o_orderdate"): 0.005,
    ("orders", "o_orderpriority"): 0.01,
    ("lineitem", "l_partkey"): 0.01,
    ("lineitem", "l_suppkey"): 0.01,
    ("lineitem", "l_shipdate"): 0.005,
    ("lineitem", "l_quantity"): 0.005,
    ("lineitem", "l_extendedprice"): 0.005,
    ("lineitem", "l_discount"): 0.005,
    ("lineitem", "l_returnflag"): 0.005,
    ("customer", "c_nationkey"): 0.01,
    # r10: close the "latent only because the fuzzer leaves X
    # unmutated" class wholesale (ADVICE r9 flagged supplier; the r10
    # sf0.01 twin found o_totalprice's sibling the same way). Every
    # remaining fact/dim measure, key, and group/sort attribute the
    # catalog touches now mutates; region/nation stay verbatim (tiny
    # enumerated dims — a NULL nation name has no documented contract
    # to test and every query reaches them through broadcast joins
    # that drop NULL keys identically in both engines).
    ("orders", "o_totalprice"): 0.005,
    ("orders", "o_orderstatus"): 0.005,
    ("orders", "o_orderkey"): 0.003,
    ("lineitem", "l_orderkey"): 0.003,
    ("lineitem", "l_tax"): 0.005,
    ("lineitem", "l_linestatus"): 0.005,
    ("customer", "c_acctbal"): 0.005,
    ("customer", "c_mktsegment"): 0.01,
    ("customer", "c_name"): 0.005,
    ("supplier", "s_acctbal"): 0.01,
    ("supplier", "s_nationkey"): 0.01,
    ("supplier", "s_name"): 0.005,
    ("part", "p_brand"): 0.01,
    ("part", "p_size"): 0.01,
    ("part", "p_type"): 0.01,
    ("part", "p_name"): 0.005,
    ("part", "p_retailprice"): 0.005,
}
#: fraction of rows re-emitted as exact duplicates (PK violations)
DUP_EXACT_RATE = {
    "events": 0.005,
    "documents": 0.01,
    "embeddings": 0.01,
    "orders": 0.005,
    "lineitem": 0.005,
    "customer": 0.005,
    "supplier": 0.01,
    "part": 0.01,
}
#: events only: fraction of rows re-emitted with the SAME (user_id,
#: ts) but a fresh event_id and a different value — the duplicate-key
#: class that breaks "one reading per key per timestamp" assumptions
DUP_KEYPAIR_RATE = 0.01
#: documents only: fraction of rows whose text becomes "" (not NULL)
EMPTY_TEXT_RATE = 0.005


def _mask(rng: np.random.Generator, n: int, rate: float) -> np.ndarray:
    return rng.random(n) < rate


def _null_out(table: pa.Table, col: str, mask: np.ndarray) -> pa.Table:
    idx = table.schema.get_field_index(col)
    arr = table.column(idx).combine_chunks()
    keep = pa.array(~mask)
    nulled = pc.if_else(keep, arr, pa.nulls(len(arr), arr.type))
    return table.set_column(idx, table.schema.field(idx), nulled)


def mutate_events(table: pa.Table, rng: np.random.Generator) -> pa.Table:
    n = table.num_rows
    for (t, col), rate in NULL_RATES.items():
        if t == "events":
            table = _null_out(table, col, _mask(rng, n, rate))
    # duplicate (user_id, ts) under fresh event_ids, perturbed value
    pick = np.flatnonzero(_mask(rng, n, DUP_KEYPAIR_RATE))
    if len(pick):
        dup = table.take(pa.array(pick))
        ev = table.column("event_id").combine_chunks()
        max_id = pc.max(ev).as_py() or 0
        new_ids = pa.array(
            np.arange(max_id + 1, max_id + 1 + len(pick), dtype=np.int64)
        )
        dup = dup.set_column(
            dup.schema.get_field_index("event_id"),
            dup.schema.field("event_id"),
            new_ids,
        )
        vi = dup.schema.get_field_index("value")
        val = dup.column(vi).combine_chunks()
        dup = dup.set_column(
            vi, dup.schema.field(vi), pc.add(val, pa.scalar(0.25, val.type))
        )
        table = pa.concat_tables([table, dup])
    # exact full-row duplicates (PK violations)
    pick = np.flatnonzero(_mask(rng, n, DUP_EXACT_RATE["events"]))
    if len(pick):
        table = pa.concat_tables([table, table.slice(0, n).take(pa.array(pick))])
    return table


def mutate_documents(table: pa.Table, rng: np.random.Generator) -> pa.Table:
    n = table.num_rows
    for (t, col), rate in NULL_RATES.items():
        if t == "documents":
            table = _null_out(table, col, _mask(rng, n, rate))
    ti = table.schema.get_field_index("text")
    txt = table.column(ti).combine_chunks()
    empty = pa.array(_mask(rng, n, EMPTY_TEXT_RATE))
    txt = pc.if_else(
        pc.and_kleene(empty, pc.is_valid(txt)), pa.scalar("", txt.type), txt
    )
    table = table.set_column(ti, table.schema.field(ti), txt)
    pick = np.flatnonzero(_mask(rng, n, DUP_EXACT_RATE["documents"]))
    if len(pick):
        table = pa.concat_tables([table, table.slice(0, n).take(pa.array(pick))])
    return table


def mutate_embeddings(table: pa.Table, rng: np.random.Generator) -> pa.Table:
    n = table.num_rows
    pick = np.flatnonzero(_mask(rng, n, DUP_EXACT_RATE["embeddings"]))
    if len(pick):
        table = pa.concat_tables([table, table.take(pa.array(pick))])
    return table


def _mutate_generic(name: str):
    """NULL injection per NULL_RATES + exact full-row duplicates —
    the shared shape for the TPC-H tables (orders/lineitem/customer),
    which need no table-specific key tricks."""

    def mutate(table: pa.Table, rng: np.random.Generator) -> pa.Table:
        n = table.num_rows
        for (t, col), rate in NULL_RATES.items():
            if t == name:
                table = _null_out(table, col, _mask(rng, n, rate))
        pick = np.flatnonzero(_mask(rng, n, DUP_EXACT_RATE[name]))
        if len(pick):
            table = pa.concat_tables(
                [table, table.slice(0, n).take(pa.array(pick))]
            )
        return table

    return mutate


MUTATORS = {
    "events": mutate_events,
    "documents": mutate_documents,
    "embeddings": mutate_embeddings,
    "orders": _mutate_generic("orders"),
    "lineitem": _mutate_generic("lineitem"),
    "customer": _mutate_generic("customer"),
    "supplier": _mutate_generic("supplier"),
    "part": _mutate_generic("part"),
}


def build_mutated_dir(src_dir: str, dst_dir: str, seed: int = SEED) -> None:
    """Write the mutated twin of ``src_dir`` into ``dst_dir``. Only
    region/nation are copied verbatim (tiny enumerated dims with no
    NULL contract of their own); everything else — the event/document/
    embedding north-star tables since r5, orders/lineitem/customer
    since r8, supplier/part since r10 — mutates, making every
    documented NULL filter in the catalog executable."""
    os.makedirs(dst_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for fname in sorted(os.listdir(src_dir)):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(src_dir, fname)
        dst = os.path.join(dst_dir, fname)
        name = fname[: -len(".parquet")]
        if name in MUTATORS:
            table = pq.read_table(src)
            mutated = MUTATORS[name](table, rng)
            pq.write_table(mutated, dst)
        else:
            shutil.copyfile(src, dst)


def _next_round(repo_root: str) -> int:
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"r(\d+)", os.path.basename(p)))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    # argparse, not hand-rolled sys.argv surgery (ADVICE r7: a
    # trailing `--out` crashed with IndexError, and the value was
    # spliced out of the positionals by STRING EQUALITY, silently
    # dropping any query filter that happened to equal the out path).
    import argparse

    ap = argparse.ArgumentParser(
        description="NULL/duplicate-injection fuzz sweep over a "
        "mutated twin of an sf dir"
    )
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("queries", nargs="*", help="restrict to these queries")
    ap.add_argument("--keep", action="store_true",
                    help="keep the mutated twin dir")
    ap.add_argument("--no-artifact", action="store_true",
                    help="skip writing FUZZ_r{N}.json")
    ap.add_argument("--out", default=None, metavar="PATH",
                    help="artifact path (default FUZZ_r{next}.json)")
    ns = ap.parse_args()
    keep = ns.keep
    out_path = ns.out
    src = ns.sf_dir
    only = set(ns.queries)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = tempfile.mkdtemp(prefix="fuzz_sf_")
    try:
        build_mutated_dir(src, tmp)
        print(f"[fuzz] mutated twin of {src} at {tmp}")
        from scripts.driver_sim import sweep

        failures: list[tuple[str, str]] = []
        results: dict[str, dict] = {}
        rc = sweep(tmp, only, smoke=False, failures=failures, results=results)
        if failures:
            print("\n[fuzz] divergent queries:")
            for name, msg in failures:
                print(f"  {name}: {msg}")
        if not only and not ns.no_artifact:
            import json
            import time

            if out_path is None:
                out_path = os.path.join(
                    repo_root, f"FUZZ_r{_next_round(repo_root):02d}.json"
                )
            artifact = {
                "_meta": {
                    "source_sf_dir": src,
                    "seed": SEED,
                    "passed": sum(r["pass"] for r in results.values()),
                    "failed": sum(not r["pass"] for r in results.values()),
                    "wall_clock_unix": round(time.time(), 1),
                },
                "queries": results,
            }
            with open(out_path, "w") as fh:
                json.dump(artifact, fh, indent=1, sort_keys=True)
            print(f"[fuzz] artifact written to {out_path}")
        return rc
    finally:
        if keep:
            print(f"[fuzz] twin kept at {tmp}")
        else:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
