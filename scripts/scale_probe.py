#!/usr/bin/env python3
"""Empirical scale probe (VERDICT r12 #2): measure how the most
expensive catalog rows actually scale, instead of arguing from plan
shape alone.

`/root/testdata` stops at sf0.1 (~17 MB), so the probe SELF-GENERATES
x3 and x10 datasets by tiling the sf0.1 parquet with remapped keys
into /tmp (the testdata dir is read-only):

* every fact-table key moves to a disjoint space per tile
  (``key + tile * 10^9``) — horizontal scaling: more users / docs /
  orders, per-key history constant, which is the dominant growth axis
  of the 100 TB target;
* ``documents.text`` is char-rotated per tile (a bijection on a-z),
  so each tile keeps the original's EXACT internal near-dup structure
  while cross-tile texts share no shingles — without this, tiling
  would plant len(tiles) exact clones of every doc and the near-dup
  workload would blow up quadratically BY CONSTRUCTION, measuring the
  fixture instead of the operator;
* ``embeddings.embedding`` gets a tiny per-tile first-component
  perturbation (breaks exact cross-tile ties; distances otherwise
  preserved);
* dimension tables (region/nation) copy unchanged — tiled fact rows
  keep valid FKs into them, exactly how a bigger corpus shares dims.

The runner times each probed query with the bench.py protocol (noop
sink, min over draws, one JVM) at every scale and fits the log-log
slope: T ~ size^exponent. Output: one JSON line + SCALE_PROBE.md rows
(written by --write-md).

The blocked foil `jaccard_neardup_blocked` is probed only to x3 and
expected SUPER-linear (its block sizes grow with the corpus; the LSH
replacement in the same catalog is the scale path) — the measured
contrast is the point.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
PROBE_ROOT = "/tmp/spark_graft_probe"
OFF = 1_000_000_000

#: (query name, scales to probe, timing draws per scale). Chosen as
#: the most expensive BENCH_r12 rows (by median) plus the LSH/ANN
#: scale-path rungs; evidence foils excluded except the blocked
#: baseline, which is probed shallowly for the superlinearity
#: contrast.
PROBE = [
    ("corpus_overlap_minhash", ("x1", "x3", "x10"), 2),
    ("corpus_build_final", ("x1", "x3", "x10"), 2),
    ("ann_index_append", ("x1", "x3", "x10"), 2),
    ("containment_neardups", ("x1", "x3", "x10"), 2),
    ("asap_smooth_events", ("x1", "x3", "x10"), 2),
    ("bfs_hops_copurchase", ("x1", "x3", "x10"), 2),
    ("countmin_token_counts", ("x1", "x3", "x10"), 2),
    ("cross_doc_span_removal", ("x1", "x3", "x10"), 2),
    ("minhash_lsh_candidates", ("x1", "x3", "x10"), 2),
    ("neardup_lsh_verified", ("x1", "x3", "x10"), 2),
    ("knn_lsh_bucketed", ("x1", "x3", "x10"), 2),
    ("multimodal_phash_neardup", ("x1", "x3", "x10"), 2),
    ("multimodal_phash_between", ("x1", "x3", "x10"), 2),
    ("jaccard_neardup_blocked", ("x1", "x3"), 1),
    # r14 refresh set (VERDICT r13 #5): rows whose operators were
    # re-shaped in r13 batches 3-6 / r14 after the committed
    # SCALE_PROBE.md was recorded.
    ("neardup_prefix_filter_exact", ("x1", "x3", "x10"), 2),
    ("edit_distance_neardups", ("x1", "x3", "x10"), 2),
    ("m4_lttb_downsample_events", ("x1", "x3", "x10"), 2),
    ("embedding_neardup_lsh_verified", ("x1", "x3", "x10"), 2),
    ("neardup_incremental_batch", ("x1", "x3", "x10"), 2),
]

SIZES = {"x1": 1, "x3": 3, "x10": 10}


def _rot(i: int) -> str:
    a = "abcdefghijklmnopqrstuvwxyz"
    k = i % 26
    return a[k:] + a[:k]


def generate(tiles: int, out_dir: str) -> None:
    """Tile the sf0.1 parquet `tiles` times into `out_dir` (DuckDB —
    no Spark JVM, so it can never thrash a concurrent bench)."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def emit(name: str, select_for_tile) -> None:
        parts = " UNION ALL ".join(select_for_tile(t) for t in range(tiles))
        dst = os.path.join(out_dir, f"{name}.parquet")
        con.execute(f"COPY ({parts}) TO '{dst}' (FORMAT PARQUET)")

    src = lambda n: f"read_parquet('{BASE}/{n}.parquet')"  # noqa: E731

    for dim in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {src(dim)}) TO "
            f"'{os.path.join(out_dir, dim + '.parquet')}' (FORMAT PARQUET)"
        )
    emit("customer", lambda t: f"""
        SELECT c_custkey + {t * OFF} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM {src('customer')}""")
    emit("supplier", lambda t: f"""
        SELECT s_suppkey + {t * OFF} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM {src('supplier')}""")
    emit("part", lambda t: f"""
        SELECT p_partkey + {t * OFF} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice FROM {src('part')}""")
    emit("orders", lambda t: f"""
        SELECT o_orderkey + {t * OFF} AS o_orderkey,
               o_custkey + {t * OFF} AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}""")
    emit("lineitem", lambda t: f"""
        SELECT l_orderkey + {t * OFF} AS l_orderkey,
               l_partkey + {t * OFF} AS l_partkey,
               l_suppkey + {t * OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}""")
    emit("events", lambda t: f"""
        SELECT event_id + {t * OFF} AS event_id, ts,
               user_id + {t * OFF} AS user_id, event_type, value, props
        FROM {src('events')}""")
    emit("documents", lambda t: f"""
        SELECT doc_id + {t * OFF} AS doc_id,
               translate(text, 'abcdefghijklmnopqrstuvwxyz',
                         '{_rot(t)}') AS text,
               lang, source, n_chars FROM {src('documents')}""")
    emit("embeddings", lambda t: f"""
        SELECT vec_id + {t * OFF} AS vec_id,
               CAST(list_concat([embedding[1] + {t} * 0.001],
                                embedding[2:]) AS FLOAT[]) AS embedding,
               label FROM {src('embeddings')}""")
    con.close()


def fit_exponent(points: list[tuple[int, float]]) -> float:
    """Least-squares slope of log T vs log size."""
    xs = [math.log(s) for s, _ in points]
    ys = [math.log(t) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return float("nan")
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def run(
    scales: dict[str, str],
    draws_cap: int | None = None,
    only: set | None = None,
) -> dict:
    from purpleair_data_logger_spark import catalog
    from purpleair_data_logger_spark.session import get_spark

    spark = get_spark("purpleair-spark-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    queries = catalog.all_queries()
    # warm the JVM + parquet caches once per scale dir
    for d in scales.values():
        queries["dedup_exact_docs"].fn(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()
    results: dict[str, dict] = {}
    for name, q_scales, draws in PROBE:
        if only is not None:
            if name not in only:
                continue
            # an explicit --only run probes every scale dir provided,
            # including --extra-tiles legs beyond the row's default
            q_scales = tuple(scales)
        if draws_cap:
            draws = min(draws, draws_cap)
        row: dict[str, float] = {}
        for sc in q_scales:
            if sc not in scales:
                continue
            best = float("inf")
            for _ in range(draws):
                t0 = time.perf_counter()
                queries[name].fn(spark, scales[sc]).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            row[sc] = round(best, 3)
            print(f"  {name:32s} {sc:>4s} {row[sc]:8.3f}s", flush=True)
        pts = [(SIZES[sc], t) for sc, t in row.items()]
        results[name] = {
            "times": row,
            "exponent": round(fit_exponent(pts), 2) if len(pts) >= 2 else None,
        }
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-generate", action="store_true")
    ap.add_argument("--draws", type=int, default=None)
    ap.add_argument("--out", default="SCALE_PROBE.json")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated PROBE names to (re)run at EVERY provided "
        "scale; results MERGE into an existing --out instead of "
        "replacing it",
    )
    ap.add_argument(
        "--extra-tiles",
        type=int,
        default=None,
        help="also generate and probe an xN tiling beyond the default "
        "x3/x10 (e.g. 30) — for chasing whether a high-marginal row's "
        "exponent creeps at larger scale",
    )
    args = ap.parse_args()
    scales = {"x1": BASE}
    tile_set = [3, 10] + (
        [args.extra_tiles] if args.extra_tiles else []
    )
    for tiles in tile_set:
        d = os.path.join(PROBE_ROOT, f"x{tiles}")
        scales[f"x{tiles}"] = d
        SIZES.setdefault(f"x{tiles}", tiles)
        if not args.skip_generate or not os.path.isdir(d):
            if os.path.isdir(d):
                shutil.rmtree(d)
            print(f"generating {d} ({tiles} tiles)...", flush=True)
            generate(tiles, d)
    only = set(args.only.split(",")) if args.only else None
    results = run(scales, args.draws, only)
    if only and os.path.exists(args.out):
        with open(args.out) as fh:
            prior = json.load(fh)
        prior.get("results", {}).update(results)
        results = prior["results"]
    payload = {
        "base": BASE,
        "sizes": SIZES,
        "results": results,
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({"probe": {n: r["exponent"] for n, r in results.items()}}))


if __name__ == "__main__":
    main()
