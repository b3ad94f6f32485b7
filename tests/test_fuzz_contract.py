"""NULL/duplicate-injection fuzz contract (VERDICT r5 #2).

`scripts/fuzz_oracle.py` mutates the driver testdata (NULLs in
events.value/ts/user_id/event_type/props/event_id and
documents.text/lang/source; duplicate (user_id, ts) pairs; exact
duplicate-PK rows in all three mutable tables; empty-string text) and
re-runs the full Spark-vs-DuckDB oracle comparison on the twin. The
full sweep (137 queries) runs in the verify flow; this test keeps a
representative slice green in CI — one query per divergence class the
round-6 sweep surfaced and fixed:

* NOT IN vs anti-join three-valued logic      (anti_join_inactive)
* as-of NULL keys/ts + row-atomic carry       (asof_last_click,
                                               asof_next_error)
* window ordering under NULL ts               (sessionize_users)
* two-tier lag/lead structural NULLs          (counter_delta_hourly,
                                               state_timeline_transitions,
                                               cusum_drift_by_user)
* percent-rank attach join NULL group keys    (quality_percentile_gate)
* NULL-text hash coercion                     (doc_fingerprint,
                                               document_chunking)
* NULL-payload decode propagation             (multimodal_features,
                                               multimodal_frame_sample)
* LSH '' -shingle fabrication from NULL text  (minhash_lsh_candidates,
                                               neardup_cluster_dedup)
* duplicate-PK df inflation / row multiply    (keyword_extraction,
                                               corpus_build_final)
* oracle PK-collapse vs per-row encode        (embedding_quantize_int8)

Since r8 the orders/lineitem/customer facts mutate too (their NULL
filters were documented but never executable), and the widened
mutation stream surfaced the DuckDB-ASOF NULL-ts quirk now encoded in
the asof_last_click oracle; the slice carries the TPC-H divergence
classes:

* NULL fact keys through joins/rollups        (revenue_rollup_region_nation,
                                               late_sole_supplier)
* NULL measures in exact-cents aggregates     (pricing_summary)
* NULL keys in decorrelated scalar subqueries (small_quantity_revenue)
"""

from __future__ import annotations

import pytest

from purpleair_data_logger_spark import catalog
from tests.oracle import compare

SLICE = [
    "anti_join_inactive",
    "asof_last_click",
    "asof_next_error",
    "sessionize_users",
    "counter_delta_hourly",
    "state_timeline_transitions",
    "cusum_drift_by_user",
    "quality_percentile_gate",
    "doc_fingerprint",
    "document_chunking",
    "multimodal_features",
    "multimodal_frame_sample",
    "minhash_lsh_candidates",
    "neardup_cluster_dedup",
    "keyword_extraction",
    "corpus_build_final",
    "embedding_quantize_int8",
    "revenue_rollup_region_nation",
    "late_sole_supplier",
    "pricing_summary",
    "small_quantity_revenue",
    "orders_snapshot_diff",      # dup-PK join fan-out determinism
    "substring_search_trigram",  # NULL/empty-text gram fabrication
    "idle_rich_customers",       # NOT-IN three-valued-logic trap (found r9)
    "order_count_distribution",  # NULL keys through an OUTER join histogram
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory, sf_dir):
    from scripts.fuzz_oracle import build_mutated_dir

    dst = tmp_path_factory.mktemp("fuzz_sf")
    build_mutated_dir(sf_dir, str(dst))
    return str(dst)


@pytest.mark.parametrize("name", SLICE)
def test_fuzzed_query_matches_oracle(spark, fuzz_dir, name):
    q = catalog.all_queries()[name]
    assert q.oracle is not None
    df = q.fn(spark, fuzz_dir)
    ok, msg = compare(df, q.oracle, fuzz_dir)
    assert ok, f"{name} diverged on fuzzed data: {msg}"


def test_mutated_twin_actually_mutates(spark, fuzz_dir, sf_dir):
    """The fuzz fixture must inject real NULLs and duplicates — guard
    against a silent no-op mutation making the slice vacuous."""
    from purpleair_data_logger_spark.io import load_table

    ev = load_table(spark, fuzz_dir, "events")
    base = load_table(spark, sf_dir, "events")
    assert ev.count() > base.count()  # duplicate rows appended
    for col in ("value", "ts", "user_id", "event_type", "event_id"):
        assert ev.filter(ev[col].isNull()).count() > 0, col
    dv = load_table(spark, fuzz_dir, "documents")
    assert dv.filter(dv["text"].isNull()).count() > 0
    assert dv.filter(dv["text"] == "").count() > 0
    assert dv.groupBy("doc_id").count().filter("count > 1").count() > 0
