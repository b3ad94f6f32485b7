"""C: joins / set ops / sorts (J1-J3, SURVEY §2.5-2.6).

Split from catalog.py in r12 (VERDICT r11 #7). Registration order is
load-bearing: catalog.py imports the family modules in the original
single-file source order, and queries register in module-body order,
so `all_queries()` and the gate window are byte-identical to the
pre-split catalog."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from purpleair_data_logger_spark.io import load_table
from purpleair_data_logger_spark.operators import aggregations as agg
from purpleair_data_logger_spark.operators import dedup as dd
from purpleair_data_logger_spark.operators import hyperfunctions as hf
from purpleair_data_logger_spark.operators import pii
from purpleair_data_logger_spark.operators import sampling as smp
from purpleair_data_logger_spark.operators import similarity as sim
from purpleair_data_logger_spark.operators import text as tx
from purpleair_data_logger_spark.queries._core import _t, register
from purpleair_data_logger_spark.queries._shared import (
    _hex60_sql,
    _hyperplane_band_sql,
    _knn_lsh_oracle,
    _minhash_lsh_cte,
)

# ---------------------------------------------------------------------------
# C. Joins / set ops / sorts (J1-J3, §2.5-2.6).
# ---------------------------------------------------------------------------


@register(
    "reconstruction_join",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lineitems
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    "J1 (9-way PK reconstruction join analog; dims broadcast)",
)
def reconstruction_join(spark, sf_dir):
    """Multi-way equi-join with broadcast dimensions.

    The Spark-native shape of the reference's implied 9-way PK join:
    small dims (region, nation, supplier, customer) broadcast so the
    only shuffle is the lineitem<->orders join; at 100 TB that join
    co-partitions on orderkey and AQE handles skew.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "part_brand_revenue",
    """
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY p_brand
    """,
    "J-family dimension join over the part table (broadcast dim, pushdown date filter, map-side-combined agg)",
)
def part_brand_revenue(spark, sf_dir):
    """Revenue by part brand for shipments since 1996 — the classic
    fact⨝dimension shape: `part` broadcasts (dimensions are MBs against
    a fact table of any size), the ship-date filter pushes to the
    lineitem scan, and the per-brand aggregate combines map-side.
    l_quantity is integer-valued, so its sum is exact in any order;
    revenue uses the same round(sum, 4) contract as
    `reconstruction_join` (green r1-r3)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
    )


@register(
    "semi_join_show_only",
    """
    SELECT user_id, count(*) AS n_events, max(value) AS max_value
    FROM events
    WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY user_id
    """,
    "J3+F2 (show_only IN-list as broadcast semi-join)",
)
def semi_join_show_only(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        e.join(
            F.broadcast(c),
            e.user_id == c.c_custkey,
            "left_semi",
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value"))
    )


@register(
    "anti_join_inactive",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey < 150
      AND c_custkey NOT IN (SELECT user_id FROM events
                            WHERE user_id IS NOT NULL)
    """,
    "J2 complement (anti-join; sensors present in directory but silent)",
)
def anti_join_inactive(spark, sf_dir):
    # NULL contract: a NULL user_id carries no observation, so it must
    # not poison the exclusion set — SQL `NOT IN` collapses to the
    # empty set when the subquery yields a NULL (three-valued logic),
    # while Spark's left_anti keeps non-matching rows; the oracle
    # filters NULLs to pin the anti-join semantics (fuzz-found, r6).
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 150)
    return c.join(
        e, c.c_custkey == e.user_id, "left_anti"
    ).select("c_custkey")


@register(
    "union_priority_tiers",
    """
    SELECT event_id, 'high' AS tier FROM events WHERE value >= 250.0
    UNION ALL
    SELECT event_id, 'low' AS tier FROM events WHERE value < 250.0
    """,
    "§2.5 union (multi-backfill merge primitive)",
)
def union_priority_tiers(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    hi = e.filter(F.col("value") >= 250.0).select(
        "event_id", F.lit("high").alias("tier")
    )
    lo = e.filter(F.col("value") < 250.0).select(
        "event_id", F.lit("low").alias("tier")
    )
    return hi.unionByName(lo)


@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    "§2.6 sort+limit (top-k)",
)
def topk_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "asof_last_click",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'error'),
    c AS (SELECT user_id, ts, value FROM events
          WHERE event_type = 'click'
            AND ts IS NOT NULL AND user_id IS NOT NULL)
    SELECT em.event_id, em.user_id, em.ts, c.ts AS asof_ts,
           c.value AS asof_value
    FROM (SELECT * FROM e
          WHERE ts IS NOT NULL AND user_id IS NOT NULL) em
    ASOF LEFT JOIN c ON em.user_id = c.user_id AND em.ts >= c.ts
    UNION ALL
    SELECT event_id, user_id, ts,
           CAST(NULL AS TIMESTAMP) AS asof_ts,
           CAST(NULL AS DOUBLE) AS asof_value
    FROM e WHERE ts IS NULL OR user_id IS NULL
    """,
    "as-of join (time-series most-recent-match; merge-scan, no range blowup)",
)
def asof_last_click(spark, sf_dir):
    """For each error event, the user's most recent click at-or-before
    it. Spark lacks a native as-of join; `operators.asof.asof_join`
    implements the merge-scan formulation (one shuffle + one sort).

    The oracle spells out the operator's documented NULL contract
    instead of trusting DuckDB's native ASOF with NULLs (r8
    fuzz-found, surfaced by the widened mutation stream): DuckDB's
    sort-based ASOF treats a NULL timestamp as LARGEST on both sides —
    a NULL-ts error "matches" the user's latest click, and a NULL-ts
    click can itself win as that latest state, yielding rows like
    (asof_ts=NULL, asof_value=33.6), a payload matched at an unknown
    time. The contract (asof.py): a NULL key/ts right row can never
    win, a NULL key/ts left row can never match but is still emitted
    with NULL payloads — so the oracle filters the right side and
    bypasses+unions the left NULLs explicitly."""
    from purpleair_data_logger_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    return asof_join(
        errors,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["ts", "value"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts"),
        F.col("asof_value"),
    )


@register(
    "sessionize_users",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
    FROM sessions GROUP BY user_id, session_id
    """,
    "sessionization (gap-based session windows, 30 min; gaps-and-islands)",
)
def sessionize_users(spark, sf_dir):
    from purpleair_data_logger_spark.operators.sessionize import session_stats

    e = _t(spark, sf_dir, "events")
    return session_stats(e, "user_id", "ts", gap_seconds=1800)


@register(
    "range_join_click_error",
    """
    SELECT e.event_id AS error_id, e.ts AS error_ts,
           c.event_id AS click_id, c.ts AS click_ts, c.value AS click_value
    FROM events e
    JOIN events c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts <= e.ts
    WHERE e.event_type = 'error' AND c.event_type = 'click'
    """,
    "beyond-reference bounded range join: all clicks within 10 min before each error (bucketized equi-join, no nested loop)",
)
def range_join_click_error(spark, sf_dir):
    """Windowed correlation: every click in the 10 minutes up to each
    error, same user. Planned as a pure equi-join on
    (user_id, time-bucket) with the exact range as a post-filter —
    never an inequality nested-loop (pinned in test_plans.py)."""
    from purpleair_data_logger_spark.operators.rangejoin import bounded_range_join

    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts"), F.col("event_id")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.col("event_id"), F.col("value")
    )
    out = bounded_range_join(
        errors, clicks, ["user_id"], "ts", "ts",
        gap_seconds=600, left_prefix="e_", right_prefix="c_",
    )
    return out.select(
        F.col("e_event_id").alias("error_id"),
        F.col("e_ts").alias("error_ts"),
        F.col("c_event_id").alias("click_id"),
        F.col("c_ts").alias("click_ts"),
        F.col("c_value").alias("click_value"),
    )


@register(
    "pk_dedup",
    """
    SELECT ts, user_id, min(event_id) AS event_id, count(*) AS n_dups
    FROM events GROUP BY ts, user_id
    """,
    "R6 (PK-duplicate resolution — deterministic dropDuplicates)",
)
def pk_dedup(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return dd.pk_dedup(e, ["ts", "user_id"], "event_id")


@register(
    "cardinality_profile",
    """
    SELECT count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_type) AS n_types,
           count(*) AS n_events
    FROM events
    """,
    "§2.10 cardinality profiling (exact distinct; approx variant in bench)",
)
def cardinality_profile(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "vertical_split_rejoin",
    """
    WITH keyed AS (SELECT event_id, ts, user_id FROM events),
         grp_a AS (SELECT event_id, event_type FROM events),
         grp_b AS (SELECT event_id, value FROM events)
    SELECT k.event_id, k.ts, k.user_id, a.event_type, b.value
    FROM keyed k
    JOIN grp_a a ON a.event_id = k.event_id
    JOIN grp_b b ON b.event_id = k.event_id
    """,
    "T4+J1 (vertical partition projection and the PK reconstruction join)",
)
def vertical_split_rejoin(spark, sf_dir):
    """The reference's core storage shape: one wide record vertically
    split into field groups (T4), then reconstructed with PK equi-joins
    (J1). At scale the N frames share partitioning (they were split
    from one scan), so Catalyst plans co-partitioned joins — no extra
    shuffle beyond the first."""
    e = _t(spark, sf_dir, "events")
    keyed = e.select("event_id", "ts", "user_id")
    grp_a = e.select("event_id", "event_type")
    grp_b = e.select("event_id", "value")
    return keyed.join(grp_a, "event_id").join(grp_b, "event_id").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "multimodal_metadata",
    """
    SELECT doc_id AS media_id, 'text/plain' AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
    "north-star multimodal: binary payload + typed metadata (JVM-only pass)",
)
def multimodal_metadata(spark, sf_dir):
    from purpleair_data_logger_spark.operators import multimodal as mm

    d = _t(spark, sf_dir, "documents")
    return mm.payload_metadata(mm.attach_binary_payload(d, "doc_id", "text"))


_MM_FEATURE_ORACLE = """
    WITH h AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents),
    b AS (SELECT media_id,
            list_transform(range(0,10), i ->
              (strpos('0123456789abcdef', substr(hx, 2*i+1, 1))-1)*16 +
              (strpos('0123456789abcdef', substr(hx, 2*i+2, 1))-1)) AS bs
          FROM h)
    SELECT media_id,
           CAST(bs[9] %% 64 + 1 AS INT) AS width,
           CAST(bs[10] %% 64 + 1 AS INT) AS height,
           %s
    FROM b
    """ % ",\n           ".join(
    f"CAST(bs[{i + 1}] AS INT) AS f{i}" for i in range(8)
)


@register(
    "multimodal_features",
    _MM_FEATURE_ORACLE,
    "north-star multimodal: mapInPandas decode/featurize (stub decoder)",
)
def multimodal_features(spark, sf_dir):
    """Arrow-batched decode/featurize, projected to driver-hashable
    scalars. The mapInPandas operator emits ``features: array<float>``
    (kept raw for the ANN feed and pytest determinism checks); the gate
    query recovers each float32 feature back to its source digest byte
    (``round(f * 255)`` — float32(b/255)·255 is within 1e-5 of b, so the
    round is exact), making every column canonicalizable. The DuckDB
    oracle replays `fake_decoder` arithmetic from `sha256(text)` hex."""
    from purpleair_data_logger_spark.operators import multimodal as mm

    d = _t(spark, sf_dir, "documents")
    media = mm.attach_binary_payload(d, "doc_id", "text")
    feats = mm.extract_features(media, decoder=mm.fake_decoder)
    return feats.select(
        "media_id",
        "width",
        "height",
        *[
            F.round(F.element_at("features", i + 1) * 255, 0)
            .cast("int")
            .alias(f"f{i}")
            for i in range(8)
        ],
    )


@register(
    "multimodal_resize",
    """
    SELECT doc_id AS media_id,
           CAST(6 AS INT) AS width,
           CAST(4 AS INT) AS height,
           CAST(CASE WHEN text IS NULL THEN NULL ELSE 24 END AS INT)
               AS n_bytes,
           upper(substr(sha256(text), 1, 48)) AS payload_hex
    FROM documents
    """,
    "north-star multimodal: mapInPandas resize (stub resampler), payload replayed byte-for-byte",
)
def multimodal_resize(spark, sf_dir):
    """Arrow-batched resize through the injectable-resampler seam. The
    gate pins a ONE-block output size (6×4 = 24 bytes ≤ one sha256
    block) because DuckDB's sha256 only accepts VARCHAR — the chained
    blocks of larger targets hash raw digest bytes, which the oracle
    cannot replay; the multi-block path is covered by the resize
    contract test in test_llm_ops.py. Payload compared as hex, so the
    resampler output is checked byte-for-byte."""
    from purpleair_data_logger_spark.operators import multimodal as mm

    d = _t(spark, sf_dir, "documents")
    media = mm.attach_binary_payload(d, "doc_id", "text")
    resized = mm.resize_media(media, width=6, height=4, resizer=mm.fake_resizer)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.length("payload").cast("int").alias("n_bytes"),
        F.hex("payload").alias("payload_hex"),
    )


@register(
    "approx_distinct_profile",
    None,
    "§2.10 approx_count_distinct cardinality profiling (HLL estimate)",
)
def approx_distinct_profile(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.approx_count_distinct("event_type").alias("approx_types"),
    )


