"""Count-Min sketch: mergeable approximate frequency counts.

Completes the sketch family next to HLL approx-distinct
(`hll_daily_users_merge`), Misra–Gries heavy-hitter summaries
(`streaming/frequent.py`), and MinHash/SimHash signatures: CMS answers
"how often does key X occur" over a stream/corpus too large to hold a
distinct-key table, with a fixed-size summary that MERGES by cell-wise
addition — per-partition (or per-day) sketches sum into the global
one, the same partial-aggregate algebra Spark's own HLL uses.

Representation: the sketch is a (row, bucket, cnt) DataFrame — the
SPARSE form of the depth×width counter matrix (cells never touched are
zero and not materialized; the dense array is its pivot). ``depth``
independent hash rows bound the overestimate probabilistically:

    estimate(x) = min_r  cell[r, h_r(x)]      (never BELOW the truth)
    P[ estimate(x) > true(x) + ε·N ]  <  (1/(width·ε))^depth-ish
       (classic CMS bound: ε = e/width per row, δ = e^-depth)

Hashes are the repo's portable 60-bit md5 family (`dedup.md5_long`)
salted per row ("cm0|", "cm1|", …), so DuckDB replays every cell and
every estimate bit-for-bit — the sketch is fully oracle-able, unlike
RNG-seeded implementations.

Scale shape: the build is ONE scan with a depth-way explode and one
map-side-combinable (row, bucket) sum — the shuffle carries at most
depth·width cells per partition regardless of corpus size (the whole
point); estimates join the (≤ depth·width row) sketch BROADCAST
against the query keys. Counts are BIGINTs; weights must be
non-negative for the never-below-truth invariant to hold.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators.dedup import md5_long

DEFAULT_WIDTH = 2048
DEFAULT_DEPTH = 4


def _bucket(key: Column, row: Column, width: int) -> Column:
    """Portable per-row hash: md5("cm<row>|<key>") folded to 60 bits,
    mod width — non-negative on both engines, replayed in oracle SQL
    via `_hex60_sql`."""
    return md5_long(
        F.concat(F.lit("cm"), row.cast("string"), F.lit("|"), key)
    ) % F.lit(width)


def countmin_table(
    df: DataFrame,
    key_col: str,
    *,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sparse CMS table (row, bucket, cnt) over ``df``'s
    keys (NULL keys carry no observation). ``weight_col`` turns the
    sketch into a weighted-frequency summary (weights must be
    non-negative BIGINT-castable — ENFORCED: a negative weight would
    silently break the never-below-truth one-sided-error guarantee
    that ``countmin_estimate`` and its consumers rely on, so the scan
    raises on the first offending row instead).

    One scan, one depth-way explode, one (row, bucket) sum with
    map-side combine — the reduce side sees at most depth·width cells
    per map partition however large the input.
    """
    if weight_col is None:
        w = F.lit(1).cast("long")
    else:
        wc = F.col(weight_col).cast("long")
        w = F.when(
            wc < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"countmin_table: negative weight in '{weight_col}' "
                        "(got "
                    ),
                    F.col(weight_col).cast("string"),
                    F.lit(") — CMS one-sided error requires w >= 0"),
                )
            ).cast("long"),
        ).otherwise(wc)
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("_k"), w.alias("_w"))
        .select("_k", "_w", rows)
        .select(
            "row",
            _bucket(F.col("_k"), F.col("row"), width).alias("bucket"),
            "_w",
        )
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches — CMS's defining algebra
    (sketch(A ∪ B) == merge(sketch(A), sketch(B)), exactly). Use for
    per-partition / per-day partials rolled into a global summary."""
    if not sketches:
        raise ValueError("countmin_merge needs at least one sketch")
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Point-query every row of ``keys``: append ``n_est`` = the CMS
    estimate (min over the depth cells; a key hashing into never-
    touched cells estimates 0 — only possible for keys absent from
    the sketched data). Never below the true (weighted) count.

    The sketch is at most depth·width rows by construction, so it
    BROADCASTS; the query side never shuffles.
    """
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    probes = keys.select("*", rows).withColumn(
        "_probe", _bucket(F.col(key_col), F.col("row"), width)
    )
    return (
        probes.join(
            F.broadcast(sketch),
            (probes["row"] == sketch["row"])
            & (probes["_probe"] == sketch["bucket"]),
            "left",
        )
        .select(
            *[probes[c] for c in keys.columns],
            F.coalesce(sketch["cnt"], F.lit(0).cast("long")).alias("_cell"),
        )
        .groupBy(*[F.col(c) for c in keys.columns])
        .agg(F.min("_cell").alias("n_est"))
        .select(*keys.columns, "n_est")
    )
