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


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch: mergeable, DETERMINISTIC rank estimates.
# ---------------------------------------------------------------------------
#
# The quantile member of the sketch family (CMS = frequencies, HLL =
# distinct counts, MG = heavy hitters): "what is the p-th percentile of
# a column too large to sort" answered from a FIXED-SIZE per-group
# summary. The summary is the k rows whose portable md5 priority
# ("bk|" + id, `dedup.md5_long`) is smallest — a uniform sample whose
# membership is a pure function of row identity, so unlike
# reservoir/t-digest/KLL sketches it is bit-identical across
# partitionings, re-runs, merge orders, AND engines: DuckDB replays
# sample, estimate, and error audit exactly (the catalog's
# `quantile_sketch_events` is fully oracled — rare for a quantile
# sketch, and the reason this design was chosen over the randomized
# classics).
#
# Estimate: value at rank 1 + (q·(n_s−1)) DIV 100 of the sorted sample
# (nearest-rank-lower). Error: a bottom-k-by-uniform-hash sample of
# size k gives rank error O(1/sqrt(k)) with the usual binomial tail —
# k=256 ≈ ±6 rank points at one sigma (pinned loosely in pytest; the
# oracled query carries its own exact `true_rank_bp` audit column, so
# every gate run re-measures the error rather than trusting the
# bound).
#
# Merge algebra: bottom-k of a DISJOINT union == bottom-k of the
# union of the parts' bottom-ks (the hash is global, so the k smallest
# overall are among each part's k smallest). Partials from overlapping
# inputs would double-count rows — same contract as countmin_merge's
# per-partition/per-day partials.
#
# Scale shape: ONE shuffle on the group key; the per-group top-k
# window filter collapses map-side (WindowGroupLimit — each task
# forwards at most k rows per group it sees), so the reduce side
# carries O(groups·k) rows however large the input. Estimates are a
# second window over the ≤k-row sample. No Python anywhere.

#: Default sample size: 256 rows ≈ ±6 percentile points at 1σ.
BOTTOMK_DEFAULT_K = 256


def _bottomk_priority(id_col: str) -> Column:
    """Portable sample priority: md5_long("bk|" + id). Salted so the
    sketch's sampling is independent of the split/bucket md5 families
    over the same key."""
    return md5_long(
        F.concat(F.lit("bk|"), F.col(id_col).cast("string"))
    )


def bottomk_sample(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    *,
    value_col: str,
    k: int = BOTTOMK_DEFAULT_K,
) -> DataFrame:
    """Per-key deterministic uniform sample: the ``k`` rows of each
    key group with the smallest md5 priority of ``id_col`` (NULL ids
    carry no observation; ties broken by id then value so duplicate-id
    rows cut deterministically). Keeps ``key_cols + [id_col,
    value_col]``. One key-shuffle; map-side WindowGroupLimit prunes
    every task to k rows per group."""
    from pyspark.sql import Window

    base = df.filter(
        F.col(id_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(*key_cols, id_col, value_col)
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        _bottomk_priority(id_col), F.col(id_col), F.col(value_col)
    )
    return (
        base.withColumn("_bk_rn", F.row_number().over(w))
        .filter(F.col("_bk_rn") <= int(k))
        .drop("_bk_rn")
    )


def bottomk_merge(
    *samples: DataFrame,
    key_cols: list[str],
    id_col: str,
    value_col: str,
    k: int = BOTTOMK_DEFAULT_K,
) -> DataFrame:
    """Merge per-partition/per-day bottom-k partials built over
    DISJOINT inputs: union, re-take the k smallest priorities. The
    global hash makes this exact — merge(sketch(A), sketch(B)) ==
    sketch(A ∪ B), any merge order, bit-identical."""
    if not samples:
        raise ValueError("bottomk_merge needs at least one sample")
    u = reduce(lambda a, b: a.unionByName(b), samples)
    return bottomk_sample(
        u, key_cols, id_col, value_col=value_col, k=k
    )


def bottomk_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    *,
    k: int = BOTTOMK_DEFAULT_K,
    q_pcts: tuple[int, ...] = (10, 50, 90, 99),
) -> DataFrame:
    """Per-key quantile estimates from the bottom-k sample: one row
    (keys..., q_pct, n_sample, est_value) per requested integer
    percentile — est_value = the sample's nearest-rank-lower order
    statistic, rank 1 + (q_pct·(n_sample−1)) DIV 100, ties broken by
    (value, id) so the pick is deterministic on every engine."""
    from pyspark.sql import Window

    for p in q_pcts:
        if not 0 <= int(p) <= 100:
            raise ValueError(f"q_pcts must be integer percents, got {p}")
    samp = bottomk_sample(df, key_cols, id_col, value_col=value_col, k=k)
    wn = Window.partitionBy(*[F.col(c) for c in key_cols])
    wv = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        F.col(value_col), F.col(id_col)
    )
    ranked = (
        samp.withColumn("n_sample", F.count(F.lit(1)).over(wn).cast("long"))
        .withColumn("_vr", F.row_number().over(wv))
    )
    q = F.explode(
        F.array(*[F.lit(int(p)).cast("long") for p in q_pcts])
    ).alias("q_pct")
    return (
        ranked.select(*key_cols, "n_sample", "_vr", F.col(value_col), q)
        .filter(
            F.col("_vr")
            == F.lit(1) + F.expr("(q_pct * (n_sample - 1)) DIV 100")
        )
        .select(
            *key_cols,
            "q_pct",
            "n_sample",
            F.col(value_col).alias("est_value"),
        )
    )
