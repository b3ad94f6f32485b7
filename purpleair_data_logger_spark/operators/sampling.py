"""Deterministic hash-based sampling for training-data curation.

`df.sample()` is seed-dependent per partition layout — re-running after
a repartition samples a DIFFERENT subset, which breaks reproducible
corpus builds. These operators key the decision on a portable content
hash instead: a row is in the sample iff
``md5_long(key) % buckets < rate_bp``, so the same row always gets the
same verdict on any engine, any partitioning, any rerun — and the
driver's DuckDB oracle replays the decision bit-for-bit.

Scale posture: pure codegen expression filter — no shuffle, no state,
pushes through any downstream plan; the stratified variant folds the
per-stratum rate lookup into a broadcast-free CASE chain (the rate map
is a literal, not a join).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators.dedup import md5_long

#: sampling rates are expressed in basis points of this bucket count.
SAMPLE_BUCKETS = 10_000


def sample_bucket(key_col: str | Column) -> Column:
    """Stable bucket in [0, SAMPLE_BUCKETS) from the portable 60-bit
    md5 hash of the key (cast to string so numeric and string keys
    hash identically across engines)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return (md5_long(c.cast("string")) % SAMPLE_BUCKETS).cast("long")


def deterministic_sample(
    df: DataFrame, key_col: str, rate_bp: int
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``rate_bp`` (basis
    points: 10000 = keep all, 500 = ~5%). Deterministic in the key."""
    return df.filter(sample_bucket(key_col) < rate_bp)


def assign_split(
    df: DataFrame, key_col: str, splits: list[tuple[str, int]]
) -> DataFrame:
    """Deterministic train/val/test assignment: consecutive bucket
    ranges of the portable hash, e.g. ``[("train", 9000), ("val", 500),
    ("test", 500)]`` (basis points, summing to ≤ SAMPLE_BUCKETS; any
    remainder is labeled "rest"). A document can never migrate between
    splits across reruns or engines — the property that prevents
    train/test leakage when the corpus is rebuilt."""
    bucket = sample_bucket(key_col)
    cuts, acc = [], 0
    for name, bp in splits:
        acc += bp
        cuts.append((name, acc))
    expr = F.lit("rest")
    for name, cut in reversed(cuts):
        expr = F.when(bucket < cut, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def capped_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, deterministically.

    The per-domain cap of a crawl pipeline (e.g. ≤ K pages per host so
    no single site dominates the corpus). Selection order is the
    portable md5 hash of the key (ties broken by the key itself), so
    the surviving set is stable across reruns, engines, and
    partitionings — same property as `deterministic_sample`, but exact-K
    instead of rate-based. Output adds ``group_rank`` (1-based) so the
    caller can audit how deep each group filled.

    Scale: one shuffle on the group key — and because the rank filter
    is a top-k pattern, Spark plans WindowGroupLimit(Partial) BEFORE
    the Exchange: every upstream task pre-prunes each group to its cap
    smallest hashes, so a hot domain ships at most cap × n_tasks rows
    through the shuffle rather than its full row count (pinned in
    tests/test_plans.py). No skew mitigation needed beyond that.
    """
    from pyspark.sql import Window

    key = F.col(key_col)
    w = Window.partitionBy(group_col).orderBy(
        md5_long(key.cast("string")), key
    )
    return (
        df.withColumn("group_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("group_rank") <= cap)
    )


#: modulus of the portable uniform: 2^40 buckets keeps the md5-derived
#: integer exactly representable as a double (< 2^53), so the division
#: below is a single correctly-rounded IEEE op on every engine.
_U_BUCKETS = 1 << 40


def weighted_sample_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling without replacement, deterministically:
    Efraimidis–Spirakis A-Res (reservoir) selection of ``k`` rows per
    group, with inclusion probability proportional to ``weight_col``.

    A-Res assigns each row the priority ``u^(1/w)`` for u ~ U(0,1)
    and keeps the k largest — equivalently (and numerically safer)
    the k largest ``ln(u)/w``. Here u is not random but the portable
    md5 hash of the key mapped into (0, 1): the same row draws the
    same u on any engine, any partitioning, any rerun — turning the
    classic streaming reservoir into a deterministic top-k that a
    SQL oracle replays exactly (same property as
    `deterministic_sample`, but weight-proportional). The standard
    use: length-weighted corpus subsampling, where long documents
    must be over-represented for token-budget reasons.

    Rows with NULL or non-positive weight are excluded (they have no
    defined priority). Ties are broken by the key. Determinism note:
    the priority involves one ``ln`` — both JVM and C libm are ≤ 1 ulp
    here, so two rows could in principle order differently across
    engines if their priorities agree to ~15 significant digits;
    with 60-bit-hash-distinct u values the chance of a flip AT the
    selection boundary is ~2⁻⁴⁰ per pair, and the score itself is
    never emitted.

    Scale: identical to `capped_per_group` — one shuffle on the group
    key, and the rank-≤-k filter plans WindowGroupLimit(Partial)
    before the Exchange, so every upstream task pre-prunes its groups
    to k rows and a hot group ships k × n_tasks rows, not its full
    count (pinned in tests/test_plans.py).
    """
    from pyspark.sql import Window

    key = F.col(key_col)
    u = (
        (md5_long(key.cast("string")) % _U_BUCKETS) + 1
    ).cast("double") / F.lit(float(_U_BUCKETS + 1))
    priority = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(F.desc(priority), key)
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strat_col: str,
    rates_bp: dict[str, int],
    *,
    default_bp: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps rows with
    bucket < rates_bp[s] (default_bp for unlisted strata). The usual
    corpus-mixing primitive — e.g. keep 100% of a rare language and 5%
    of web crawl — as one literal CASE chain, no join, no shuffle."""
    rate = F.lit(default_bp)
    for s in sorted(rates_bp, reverse=True):
        rate = F.when(F.col(strat_col) == s, F.lit(rates_bp[s])).otherwise(rate)
    return df.filter(sample_bucket(key_col) < rate)


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    token_col: str,
    stratum_col: str,
    budgets: dict[str, int],
    *,
    n_buckets: int = 64,
) -> DataFrame:
    """Token-budget mixture building: per stratum (language, domain,
    source), keep documents until the stratum's TOKEN budget fills —
    the unit a training-data mixture is actually specified in ("30B
    tokens of code, 10B of math"), where doc-count rates
    (`stratified_sample`) only approximate it through mean doc length.

    Selection is whole-hash-bucket prefix inclusion: every doc gets a
    portable md5 bucket in [0, n_buckets); per (stratum, bucket) token
    sums are cumulated in bucket order and a stratum keeps exactly the
    buckets whose running total stays ≤ its budget. The realized total
    therefore lands within one bucket's tokens under the budget, never
    over — tolerance ≈ stratum_tokens / n_buckets, the knob being
    ``n_buckets``. Deterministic in the ids: rebuilds, engines and
    partitionings agree (same property as `assign_split`), and growing
    a corpus only ever adds docs WITHIN already-chosen buckets'
    hash-space, keeping selections stable modulo budget re-cuts.
    Strata without a budget entry are excluded.

    Scale: the doc-level stages are a stateless bucket projection and
    one groupBy(stratum, bucket) — map-side combinable, |strata| ×
    n_buckets output rows. The cumulative window runs over THAT
    aggregate (thousands of rows at any corpus size), never the
    corpus — same two-pass discipline as `percent_rank_filter`. The
    cutoff table (one row per stratum) broadcasts back as an
    equi-join + filter.

    Output: one row per SELECTED doc — (id, stratum, budget_bucket,
    token_col) — plus ``bucket_cum_tokens``, the stratum's running
    token total through the doc's bucket, for audit.
    """
    from pyspark.sql import Window

    strata = sorted(budgets)
    bucket = (md5_long(F.col(id_col).cast("string")) % n_buckets).cast("long")
    tagged = df.filter(F.col(stratum_col).isin(strata)).withColumn(
        "budget_bucket", bucket
    )
    per_bucket = tagged.groupBy(stratum_col, "budget_bucket").agg(
        F.sum(F.col(token_col)).alias("_bk_tokens")
    )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy("budget_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget_expr = F.lit(None).cast("long")
    for s in reversed(strata):
        budget_expr = F.when(
            F.col(stratum_col) == s, F.lit(int(budgets[s]))
        ).otherwise(budget_expr)
    kept_buckets = (
        per_bucket.withColumn("bucket_cum_tokens", F.sum("_bk_tokens").over(w))
        .filter(F.col("bucket_cum_tokens") <= budget_expr)
        .select(stratum_col, "budget_bucket", "bucket_cum_tokens")
    )
    return tagged.join(
        F.broadcast(kept_buckets), [stratum_col, "budget_bucket"]
    ).select(
        F.col(id_col),
        F.col(stratum_col),
        F.col("budget_bucket"),
        F.col(token_col),
        F.col("bucket_cum_tokens"),
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    *,
    cutoff: str,
    embargo: str | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Time-based train/test assignment with an embargo gap — the
    leakage-safe split for TEMPORALLY correlated data (backtests,
    forecasting, event models), complementing the cluster-keyed
    `assign_split` which guards against CONTENT leakage.

    Rows strictly before ``embargo`` (or ``cutoff`` when no embargo)
    are ``train``; rows at/after ``cutoff`` are ``test``; rows in
    [embargo, cutoff) are labeled ``embargo`` and kept visible — an
    audit row a pipeline must consciously drop, not a silent hole.
    The embargo absorbs look-ahead bleed (features computed over
    trailing windows near the boundary see post-cutoff behavior).

    NULL contract: a NULL timestamp carries no observation — the
    caller filters (the catalog query does), since an unknown time
    cannot be placed on either side of the boundary.

    Scale shape: one codegen'd CASE projection, zero shuffles; with a
    date-partitioned layout the cutoff predicates become partition
    pruning on both downstream reads.
    """
    def _parse(label: str, value: str):
        # Driver-side guard: the arguments become plan-time literals, so a
        # swapped/mistyped pair would otherwise SILENTLY label rows in
        # [cutoff, embargo) as 'train' — the exact test-into-train leakage
        # this operator exists to prevent. ISO-8601 is the documented
        # contract (what the catalog and tests pass); reject early and
        # loudly rather than let Spark's lenient cast mislabel.
        try:
            return datetime.fromisoformat(str(value))
        except ValueError as exc:
            raise ValueError(
                f"temporal_split: {label}={value!r} is not an ISO-8601 "
                f"timestamp: {exc}"
            ) from None

    cutoff_ts = _parse("cutoff", cutoff)
    if embargo is not None:
        embargo_ts = _parse("embargo", embargo)
        if (embargo_ts.tzinfo is None) != (cutoff_ts.tzinfo is None):
            raise ValueError(
                f"temporal_split: cutoff ({cutoff}) and embargo ({embargo}) "
                "mix timezone-aware and naive timestamps — they are not "
                "comparable; state both in the same form"
            )
        if embargo_ts > cutoff_ts:
            raise ValueError(
                f"temporal_split: embargo ({embargo}) must be at or before "
                f"cutoff ({cutoff}) — an embargo AFTER the cutoff would "
                f"label test-period rows as 'train'"
            )
    lo = embargo if embargo is not None else cutoff
    c = F.col(ts_col)
    return df.withColumn(
        split_col,
        F.when(c < F.lit(lo).cast("timestamp"), F.lit("train"))
        .when(c >= F.lit(cutoff).cast("timestamp"), F.lit("test"))
        .otherwise(F.lit("embargo")),
    )


def temperature_budgets(
    df: DataFrame,
    token_col: str,
    stratum_col: str,
    *,
    total_budget: int,
    alpha: float,
) -> DataFrame:
    """Temperature-rebalanced mixture budgets (the mT5/multilingual
    sampling rule): stratum d's share of ``total_budget`` is
    n_d^alpha / SUM n_e^alpha over its natural token count n_d.
    alpha=1 is proportional (natural mixture), alpha->0 approaches
    uniform; the standard 0.2-0.7 range upweights low-resource
    strata without letting the head domains drown them.

    One row per stratum: (stratum, stratum_tokens, share, budget,
    budget_capped). ``budget`` is the raw temperature allocation
    (largest-remainder-free floor, so SUM budget <= total_budget);
    ``budget_capped`` = min(budget, stratum_tokens) — an upweighted
    low-resource stratum can be allocated more tokens than it has, and
    whether to close that gap by repetition (sampling with
    replacement, epochs over the small stratum) is a trainer-side
    decision this operator surfaces rather than hides: the difference
    ``budget - budget_capped`` is the repetition demand.

    Scale: one map-side-combinable groupBy to |strata| rows, then
    driver-free normalization via a single-row broadcast aggregate —
    the corpus is scanned once, the arithmetic runs on a
    domains-sized frame."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    per = df.groupBy(stratum_col).agg(
        F.sum(F.col(token_col)).cast("long").alias("stratum_tokens")
    )
    pw = F.pow(F.col("stratum_tokens").cast("double"), F.lit(float(alpha)))
    tot = per.agg(F.sum(pw).alias("_z"))
    share = pw / F.col("_z")
    budget = F.floor(F.lit(int(total_budget)) * share).cast("long")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            stratum_col,
            "stratum_tokens",
            share.alias("share"),
            budget.alias("budget"),
            F.least(budget, F.col("stratum_tokens")).alias("budget_capped"),
        )
    )


def temperature_token_sample(
    df: DataFrame,
    id_col: str,
    token_col: str,
    stratum_col: str,
    *,
    total_budget: int,
    alpha: float,
    n_buckets: int = 64,
) -> DataFrame:
    """`temperature_budgets` composed with `token_budget_sample`: the
    end-to-end temperature mixture — compute each stratum's
    alpha-rebalanced token budget, then materialize the deterministic
    whole-bucket selection against it. The budget table is |strata|
    rows, so the intermediate collect is a documented driver-sized
    calibration (the `similarity.py` quantizer discipline), never a
    corpus collect. Capped budgets are used (a corpus builder cannot
    repeat documents; the repetition demand stays visible in
    `temperature_budgets` output)."""
    rows = temperature_budgets(
        df, token_col, stratum_col,
        total_budget=total_budget, alpha=alpha,
    ).collect()
    budgets = {r[stratum_col]: int(r["budget_capped"]) for r in rows}
    return token_budget_sample(
        df, id_col, token_col, stratum_col, budgets, n_buckets=n_buckets
    )
