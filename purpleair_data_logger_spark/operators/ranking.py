"""Ranked retrieval over the document corpus: BM25 term scoring,
top-k lexical search, and reciprocal-rank fusion (RRF) of lexical +
vector signals.

Beyond-the-reference LLM-pipeline operators: retrieval-corpus
curation, hard-negative mining, and RAG index evaluation all need a
lexical ranker and a hybrid fuser next to the ANN ladder
(`operators/similarity.py`). The reference delegates all analytics to
TimescaleDB/Grafana SQL (`PurpleAirPSQLDataLogger.py`); ranked
retrieval has no analog there — this module is part of the
training-data-pipeline surface the engine adds.

Determinism contract (the DuckDB oracles replay bit-for-bit): tf, df,
dl, N, L are exact integers; every float expression is a FIXED
left-associated tree over those integers using the same literals in
both engines (0.75 and 0.25 are binary-exact; 1.2 and 2.2 parse to
identical doubles), so scores are IEEE-identical and the rank order
is too. The idf is the log-free ODDS form (N − df + ½)/(df + ½) — the
same monotone-proxy discipline as `bigram_lm_fluency`'s log-free
KenLM analog: cross-engine ln() is not bit-pinned, a ratio of exact
halves is. RRF contributions are floor-scaled to BIGINT
(⌊scale/(k+rank)⌋) so the fused score is an exact integer sum —
order-free, overflow-free, hash-comparable.

Scale shape: tf/dl are per-row projections over the token array
(higher-order `filter`/`size`, zero shuffles, whole-stage codegen);
corpus stats (N, L, df per term) are ONE map-side-combined aggregate
broadcast back; top-k is orderBy+limit (TakeOrderedAndProject — a
per-partition heap + driver merge of k rows, never a global sort)
with ranks assigned by a window over the k surviving rows only. The
fusion join is rank-list-sized (top-R per signal), never corpus-sized.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: BM25 shape parameters — fixed literals shared with every oracle.
K1 = 1.2
B = 0.75

#: RRF constants: the canonical k=60 smoothing, contributions scaled
#: to ⌊1e6/(60+rank)⌋ so the fused score is an exact BIGINT sum.
RRF_K = 60
RRF_SCALE = 1_000_000.0


def _tf(toks: Column, term: str) -> Column:
    """Exact term frequency: count of whitespace tokens equal to
    ``term`` — a JVM-side higher-order filter over the token array,
    no explode, no shuffle."""
    return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("long")


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    *,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Per-document BM25 score for a fixed bag of query terms.

    Output: (id_col, dl, tf_total, score) for documents matching at
    least one term. ``score`` is the odds-idf BM25 sum — a fixed
    left-associated float expression over exact integer (tf, df, dl,
    N, L), bit-reproducible across engines (module docstring).

    NULL contract: a NULL id or NULL text carries no observation —
    excluded from the corpus stats (N, L, df) and from scoring, in
    both engines.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = docs.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        *[_tf(toks, t).alias(f"_tf{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("dl").cast("double").alias("_l"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))

    def contribution(i: int) -> Column:
        tf = F.col(f"_tf{i}").cast("double")
        df = F.col(f"_df{i}")
        idf = (F.col("_n") - df + F.lit(0.5)) / (df + F.lit(0.5))
        # denominator: tf + k1*(1-b + b*dl*N/L), with 1-b folded to
        # the binary-exact 0.25 literal in BOTH engines
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl").cast("double") * F.col("_n") / F.col("_l")
        )
        return idf * (tf * F.lit(k1 + 1.0)) / denom

    score = reduce(lambda a, c: a + c, [contribution(i) for i in range(len(terms))])
    tf_total = reduce(
        lambda a, c: a + c, [F.col(f"_tf{i}") for i in range(len(terms))]
    )
    return (
        j.select(
            id_col,
            "dl",
            tf_total.alias("tf_total"),
            score.alias("score"),
        )
        .filter(F.col("tf_total") > 0)
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    *,
    k: int = 50,
    rank_col: str = "bm25_rank",
) -> DataFrame:
    """Top-k documents by BM25, rank assigned after the top-k cut.

    orderBy+limit plans as TakeOrderedAndProject (per-partition heap,
    driver merge of k rows); the row_number window then runs over k
    rows only — the global-sort-free way to emit ranked results.
    Deterministic tie-break on the id column.
    """
    scored = bm25_scores(docs, id_col, text_col, terms)
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn(rank_col, F.row_number().over(w).cast("int"))


def rrf_contribution(rank: Column) -> Column:
    """⌊scale/(k+rank)⌋ as BIGINT; 0 for a missing (NULL) rank.

    floor of an IEEE division of exact integers is cross-engine
    deterministic: the quotient is an integer only when (k+rank)
    divides scale, in which case the double is exact."""
    return F.coalesce(
        F.floor(F.lit(RRF_SCALE) / (rank + F.lit(RRF_K)).cast("double")).cast(
            "long"
        ),
        F.lit(0).cast("long"),
    )


def retrieval_eval(
    gt: DataFrame,
    cand: DataFrame,
    query_col: str,
    item_col: str,
    rank_col: str,
    *,
    k: int,
) -> DataFrame:
    """Per-query retrieval quality of ``cand`` against ground truth
    ``gt`` (both (query, item, rank) lists, ranks 1..k): recall@k and
    the scaled reciprocal rank of the ground truth's TOP-1 item.

    The index-evaluation operator of the ANN/retrieval stack: run it
    with gt = brute-force cosine and cand = any ladder rung (LSH, IVF,
    IVF-SQ8) to measure the index, or with cand = a fused ranking to
    measure the fuser. Exact arithmetic only: recall is an integer
    hit count over a fixed k; the reciprocal rank is the same
    ⌊scale/rank⌋ BIGINT transform RRF uses, so results are
    hash-comparable cross-engine (no float mean over queries — emit
    per-query rows and aggregate downstream when needed).

    A query with no candidate hits still emits a row (0 hits, 0 rr) —
    silent misses are the failure mode an eval must surface.
    """
    # every joined side is ≤ |queries|·k rows by construction (both
    # inputs are already-cut rank lists), so broadcast explicitly —
    # post-window/limit stats are opaque to AQE, which otherwise
    # falls back to sort-merge
    gt_items = gt.select(query_col, item_col)
    n_hits = (
        cand.join(F.broadcast(gt_items), on=[query_col, item_col], how="left_semi")
        .groupBy(query_col)
        .agg(F.count(F.lit(1)).alias("_n_hits"))
    )
    top1 = gt.filter(F.col(rank_col) == 1).select(query_col, item_col)
    rr = cand.join(F.broadcast(top1), on=[query_col, item_col]).select(
        query_col,
        F.floor(F.lit(RRF_SCALE) / F.col(rank_col).cast("double"))
        .cast("long")
        .alias("_rr"),
    )
    qs = gt.select(query_col).distinct()
    return (
        qs.join(F.broadcast(n_hits), query_col, "left")
        .join(F.broadcast(rr), query_col, "left")
        .select(
            query_col,
            F.coalesce(F.col("_n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("_n_hits"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall_at_k"),
            F.coalesce(F.col("_rr"), F.lit(0).cast("long")).alias("rr_scaled"),
        )
    )


def rrf_fuse(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    id_col: str,
    rank_a_col: str,
    rank_b_col: str,
    *,
    topk: int = 50,
) -> DataFrame:
    """Reciprocal-rank fusion of two rank lists (Cormack et al.'s RRF
    with k=60), integer-scaled so the fused score is an exact BIGINT.

    Inputs are (id, rank) lists — already cut to top-R per signal, so
    the full-outer join is rank-list-sized. An item missing from one
    list contributes 0 from that signal. Output: (id, rank_a, rank_b,
    rrf_scaled, fused_rank) for the fused top-k, ties broken on id.
    """
    fused = (
        ranks_a.join(ranks_b, on=id_col, how="full_outer")
        .select(
            id_col,
            rank_a_col,
            rank_b_col,
            (
                rrf_contribution(F.col(rank_a_col))
                + rrf_contribution(F.col(rank_b_col))
            ).alias("rrf_scaled"),
        )
    )
    top = fused.orderBy(F.desc("rrf_scaled"), F.asc(id_col)).limit(topk)
    w = Window.orderBy(F.desc("rrf_scaled"), F.asc(id_col))
    return top.withColumn("fused_rank", F.row_number().over(w).cast("int"))


def cross_encode(query: str, doc: str) -> int:
    """Real cross-encoder entry point — STUB (the `encoder.encode_text`
    / multimodal-decoder seam): no inference runtime ships in this
    container. Production plugs a model that scores (query, document)
    pairs jointly; tests and the catalog plug `fake_cross_scorer`."""
    raise NotImplementedError(
        "cross-encoder scoring requires a model runtime, not present "
        "in this container; pass scorer=fake_cross_scorer for the "
        "deterministic test path"
    )


def fake_cross_scorer(query: str, doc: str) -> int:
    """Deterministic stand-in for a cross-encoder forward pass: the
    first 15 hex digits of sha256(query ∥ 0x1f ∥ doc) as a
    non-negative int64 — the `dedup.md5_long` 60-bit discipline, so
    the DuckDB oracle replays every score bit-for-bit via
    nibble-parsing ``sha256(qtext || chr(31) || text)``. Same
    (query, doc) -> score signature a real model plugs into."""
    import hashlib

    digest = hashlib.sha256(
        (query + "\x1f" + doc).encode("utf-8")
    ).hexdigest()
    return int(digest[:15], 16)


def rerank_topk(
    cand: DataFrame,
    queries: DataFrame,
    docs: DataFrame,
    *,
    query_id_col: str,
    doc_id_col: str,
    query_text_col: str,
    doc_text_col: str,
    k: int = 10,
    scorer=cross_encode,
) -> DataFrame:
    """Cross-encoder reranking of first-stage candidates — the third
    stage of the retrieval pipeline (BM25 / ANN recall → candidate
    pairs → joint (query, doc) rescoring → top-k), the step every RAG
    / hard-negative-mining deployment runs between retrieval and use.

    Scale shape: strictly CANDIDATE-BOUNDED — the corpus is touched
    only through one id equi-join fetching candidate documents' text
    (|candidates| rows, never a scan-side explode), the query table
    broadcasts (a query set is driver-sized by construction), and the
    scorer runs in ONE mapInPandas Arrow stage over the joined pairs
    (per-batch Python amortized, never row-at-a-time UDFs). The top-k
    cut is a per-query row_number window bounded by rank <= k, which
    Spark plans as WindowGroupLimit — map-side pruning to k rows per
    query before the shuffle (the `sampling.token_budget_mixture`
    pin).

    NULL contract: a candidate whose query or document text is NULL
    cannot be scored and is dropped (no observation), as is a NULL id
    on either side.

    Output: (query_id, doc_id, ce_score, rerank) with rerank 1..k per
    query, ties broken by doc id — deterministic because `scorer` is
    required to be a pure function of the pair.
    """
    import pandas as pd

    qc = queries.select(
        F.col(query_id_col).cast("long").alias("_qid"),
        F.col(query_text_col).alias("_qtext"),
    ).filter(F.col("_qid").isNotNull() & F.col("_qtext").isNotNull())
    dc = docs.select(
        F.col(doc_id_col).cast("long").alias("_did"),
        F.col(doc_text_col).alias("_dtext"),
    ).filter(F.col("_did").isNotNull() & F.col("_dtext").isNotNull())
    pairs = (
        cand.select(
            F.col(query_id_col).cast("long").alias("_qid"),
            F.col(doc_id_col).cast("long").alias("_did"),
        )
        .filter(F.col("_qid").isNotNull() & F.col("_did").isNotNull())
        .join(dc, "_did")
        .join(F.broadcast(qc), "_qid")
    )

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "_qid": pdf["_qid"],
                    "_did": pdf["_did"],
                    "ce_score": pd.array(
                        [
                            scorer(q, d)
                            for q, d in zip(pdf["_qtext"], pdf["_dtext"])
                        ],
                        dtype="Int64",
                    ),
                }
            )

    scored = pairs.mapInPandas(
        run, "_qid long, _did long, ce_score long"
    )
    w = Window.partitionBy("_qid").orderBy(
        F.desc("ce_score"), F.asc("_did")
    )
    return (
        scored.withColumn("rerank", F.row_number().over(w).cast("int"))
        .filter(F.col("rerank") <= int(k))
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_did").alias(doc_id_col),
            "ce_score",
            "rerank",
        )
    )
