"""Property test: the prefix-filter similarity join must equal the
naive all-pairs Jaccard join on arbitrary corpora — including the
places the prefix-length / size-filter arithmetic could hide an
off-by-one: single-token documents, identical documents, subset
documents sitting exactly on the size-filter boundary, corpora where
every document shares the same rarest token, and the degenerate
thresholds 100 (exact duplicates only) and 1 (nearly everything)."""

from __future__ import annotations

import random

import pytest

from purpleair_data_logger_spark.operators.dedup import (
    prefix_filter_between,
    prefix_filter_neardups,
)


def _brute(rows, t_pct):
    sets = {i: set(t.split(" ")) for i, t in rows}
    out = set()
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            jac = round(len(a & b) / len(a | b), 4)
            if jac >= t_pct / 100.0:
                out.add((ids[i], ids[j]))
    return out


def _random_corpus(seed, n_docs, vocab, min_len, max_len):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        k = rng.randint(min_len, max_len)
        toks = rng.sample(vocab, min(k, len(vocab)))
        rows.append((i, " ".join(toks)))
    # plant structure the random draw rarely produces: an exact dup,
    # a subset doc, and a one-token doc
    rows.append((n_docs, rows[0][1]))
    first = rows[1][1].split(" ")
    rows.append((n_docs + 1, " ".join(first[: max(1, len(first) // 2)])))
    rows.append((n_docs + 2, first[0]))
    return rows


VOCAB_SMALL = [f"w{i}" for i in range(12)]   # heavy overlap
VOCAB_WIDE = [f"w{i}" for i in range(200)]   # sparse overlap

CASES = [
    (_random_corpus(1, 15, VOCAB_SMALL, 1, 8), 80),
    (_random_corpus(2, 15, VOCAB_SMALL, 1, 8), 50),
    (_random_corpus(3, 20, VOCAB_WIDE, 3, 12), 60),
    (_random_corpus(4, 12, VOCAB_SMALL, 2, 6), 100),  # exact dups only
    (_random_corpus(5, 10, VOCAB_SMALL, 1, 5), 1),    # nearly everything
    # all docs share one token; sizes straddle the 80% size filter
    ([(i, "shared " + " ".join(f"u{i}_{j}" for j in range(i + 1)))
      for i in range(8)], 80),
    # every doc identical: the maximal candidate blowup, all pairs hit
    ([(i, "a b c") for i in range(6)], 80),
]


@pytest.mark.parametrize("rows,t_pct", CASES)
def test_prefix_filter_equals_naive(spark, rows, t_pct):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in prefix_filter_neardups(
            df, "doc_id", "text", threshold_pct=t_pct
        ).collect()
    }
    assert got == _brute(rows, t_pct)


@pytest.mark.parametrize("rows,t_pct", CASES)
def test_prefix_filter_between_equals_naive_cross_side(spark, rows, t_pct):
    """The incremental form under the frozen BASE-df order: equals the
    naive cross-side join (new = even ids, base = odd ids)."""
    new_rows = [r for r in rows if r[0] % 2 == 0]
    base_rows = [r for r in rows if r[0] % 2 == 1]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    got = {
        (r["new_doc_id"], r["base_doc_id"])
        for r in prefix_filter_between(
            new, base, "doc_id", "text", threshold_pct=t_pct
        ).collect()
    }
    want = {
        (a, b) if a % 2 == 0 else (b, a)
        for (a, b) in _brute(rows, t_pct)
        if (a % 2 == 0) != (b % 2 == 0)
    }
    assert got == want
