"""BPE tokenizer training/encoding tests: merge-list parity with an
independently-written reference trainer, the classic Sennrich fixture,
and the corpus-encode path (Python only on distinct words)."""

from __future__ import annotations

from collections import Counter

from purpleair_data_logger_spark.operators import bpe


def _reference_bpe(word_freqs: dict[str, int], num_merges: int):
    """Independent trainer: same (count DESC, pair ASC) policy,
    different implementation (list-of-lists, re-splitting each round)."""
    words = [(list(w) + [bpe.EOW], f) for w, f in word_freqs.items()]
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(sorted(pairs), key=lambda p: (-pairs[p], p))
        merges.append(best)
        new_words = []
        for syms, f in words:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, f))
        words = new_words
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_matches_independent_reference_on_sennrich_corpus():
    got = bpe.train_bpe(SENNRICH.items(), num_merges=10)
    want = _reference_bpe(SENNRICH, 10)
    assert got == want
    # the famous first merges: 'es' (9 = 6+3), then 'est', then 'est</w>'
    assert got[:3] == [("e", "s"), ("es", "t"), ("est", bpe.EOW)]


def test_apply_merges_greedy_left_to_right_non_overlapping():
    # merge (a,a) over "aaaa</w>": greedy pairs -> ["aa","aa","</w>"]
    assert bpe._merge_word(("a", "a", "a", "a", bpe.EOW), ("a", "a")) == (
        "aa",
        "aa",
        bpe.EOW,
    )
    # odd run: ["aa","a","</w>"]
    assert bpe._merge_word(("a", "a", "a", bpe.EOW), ("a", "a")) == (
        "aa",
        "a",
        bpe.EOW,
    )


def test_encode_roundtrips_and_marks_word_boundaries():
    merges = bpe.train_bpe(SENNRICH.items(), num_merges=10)
    toks = bpe.apply_merges("lowest", merges)
    # concatenation restores the word + sentinel: lossless tokenization
    assert "".join(toks) == "lowest" + bpe.EOW
    assert toks[-1].endswith(bpe.EOW)


def test_word_frequency_table_deterministic_truncation(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a c d")], "doc_id long, text string"
    )
    rows = bpe.word_frequency_table(df, "text", top_m=3).collect()
    # count desc, word asc: a(3), b(3) tie -> lexicographic; then c(2)
    assert [(r["word"], r["freq"]) for r in rows] == [
        ("a", 3),
        ("b", 3),
        ("c", 2),
    ]


def test_encode_corpus_matches_local_application(spark):
    docs = [
        (1, "low lower newest"),
        (2, "widest low low"),
        (3, "newest newest widest lower"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wf = bpe.word_frequency_table(df, "text", top_m=100)
    merges = bpe.train_bpe(wf, num_merges=8)
    got = {
        r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
        for r in bpe.encode_corpus(df, "doc_id", "text", merges).collect()
    }
    for doc_id, text in docs:
        want = [
            t for w in text.split(" ") for t in bpe.apply_merges(w, merges)
        ]
        assert got[doc_id] == (want, len(want)), doc_id


def test_encode_corpus_python_only_touches_distinct_words(spark):
    from purpleair_data_logger_spark.plans import explain as E

    df = spark.createDataFrame(
        [(1, "low lower"), (2, "low widest")], "doc_id long, text string"
    )
    merges = [("l", "o")]
    plan = E.formatted_plan(bpe.encode_corpus(df, "doc_id", "text", merges))
    # exactly one Arrow-batched Python stage, fed by the distinct-word
    # aggregate — the corpus (posexplode) branch stays JVM-only
    import re

    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "BatchEvalPython" not in plan
    assert "posexplode" in plan
