"""Unit tests for the privacy/decontamination/sampling curation
operators (PII scrub, benchmark n-gram contamination, deterministic
hash sampling). Their catalog gate queries are oracle-hashed by the
driver; these tests pin the operator semantics directly on crafted
rows, where the expected outcome is readable."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from purpleair_data_logger_spark.io import load_table
from purpleair_data_logger_spark.operators import pii
from purpleair_data_logger_spark.operators import sampling as smp
from purpleair_data_logger_spark.operators import text as tx


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c%d@sub.example.org then call 555-123-4567 ok"),
            (2, "server 192.168.0.1 and 10.0.0.255 no mail"),
            (3, "clean text without identifiers"),
            (4, "two mails x@y.io z@w.co and 1.2.3.4"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii.scrub_pii(df, "doc_id", "text").collect()}
    assert rows[1]["clean_text"] == "mail <EMAIL> then call <PHONE> ok"
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_ipv4"]) == (1, 1, 0)
    assert rows[2]["clean_text"] == "server <IP> and <IP> no mail"
    assert rows[2]["n_ipv4"] == 2
    assert rows[3]["clean_text"] == "clean text without identifiers"
    assert (rows[3]["n_emails"], rows[3]["n_phones"], rows[3]["n_ipv4"]) == (0, 0, 0)
    assert rows[4]["clean_text"] == "two mails <EMAIL> <EMAIL> and <IP>"
    # no pattern may survive its own scrub
    for r in rows.values():
        for pat in (pii.EMAIL_RE, pii.PHONE_RE, pii.IPV4_RE):
            assert not re.search(pat, r["clean_text"])


def test_ngram_contamination_flags_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # contains the bench 4-gram twice-distinct? once
            (2, "zeta eta theta iota kappa"),  # disjoint
            (3, "x alpha beta gamma delta y alpha beta gamma delta"),  # same gram repeated -> 1 distinct
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta UNSEEN")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_contaminated"]
        for r in tx.ngram_contamination(corpus, bench, "doc_id", "text", n=4).collect()
    }
    # bench 4-grams: {alpha beta gamma delta, beta gamma delta UNSEEN}
    assert got == {1: 1, 3: 1}  # doc 2 absent; repeated gram counted once


def test_deterministic_sample_stable_and_consistent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = {r["doc_id"] for r in smp.deterministic_sample(docs, "doc_id", 3000).collect()}
    s2 = {
        r["doc_id"]
        for r in smp.deterministic_sample(
            docs.repartition(7), "doc_id", 3000
        ).collect()
    }
    assert s1 == s2, "sample must be invariant to partitioning"
    # nested property: a lower rate yields a strict subset
    s_small = {
        r["doc_id"] for r in smp.deterministic_sample(docs, "doc_id", 1000).collect()
    }
    assert s_small <= s1
    # rate is roughly honored (md5 buckets are uniform)
    n = docs.count()
    assert 0.2 * n <= len(s1) <= 0.4 * n


def test_stratified_sample_respects_per_stratum_rates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 0, "de": 10_000}
    got = smp.stratified_sample(
        docs, "doc_id", "lang", rates, default_bp=0
    ).groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    n_de = docs.filter(F.col("lang") == "de").count()
    assert counts == {"de": n_de}, "de kept fully, everything else dropped"


def test_paragraph_dedup_keeps_global_first_occurrence(spark):
    from purpleair_data_logger_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [
            (1, "unique one\nBOILER\nunique two"),
            (2, "BOILER\nunique three"),
            (3, "BOILER"),  # everything dropped -> empty reassembly
            (4, "unique four\nunique four"),  # in-doc repeat: first pos wins
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dd.paragraph_dedup(df, "doc_id", "text").collect()
    }
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows[1]["clean_md5"] == md5("unique one\nBOILER\nunique two")
    assert (rows[1]["n_kept_paragraphs"], rows[1]["n_dropped_paragraphs"]) == (3, 0)
    assert rows[2]["clean_md5"] == md5("unique three")
    assert rows[2]["n_dropped_paragraphs"] == 1
    assert rows[3]["clean_md5"] == md5("")
    assert (rows[3]["n_kept_paragraphs"], rows[3]["n_dropped_paragraphs"]) == (0, 1)
    assert rows[4]["clean_md5"] == md5("unique four")
    assert (rows[4]["n_kept_paragraphs"], rows[4]["n_dropped_paragraphs"]) == (1, 1)


def test_assign_split_is_total_and_partition_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    splits = [("train", 9000), ("val", 500), ("test", 500)]
    a = {r["doc_id"]: r["split"] for r in smp.assign_split(docs, "doc_id", splits).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in smp.assign_split(docs.repartition(5), "doc_id", splits).collect()
    }
    assert a == b, "assignment must not depend on partitioning"
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == docs.count()
    # sampling a split then re-assigning keeps membership stable
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.8 * len(a) <= n_train <= 0.97 * len(a)


def test_gopher_gate_each_rule_triggers_on_planted_doc(spark):
    """One planted violator per rule family; the clean doc passes all
    ten flags. Thresholds here are the operator defaults (Rae et al.
    2021 values) except where noted."""
    the_clean = "the be to of and " + " ".join(
        f"word{i}" for i in range(50)
    )  # 55 distinct words: no dup n-grams, stopwords present, mean len ~5
    rows = [
        (1, the_clean),
        (2, "short text only"),                                   # word_count
        (3, ("a b c d " * 15).strip()),                           # mean_word_len < 3
        (4, ("the " + "#### " * 30 + "end " * 25).strip()),       # symbol ratio
        (5, "\n".join(["- bullet line item here"] * 10)),         # bullet lines
        (6, "\n".join(["the line trails off..."] * 10)),          # ellipsis lines
        (7, ("the " + "123 456 789 000 " * 15).strip()),          # alpha fraction
        (8, ("lorem ipsum dolor sit amet " * 12).strip()),        # no stopwords
        (9, ("the " * 60).strip()),                               # top-token share
    ]
    out = {
        r["doc_id"]: r
        for r in tx.gopher_quality_gate(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            min_words=10,  # planted docs are short; bounds still bite doc 2
        ).collect()
    }
    assert out[1]["gopher_pass"], out[1]
    assert all(out[1][f] for f in out[1].asDict() if f.endswith("_ok"))
    assert not out[2]["word_count_ok"]
    assert not out[3]["mean_word_len_ok"]
    assert not out[4]["symbol_ratio_ok"]
    assert not out[5]["bullet_lines_ok"]
    assert not out[6]["ellipsis_lines_ok"]
    assert not out[7]["alpha_words_ok"]
    assert not out[8]["stopwords_ok"]
    assert not out[9]["top_token_ok"]
    assert not out[9]["dup_2gram_ok"]  # "the the" repeats wall-to-wall
    for i in range(2, 10):
        assert not out[i]["gopher_pass"], i


def test_keyword_extraction_ranks_rare_terms_first(spark):
    """A term unique to one doc must outrank corpus-wide terms; ranks
    are contiguous from 1 and scores non-increasing."""
    rows = [
        (1, "the cat sat on the mat with the zyzzyva"),
        (2, "the dog sat on the rug"),
        (3, "the bird sat on the wire"),
    ]
    out = tx.keyword_extraction(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
        top_k=3,
    ).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["keyword_rank"])
        assert [r["keyword_rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
    # every top-3 slot goes to a doc-unique term (df=1): rare terms
    # outrank 'the' (tf=3 but df=3) and 'sat'/'on' (df=3); ties among
    # equal-salience terms break alphabetically (deterministic)
    assert all(r["df"] == 1 for r in by_doc[1])
    assert by_doc[1][0]["tok"] == "cat"
    # doc 2 has only two unique terms; they take the top slots ahead of
    # 'the' (tf=2) which legitimately fills slot 3
    assert {r["tok"] for r in by_doc[2][:2]} == {"dog", "rug"}
    assert by_doc[2][2]["tok"] == "the"


def test_value_histogram_bins_and_bounds(spark):
    rows = [("a", -7.5), ("a", -0.1), ("a", 0.0), ("a", 4.99), ("a", 5.0), ("b", 12.0), ("b", None)]
    from purpleair_data_logger_spark.operators import aggregations as agg

    out = {
        (r["event_type"], r["bin"]): r
        for r in agg.value_histogram(
            spark.createDataFrame(rows, "event_type string, value double"),
            "event_type",
            "value",
            bin_width=5.0,
        ).collect()
    }
    assert out[("a", -2)]["n"] == 1          # -7.5 -> floor(-1.5) = -2
    assert out[("a", -1)]["n"] == 1          # -0.1
    assert out[("a", 0)]["n"] == 2           # 0.0, 4.99
    assert out[("a", 1)]["n"] == 1           # 5.0 (left-closed bins)
    assert out[("b", 2)]["n"] == 1           # 12.0; NULL excluded
    assert out[("a", 0)]["bin_lo"] == 0.0 and out[("a", 0)]["bin_hi"] == 5.0
    assert len(out) == 5


def test_containment_flags_subset_doc_jaccard_misses(spark):
    """A document fully quoted inside a similar-sized wrapper must clear
    the containment threshold while its Jaccard sits below it."""
    from purpleair_data_logger_spark.operators import dedup as dd

    core = " ".join(f"tok{i}" for i in range(40))
    wrapper = core + " " + " ".join(f"extra{i}" for i in range(14))
    rows = [(1, core), (2, wrapper)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = dd.containment_lsh_verified(df, "doc_id", "text", threshold=0.95)
    got = {(r["doc_id_a"], r["doc_id_b"]): r["containment"] for r in cont.collect()}
    assert (1, 2) in got and got[(1, 2)] == 1.0  # core ⊂ wrapper exactly
    jac = dd.neardup_lsh_verified(df, "doc_id", "text", threshold=0.95)
    assert jac.count() == 0  # Jaccard ≈ 38/52 — under-scores the subset


def test_bounded_range_join_rejects_nonpositive_gap(spark):
    import pytest as _pytest

    from purpleair_data_logger_spark.operators.rangejoin import bounded_range_join

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "k long, ts string"
    )
    for bad in (0, -5):
        with _pytest.raises(ValueError, match="gap_seconds"):
            bounded_range_join(df, df, ["k"], "ts", "ts", gap_seconds=bad)


def test_cross_doc_dup_ngrams_planted(spark):
    """Planted corpus: a shared license header (one 5-gram window in a
    10-token doc has 6 grams; header spans the first 8 tokens of docs
    1 and 2), a doc too short for any 5-gram, and a fully unique doc."""
    header = "lic a b c d e f g"  # 8 tokens -> 4 shared 5-grams per doc
    df = spark.createDataFrame(
        [
            (1, header + " one two"),    # 10 toks, 6 grams, 4 shared
            (2, header + " three four"), # 10 toks, 6 grams, 4 shared
            (3, "totally unique text of nine plain words here now"),
            (4, "short doc"),            # < 5 tokens: no row
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in tx.cross_doc_dup_ngrams(df, "doc_id", "text", n=5).collect()
    }
    assert set(got) == {1, 2, 3}
    for d in (1, 2):
        assert got[d]["ngram_occurrences"] == 6
        assert got[d]["cross_dup_occurrences"] == 4
        assert got[d]["cross_dup_frac"] == 4 / 6
        assert got[d]["max_gram_docs"] == 2
    assert got[3]["cross_dup_occurrences"] == 0
    assert got[3]["cross_dup_frac"] == 0.0
    assert got[3]["max_gram_docs"] == 1


def test_cross_doc_dup_counts_occurrences_not_grams(spark):
    """A doc repeating a shared gram twice contributes 2 occurrences
    to its numerator, and still counts once toward gram_docs."""
    g = "v w x y z"
    df = spark.createDataFrame(
        [(1, f"{g} pad {g}"), (2, f"{g} other tail words")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in tx.cross_doc_dup_ngrams(df, "doc_id", "text", n=5).collect()
    }
    # doc 1: 11 tokens -> 7 grams; "v w x y z" occurs at positions 1 and 7
    assert got[1]["cross_dup_occurrences"] == 2
    assert got[1]["max_gram_docs"] == 2
    assert got[2]["cross_dup_occurrences"] == 1


def test_unigram_rarity_planted(spark):
    """3-doc corpus with hand-computable counts: c(common)=4, c(mid)=2,
    c(rare1)=c(rare2)=1, N=8."""
    df = spark.createDataFrame(
        [
            (1, "common common mid rare1"),
            (2, "common mid"),
            (3, "common rare2"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in tx.unigram_rarity(df, "doc_id", "text", rare_max_tf=1).collect()
    }
    # doc 1: tokens (4,4,2,1) -> mean prob = 11/(4*8); rare = 1/4; min=1
    assert got[1]["n_tokens"] == 4
    assert got[1]["mean_corpus_prob"] == 11 / 32
    assert got[1]["rare_token_frac"] == 0.25
    assert got[1]["min_corpus_tf"] == 1
    # doc 2: (4,2) -> 6/16; no rare; min=2
    assert got[2]["mean_corpus_prob"] == 6 / 16
    assert got[2]["rare_token_frac"] == 0.0
    assert got[2]["min_corpus_tf"] == 2
    # doc 3: (4,1) -> 5/16; rare 1/2
    assert got[3]["mean_corpus_prob"] == 5 / 16
    assert got[3]["rare_token_frac"] == 0.5
    assert got[3]["min_corpus_tf"] == 1


def test_cross_doc_span_removal_planted(spark):
    """Shared 8-token header across docs 1 and 2 is fully covered by
    its run of shared 5-grams and removed from both; unique tails
    survive; untouched docs pass through byte-identical."""
    from purpleair_data_logger_spark.operators import dedup as dd

    header = "lic a b c d e f g"
    df = spark.createDataFrame(
        [
            (1, header + " one two"),
            (2, header + " three four"),
            (3, "totally unique text of nine plain words here now"),
            (4, "tiny doc"),  # < 5 tokens: passes through
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dd.remove_cross_doc_spans(df, "doc_id", "text", n=5).collect()
    }
    assert got[1]["clean_text"] == "one two"
    assert got[2]["clean_text"] == "three four"
    assert got[1]["n_removed_tokens"] == 8 and got[2]["n_removed_tokens"] == 8
    assert got[3]["clean_text"] == "totally unique text of nine plain words here now"
    assert got[3]["n_removed_tokens"] == 0
    assert got[4]["clean_text"] == "tiny doc"
    assert got[4]["n_tokens"] == 2


def test_cross_doc_span_removal_full_coverage_empty(spark):
    """Two identical 5-token docs are 100% covered -> clean_text ''."""
    from purpleair_data_logger_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [(1, "p q r s t"), (2, "p q r s t")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in dd.remove_cross_doc_spans(df, "doc_id", "text", n=5).collect()}
    for d in (1, 2):
        assert got[d]["clean_text"] == ""
        assert got[d]["n_removed_tokens"] == 5


def test_cross_doc_span_removal_boundary_tokens_survive(spark):
    """A shared interior span embedded in different contexts: only the
    tokens covered by FULL shared 5-grams go — the shared run here is
    exactly 5 tokens, so surrounding unique context survives."""
    from purpleair_data_logger_spark.operators import dedup as dd

    span = "s1 s2 s3 s4 s5"
    df = spark.createDataFrame(
        [(1, f"left1 left2 {span} right1"), (2, f"intro {span} outro1 outro2")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dd.remove_cross_doc_spans(df, "doc_id", "text", n=5).collect()}
    assert got[1]["clean_text"] == "left1 left2 right1"
    assert got[2]["clean_text"] == "intro outro1 outro2"


def test_encode_with_vocabulary_planted(spark):
    """4-doc corpus with a hand-computable vocab: ranks by (tf desc,
    tok asc); OOV maps to 0; order is preserved."""
    df = spark.createDataFrame(
        [
            (1, "b a b c"),
            (2, "a b zz"),
            (3, "c a"),
        ],
        "doc_id long, text string",
    )
    # tf: b=3, a=3, c=2, zz=1 -> ranks (desc tf, asc tok): a=1, b=2, c=3
    got = {
        r["doc_id"]: r
        for r in tx.encode_with_vocabulary(df, "doc_id", "text", top_k=3).collect()
    }
    assert got[1]["token_ids"] == "2,1,2,3"
    assert got[1]["n_oov"] == 0 and got[1]["n_tokens"] == 4
    assert got[2]["token_ids"] == "1,2,0"  # zz outside top-3 -> OOV
    assert got[2]["n_oov"] == 1
    assert got[3]["token_ids"] == "3,1"


def _naive_span_removal(docs: dict[int, str], n: int) -> dict[int, tuple]:
    """Reference implementation: positions covered by any n-gram that
    appears (as a token run) in >= 2 distinct documents."""
    grams: dict[tuple, set] = {}
    toks = {d: t.split(" ") for d, t in docs.items()}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            grams.setdefault(tuple(ts[i : i + n]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        covered: set[int] = set()
        for i in range(len(ts) - n + 1):
            if len(grams[tuple(ts[i : i + n])]) >= 2:
                covered.update(range(i, i + n))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[d] = (len(ts), len(covered), " ".join(kept))
    return out


def test_cross_doc_span_removal_property(spark):
    """Randomized corpora from a tiny alphabet (forcing heavy gram
    collisions) must match the naive reference on every doc."""
    import random

    from purpleair_data_logger_spark.operators import dedup as dd

    rng = random.Random(417)
    for trial in range(4):
        docs = {
            d: " ".join(
                rng.choice("abcde") for _ in range(rng.randint(1, 18))
            )
            for d in range(1, 11)
        }
        n = rng.choice([2, 3])
        expect = _naive_span_removal(docs, n)
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed_tokens"], r["clean_text"])
            for r in dd.remove_cross_doc_spans(
                df, "doc_id", "text", n=n
            ).collect()
        }
        for d in docs:
            if len(docs[d].split(" ")) < n:
                assert d not in got or got[d][1] == 0
                continue
            assert got[d] == expect[d], (trial, d, docs[d])


def test_token_budget_sample_prefix_and_budget(spark):
    """Selected docs = exactly the prefix hash-buckets whose cumulative
    token count fits the budget (naive reference), total never exceeds
    the budget, unbudgeted strata are excluded, and the selection is
    partitioning-invariant."""
    import hashlib
    import random

    rng = random.Random(99)
    rows = [
        (i, rng.choice(["en", "de", "zz"]), rng.randint(5, 60))
        for i in range(1, 161)
    ]
    budgets = {"en": 400, "de": 250}
    n_buckets = 8

    def bucket(i: int) -> int:
        return (
            int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % n_buckets
        )

    # naive reference: per-stratum bucket sums -> cum -> prefix cut
    expect: set[int] = set()
    for s, budget in budgets.items():
        sums: dict[int, int] = {}
        for i, lang, nt in rows:
            if lang == s:
                sums[bucket(i)] = sums.get(bucket(i), 0) + nt
        cum = 0
        kept_buckets = set()
        for b in sorted(sums):
            cum += sums[b]
            if cum > budget:
                break
            kept_buckets.add(b)
        expect |= {
            i for i, lang, _ in rows if lang == s and bucket(i) in kept_buckets
        }

    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    for layout in (df, df.repartition(7, "n_tokens")):
        got = smp.token_budget_sample(
            layout, "doc_id", "n_tokens", "lang", budgets, n_buckets=n_buckets
        ).collect()
        assert {r["doc_id"] for r in got} == expect
        assert not any(r["lang"] == "zz" for r in got)
        by_lang: dict[str, int] = {}
        for r in got:
            by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_tokens"]
        for s, tot in by_lang.items():
            assert tot <= budgets[s]


def test_quality_classifier_margin_hand_computed(spark):
    """Margin equals the hand-evaluated linear form in the documented
    fold order; decision boundary behaves."""
    df = spark.createDataFrame(
        [
            (1, "the a of and to"),      # all stopwords: sr=1, ml=2.2, nt=5
            (2, "zzzz yyyy xxxx wwww"),  # no stopwords: sr=0, ml=4, nt=4
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in tx.quality_classifier_score(df, "doc_id", "text").collect()
    }
    m1 = ((0.6 + -0.35 * 2.2) + 0.01 * 5.0) + 8.0 * 1.0
    m2 = ((0.6 + -0.35 * 4.0) + 0.01 * 4.0) + 8.0 * 0.0
    assert got[1]["margin"] == m1 and got[1]["quality_pass"] is True
    assert got[2]["margin"] == m2 and got[2]["quality_pass"] is False


def test_bigram_lm_fluency_planted(spark):
    # Three docs over a tiny corpus: d1 and d2 share the fluent
    # transition "the cat"; d3 is the same unigrams as d1 shuffled
    # into an unattested order. The bigram model must rank d3 below
    # d1 even though a unigram model scores them identically.
    df = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "sat the cat"),  # still ends in the attested "the cat"
            (4, "cat the sat"),  # true salad: every transition is a hapax
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.bigram_lm_score(df, "doc_id", "text").collect()}
    # corpus bigram counts: (the,cat)=3 [d1,d2,d3], (cat,sat)=1, (cat,ran)=1,
    # (sat,the)=1, (cat,the)=1, (the,sat)=1
    # ctx counts: c1(the)=4, c1(cat)=3, c1(sat)=1
    assert out[1]["n_bigrams"] == 2
    # d1: positions (the,cat):c2=3,c1(the)=4; (cat,sat):c2=1,c1(cat)=3
    assert out[1]["cond_prob_wmean"] == (3 + 1) / (4 + 3)
    assert out[1]["seen_bigram_frac"] == 0.5  # only (the,cat) reaches tf>=2
    assert out[1]["min_bigram_tf"] == 1
    # d4 is pure salad: every transition is a corpus hapax
    assert out[4]["cond_prob_wmean"] == (1 + 1) / (3 + 4)
    assert out[4]["seen_bigram_frac"] == 0.0
    assert out[4]["min_bigram_tf"] == 1
    # fluent doc outranks the salad on both signals
    assert out[1]["cond_prob_wmean"] > out[4]["cond_prob_wmean"]
    assert out[1]["seen_bigram_frac"] > out[4]["seen_bigram_frac"]


def test_bigram_lm_plan_is_join_attach_no_window(spark, sf_dir):
    from purpleair_data_logger_spark.plans import explain as E

    df = tx.bigram_lm_score(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    plan = E.formatted_plan(df)
    assert "Window" not in plan  # hot bigrams attach by join, never a window
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_substring_search_counts_and_fallback(spark):
    """text.substring_search: exact non-overlapping occurrence counts,
    full-coverage gram pruning (a doc with SOME query grams but not
    the literal is excluded), NULL text/id carry no observation, and
    sub-gram_n queries fall back to the verify scan."""
    from purpleair_data_logger_spark.operators.text import substring_search

    docs = spark.createDataFrame(
        [
            (1, "xx scan merge yy scan merge zz"),   # 2 occurrences
            (2, "scan then merge"),                  # grams differ -> excluded
            (3, "a scan merger"),                    # contains as prefix: 1
            (4, None),
            (None, "scan merge"),
            (5, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in substring_search(docs, "doc_id", "text", "scan merge").collect()
    }
    assert got == {1: 2, 3: 1}
    # short query: fallback path, same output contract
    got2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in substring_search(docs, "doc_id", "text", "zz").collect()
    }
    assert got2 == {1: 1}


def test_substring_search_short_docs_skip_gram_pass(spark):
    """ADVICE r8: docs shorter than gram_n cannot contain the query —
    they are filtered BEFORE gram generation (Spark's sequence(1, 0)
    is the DESCENDING [1, 0], which fabricated truncated grams for
    every short/empty doc). Results are unchanged; this pins the
    empty/short-doc behavior end-to-end."""
    from purpleair_data_logger_spark.operators.text import substring_search

    docs = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, "needle"), (4, "a needle b")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in substring_search(docs, "doc_id", "text", "needle").collect()
    }
    assert got == {3: 1, 4: 1}


def test_temperature_budgets_and_sample(spark):
    """mT5-style temperature mixture: alpha=1 reproduces the natural
    proportions, alpha=0.5 upweights the low-resource stratum (and
    surfaces its repetition demand when the allocation exceeds its
    supply), and the composed sampler never exceeds a stratum's capped
    budget. Exact expectations: n=(900,100), total=500 ->
    alpha=1: (450,50); alpha=0.5: weights (30,10) -> (375,125),
    b capped at 100 with repetition demand 25."""
    import pytest

    from purpleair_data_logger_spark.operators import sampling as smp

    rows = [(i, "a", 100) for i in range(9)] + [(100, "b", 100)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_tok long")

    nat = {
        r["domain"]: (r["budget"], r["budget_capped"])
        for r in smp.temperature_budgets(
            df, "n_tok", "domain", total_budget=500, alpha=1.0
        ).collect()
    }
    assert nat == {"a": (450, 450), "b": (50, 50)}

    hot = {
        r["domain"]: (r["stratum_tokens"], r["budget"], r["budget_capped"])
        for r in smp.temperature_budgets(
            df, "n_tok", "domain", total_budget=500, alpha=0.5
        ).collect()
    }
    assert hot == {"a": (900, 375, 375), "b": (100, 125, 100)}
    # repetition demand = budget - budget_capped = 25 for b, visible

    picked = smp.temperature_token_sample(
        df, "doc_id", "n_tok", "domain",
        total_budget=500, alpha=0.5, n_buckets=4,
    )
    per = {
        r["domain"]: r["tok"]
        for r in picked.groupBy("domain")
        .agg(F.sum("n_tok").alias("tok"))
        .collect()
    }
    assert per.get("a", 0) <= 375 and per.get("b", 0) <= 100
    assert per.get("b", 0) == 100  # capped budget fully realizable

    with pytest.raises(ValueError, match="alpha"):
        smp.temperature_budgets(
            df, "n_tok", "domain", total_budget=500, alpha=0.0
        )
    with pytest.raises(ValueError, match="total_budget"):
        smp.temperature_budgets(
            df, "n_tok", "domain", total_budget=-1, alpha=0.5
        )
