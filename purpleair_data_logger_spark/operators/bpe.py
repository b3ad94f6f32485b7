"""Byte-pair-encoding tokenizer training and corpus encoding, with the
work split the way a 100 TB deployment splits it (the SentencePiece /
HF-tokenizers architecture, re-expressed on Spark):

* the CORPUS-SCALE stage — word counting — is one map-side-combined
  hash aggregate over the documents (the only pass that touches every
  byte);
* the TRAINING loop runs over the resulting word-frequency table,
  which is bounded by construction (``top_m`` most frequent words —
  the standard truncation every practical BPE trainer applies): a
  driver-local loop over ≤ top_m rows, exactly like `similarity.py`'s
  IVF quantizer training collects its bounded sample. No per-merge
  Spark job: 30 000 merges as 30 000 distributed rounds over a 50 k-row
  table would be pure scheduler overhead;
* ENCODING touches Python only on the DISTINCT-WORD table (vocab-sized,
  Arrow-batched), then broadcasts word → token-ids back onto the
  corpus as an equi-join. A 100 TB corpus has millions of distinct
  words but trillions of word occurrences — encoding each occurrence
  in Python would be the classic row-at-a-time mistake; encoding each
  distinct word once and joining is the scale path.

North-star extension (BASELINE.json tokenizer surface); no reference
analog — the reference stores raw sensor text fields only
(PurpleAirPSQLTableStatements.py field lists).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators.text import tokens

#: End-of-word sentinel symbol (Sennrich et al. 2016 convention): lets
#: merges distinguish word-final from word-internal contexts and makes
#: decoding unambiguous.
EOW = "</w>"


def word_frequency_table(
    df: DataFrame, text_col: str, *, top_m: int = 30_000
) -> DataFrame:
    """The one corpus-scale pass: whitespace word counts, truncated to
    the ``top_m`` most frequent words (ties broken lexicographically so
    the table — and therefore the trained tokenizer — is deterministic
    across partitionings, reruns, and engines).

    Plan: explode → groupBy(word) with partial aggregation (a word
    repeated 10⁹ times ships one row per map task), then
    orderBy+limit = TakeOrderedAndProject — a per-partition top-m
    merged on the driver, never a global sort of the vocabulary.
    """
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(top_m)
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    counts: Counter = Counter()
    for symbols, freq in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] += freq
    return counts


def _merge_word(
    symbols: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """One left-to-right greedy non-overlapping merge pass."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_counts: DataFrame | Iterable[tuple[str, int]],
    *,
    num_merges: int = 200,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word-frequency table.

    Accepts the DataFrame from `word_frequency_table` (collected here —
    bounded by its ``top_m`` contract, the same bounded-aggregate
    collect the IVF quantizer makes) or any (word, freq) iterable.
    Deterministic: the best pair each round is (count DESC, pair ASC),
    so equal-count ties never depend on dict ordering.

    Returns the ranked merge list — the tokenizer artifact. Train once,
    persist, encode forever (the frozen-vocabulary discipline
    `encode_with_vocabulary` already follows).
    """
    if isinstance(word_counts, DataFrame):
        rows = [(r["word"], r["freq"]) for r in word_counts.collect()]
    else:
        rows = list(word_counts)
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in rows:
        vocab[tuple(word) + (EOW,)] = vocab.get(tuple(word) + (EOW,), 0) + int(freq)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best_count = max(counts.values())
        best = min(p for p, c in counts.items() if c == best_count)
        merges.append(best)
        vocab = {_merge_word(s, best): f for s, f in vocab.items()}
    return merges


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word with a ranked merge list (training-order
    application — each merge replayed in the order it was learned,
    the original Sennrich inference rule)."""
    symbols = tuple(word) + (EOW,)
    for pair in merges:
        if len(symbols) == 1:
            break
        symbols = _merge_word(symbols, pair)
    return list(symbols)


def encode_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize the corpus with a trained merge list.

    Shape: Python (Arrow-batched `mapInPandas`) runs ONLY over the
    distinct-word table; the corpus-side work is a posexplode, an
    equi-join word → subword array (broadcast while the vocabulary
    fits, AQE otherwise), and an order-restoring
    array_sort(collect_list(struct(pos, …))) reassembly — the same
    reassembly contract `paragraph_dedup` and `encode_with_vocabulary`
    use. Unknown words cannot occur (the distinct table derives from
    the same corpus).

    Output: one row per document — ``bpe_tokens`` (the subword
    sequence) and ``n_bpe_tokens``.
    """
    spark = df.sparkSession
    merges_b = spark.sparkContext.broadcast(list(merges))

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ms = merges_b.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "subwords": [apply_merges(w, ms) for w in pdf["word"]],
                }
            )

    words = df.select(F.explode(tokens(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    distinct_words = words.distinct()
    encoded_words = distinct_words.mapInPandas(
        encode_batch, "word string, subwords array<string>"
    )

    positions = df.select(
        F.col(id_col),
        F.posexplode(F.filter(tokens(text_col), lambda t: t != "")).alias(
            "pos", "word"
        ),
    )
    return (
        positions.join(encoded_words, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "subwords"))
                    ),
                    lambda s: s["subwords"],
                )
            ).alias("bpe_tokens")
        )
        .select(
            id_col,
            "bpe_tokens",
            F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
    )
