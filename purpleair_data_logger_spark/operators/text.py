"""Text-analysis operators for training-data pipelines (north star).

Language ID (stopword-vote heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting — all as
JVM-side expression pipelines (split / filter / regexp) so they run in
whole-stage codegen at 100 TB; no Python UDF in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword-vote
#: language heuristic. Deterministic and SQL-portable by design.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
    "it": ("il", "lo", "le", "e", "di"),
}

#: BPE-ish tokenizer regex: letter runs, digit runs, or single
#: non-space symbols — the usual pre-tokenization split.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(text_col: str | Column, sep: str = " ") -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, sep)


def whitespace_token_count(text_col: str | Column) -> Column:
    return F.size(tokens(text_col)).cast("long")


def bpe_token_count(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE)).cast("long")


def stopword_count(text_col: str | Column, stopwords: tuple[str, ...]) -> Column:
    toks = tokens(text_col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("long")


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality-scoring features: lengths, token stats, stopword ratio.

    Mirrors the standard pre-training quality filters (length bounds,
    symbol ratio, stopword presence). One narrow projection.
    """
    toks = tokens(text_col)
    n_toks = F.size(toks).cast("long")
    n_stop = stopword_count(text_col, LANG_STOPWORDS["en"])
    mean_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / n_toks.cast("double")
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars_computed"),
        n_toks.alias("n_tokens"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
        n_stop.alias("n_stopwords"),
        # No outer round(): both operands are exactly representable
        # integers, so the IEEE-754 quotient is bit-identical in any
        # engine — while round()-of-a-quotient differs between engines
        # on half-boundary values (Spark rounds the shortest decimal
        # repr, DuckDB the binary value).
        (n_stop.cast("double") / n_toks.cast("double")).alias("stopword_ratio"),
        mean_len.alias("mean_token_len"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language ID: argmax over per-language hit counts.

    Ties break by language code order (deterministic). 'und' when no
    list scores a hit.
    """
    scores = {
        lang: stopword_count(text_col, sw) for lang, sw in sorted(LANG_STOPWORDS.items())
    }
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    # reverse order so earlier languages win ties via later when() layering
    for lang in sorted(scores, reverse=True):
        pred = F.when(
            (scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)
        ).otherwise(pred)
    return df.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        best_score.alias("lang_score"),
    )


def normalize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Text normalization for dedup/training prep: lowercase, strip
    non-alphanumerics to spaces, collapse whitespace runs, trim.

    The canonical pre-pass before exact/minhash dedup — normalizing
    first turns case/punctuation variants into exact duplicates. Pure
    regexp pipeline, one narrow projection.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return df.select(
        F.col(id_col),
        norm.alias("normalized_text"),
        F.md5(norm).alias("normalized_md5"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, *, prefix_tokens: int = 16) -> DataFrame:
    """Document fingerprint: md5 over the normalized token prefix.

    A cheap rolling-hash-style identity for clustering/bucketing; md5 so
    external engines can reproduce it bit-for-bit.
    """
    toks = tokens(F.lower(F.col(text_col)))
    prefix = F.concat_ws(" ", F.slice(toks, 1, prefix_tokens))
    return df.select(
        F.col(id_col),
        F.md5(prefix).alias("fingerprint_md5"),
    )
