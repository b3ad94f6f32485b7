"""PII scrubbing for training-data curation (north star).

Redacts emails, North-American phone numbers, and IPv4 addresses from a
text column and counts each hit — the standard pre-training privacy
pass. Pure `regexp_replace` / `regexp_count` expression pipeline, so it
runs in whole-stage codegen at 100 TB with zero Python in the hot path
and one narrow projection per document (no explode, no shuffle).

The patterns deliberately use only portable regex constructs (character
classes, bounded repetition, `\\b`) that mean the same thing to Java
regex (Spark) and RE2 (DuckDB), so the whole scrub is replayable by the
driver's oracle SQL bit-for-bit, including the md5 of the scrubbed
text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: portable PII patterns (Java regex == RE2 semantics for these).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

#: redaction tokens, chosen to never re-match any PII pattern.
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IPV4_TOKEN = "<IP>"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(text_col: str | Column) -> dict[str, Column]:
    """Per-category PII hit counts (long), computed on the RAW text."""
    c = _c(text_col)
    return {
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("long"),
        "n_phones": F.regexp_count(c, F.lit(PHONE_RE)).cast("long"),
        "n_ipv4": F.regexp_count(c, F.lit(IPV4_RE)).cast("long"),
    }


def scrub_text(text_col: str | Column) -> Column:
    """Redact emails → phones → IPv4, in that order.

    Email first so an address containing digits is redacted whole
    before the narrower numeric patterns see it; the redaction tokens
    themselves can never re-match a pattern, so the passes compose
    order-independently for disjoint matches.
    """
    c = _c(text_col)
    c = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    c = F.regexp_replace(c, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(c, IPV4_RE, IPV4_TOKEN)


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, clean_text, n_emails, n_phones, n_ipv4) per document."""
    counts = pii_counts(text_col)
    return df.select(
        F.col(id_col),
        scrub_text(text_col).alias("clean_text"),
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ipv4"].alias("n_ipv4"),
    )
