"""PII detection/masking for web-text training pipelines (the public
Dolma/CCNet-style pre-processing step): emails, IPv4 addresses and
simple phone formats are counted and replaced with fixed mask tokens.

All work is JVM-side regexp expressions (no Python in the row path).
Patterns deliberately use only syntax with identical semantics in Java
regex (Spark) and RE2 (DuckDB) — no lookaround, no backrefs — so the
driver oracle replays them exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"

EMAIL_MASK = "<EMAIL>"
IPV4_MASK = "<IP>"
PHONE_MASK = "<PHONE>"


def mask_pii_col(text_col):
    """Masked text expression: email -> ip -> phone, in that order (the
    order is part of the contract — an email containing digits must be
    masked before the phone pattern can see it)."""
    out = F.regexp_replace(text_col, EMAIL_RE, EMAIL_MASK)
    out = F.regexp_replace(out, IPV4_RE, IPV4_MASK)
    return F.regexp_replace(out, PHONE_RE, PHONE_MASK)


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, masked_fp) — counts of each
    PII class plus the md5 of the masked text (scalar for the driver's
    canonicalizer; use mask_pii_col directly for the text itself).
    Pure per-row JVM expressions: no shuffle, no Python."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(
            F.regexp_replace(t, EMAIL_RE, EMAIL_MASK), F.lit(IPV4_RE)
        ).alias("n_ipv4"),
        F.regexp_count(
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, EMAIL_MASK),
                IPV4_RE,
                IPV4_MASK,
            ),
            F.lit(PHONE_RE),
        ).alias("n_phones"),
        F.md5(mask_pii_col(t)).alias("masked_fp"),
    )
