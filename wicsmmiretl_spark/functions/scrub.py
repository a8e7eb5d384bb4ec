"""PII scrubbing for training-data pipelines (north-star text op).

Redacts personally identifiable substrings — emails, phone numbers, IPv4
addresses — from a text column with pure Catalyst ``regexp_replace`` chains:
zero Python in the hot path, whole-stage-codegen friendly, and the patterns
are valid under both Java regex (Spark) and RE2 (DuckDB oracle).

Scale design: a per-row projection — no shuffle, no UDF, pushes through any
partitioning. At 100 TB this is scan-bound; the only cost lever is regex
complexity, so patterns are anchored, alternation-free, and applied in one
pass each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern order matters: emails are scrubbed before phones/IPs so an
# address-like local part (user.555@…) can't be half-eaten by a later rule.
# Kept deliberately simple + engine-portable; precision/recall tuning is a
# policy choice layered on top, not baked in.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+?\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
}


def pii_counts(text: Column | str) -> list[Column]:
    """Per-kind match counts on the ORIGINAL text (audit columns):
    n_email, n_phone, n_ipv4."""
    col = F.col(text) if isinstance(text, str) else text
    return [
        # explicit group 0: Spark requires it when the pattern has no groups
        F.size(F.regexp_extract_all(col, F.lit(pat), 0)).alias(f"n_{kind}")
        for kind, (pat, _) in PII_PATTERNS.items()
    ]


def scrub_text(text: Column | str) -> Column:
    """The redacted text column: every PII pattern replaced by its tag."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, tag in PII_PATTERNS.values():
        col = F.regexp_replace(col, pat, tag)
    return col


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str = "scrubbed") -> DataFrame:
    """Append ``out_col`` (redacted text) and n_email/n_phone/n_ipv4 audit
    counts. Counts are measured before redaction, so `n_* > 0` rows can be
    routed to review even though their text is already clean."""
    return df.select(
        "*",
        scrub_text(F.col(text_col)).alias(out_col),
        *pii_counts(F.col(text_col)),
    )
