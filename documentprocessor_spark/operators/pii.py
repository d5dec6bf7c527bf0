"""PII detection/redaction over the text column — a standard stage of every
large-scale web-text training pipeline (emails, phone numbers, IP addresses
scrubbed before training; cf. the C4/RefinedWeb/FineWeb processing recipes).

Reference parity: the reference DECLARES phone/email patterns in its field
extractor (``field_extractor.py:38-39``) but never wires them to any output
(SURVEY §2.7 "never used downstream") — this module is the wired, scaled
version of that declared surface. Its email pattern is the reference's with
RFC-bounded quantifiers (see below — the unbounded form is quadratic on
crawl-scale junk tokens); its phone pattern narrows the reference's
optional-separator form to the separated shapes that are unambiguous inside
running text (``555-123-4567`` / ``555.123.4567`` — the reference's
``\\d{3}\\d{3}\\d{4}`` branch would clip any 10-digit number).

Spark-first: pure native column expressions (`regexp_count` /
`regexp_replace`), fully inside whole-stage codegen — a map-only stage with
zero Python in the hot path, exactly like textstats. The patterns stick to
the regex subset common to Java regex (Spark), RE2 (DuckDB) and Python
`re` — no lookarounds, no possessive quantifiers — so the DuckDB oracle and
pytest can replay them verbatim.

Redaction replaces each match with a typed placeholder token, longest/most
specific pattern first (emails before phones before IPs) so a redacted span
is never re-matched by a later, looser pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Engine-portable patterns (Java regex == RE2 == Python `re` on these).
# Every quantifier is BOUNDED (RFC 5321 limits: 64-char local part, 255-char
# domain): an unbounded `[...]+@` is quadratic on non-matching character
# runs — each start position rescans the whole run — and a crawl page with
# a 100 KB base64/digit token would take seconds in the kernel
# (measured: 16 s per 100 KB run with the unbounded form, ~10 ms bounded).
# Bounds keep per-position work constant WITHOUT possessive quantifiers,
# which RE2 (the DuckDB oracle) does not support. Oversized local parts
# redact their trailing 64 chars — still scrubbed, and invalid as
# addresses anyway. Linearity pinned by test_pii_patterns_linear_time.
EMAIL_RE = r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"

# (pattern, placeholder) in application order — email first (an address can
# contain digit runs a looser pattern might clip), then phone, then IPv4
# (phone redaction runs before IP so `555-123-4567` can't half-match).
PII_RULES: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, EMAIL_TOKEN),
    (PHONE_RE, PHONE_TOKEN),
    (IPV4_RE, IP_TOKEN),
)


def redact_text_col(text: Column) -> Column:
    """text → text with every PII span replaced by its placeholder, rules
    applied in PII_RULES order (Spark regexp_replace replaces ALL matches)."""
    out = text
    for pattern, token in PII_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> list[Column]:
    """Per-type match counts, counted in the same staged order redaction
    applies (each count runs on the text AFTER the previous rule's
    redaction, so overlapping matches are attributed exactly once, to the
    earlier rule)."""
    cols = []
    staged = text
    for pattern, token in PII_RULES:
        name = token.strip("<>").lower()
        cols.append(F.regexp_count(staged, F.lit(pattern)).alias(f"n_{name}"))
        staged = F.regexp_replace(staged, pattern, token)
    return cols


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Append per-type PII counts and the redacted text. Map-only: no
    shuffle, no Python — scales as a pure scan stage at any corpus size."""
    return df.select(
        "*",
        *pii_counts(F.col(text_col)),
        redact_text_col(F.col(text_col)).alias(out_col),
    )
