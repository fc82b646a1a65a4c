"""PII scrubbing + text normalization — pure Column expressions for the
training-data curation pass (scrub before dedup/training, normalize
before hashing).

Regexes are deliberately alternation-free and anchored by literal
structure so Java regex (Spark) and RE2 (DuckDB oracle) agree: RE2 is
leftmost-longest while Java is leftmost-greedy, and the two diverge on
ambiguous alternations — these patterns have none.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pattern, replacement token — applied in order
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\d{3}-\d{2}-\d{4}", "[SSN]"),
    (r"\+?\d{1,2}-\d{3}-\d{3}-\d{4}", "[PHONE]"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "[IP]"),
    (r"https?://[^\s]+", "[URL]"),
)


def scrub_pii(text: Column) -> Column:
    """Replace emails, SSNs, phone numbers, IPv4s, and URLs with typed
    placeholder tokens. Order matters: emails before phones so the
    digits in a mailbox name can't be half-eaten."""
    out = text
    for pattern, token in PII_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (for curation reporting / gating)."""
    names = ("emails", "ssns", "phones", "ips", "urls")
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast("long")
        for name, (pattern, _) in zip(names, PII_RULES)
    }


def normalize_text(text: Column) -> Column:
    """Canonical form for dedup hashing: lowercase, punctuation→space,
    whitespace collapsed, trimmed. Deterministic and locale-free."""
    lowered = F.lower(text)
    depunct = F.regexp_replace(lowered, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(depunct, r"\s+", " "))


def scrub_sql(col: str) -> str:
    """DuckDB equivalent of :func:`scrub_pii` (needs the 'g' flag)."""
    out = col
    for pattern, token in PII_RULES:
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out


def normalize_sql(col: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}), "
        f"'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
    )
