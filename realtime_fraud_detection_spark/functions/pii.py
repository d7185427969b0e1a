"""PII detection and redaction for training-data pipelines.

A regex bank over the classes a pre-training corpus scrub cares about
(emails, phone numbers, IPv4 addresses, SSNs, credit-card numbers), as
pure JVM-side expressions (`regexp_count` / chained `regexp_replace`) —
no UDFs, so the scan stays inside whole-stage codegen and the patterns
push through column pruning like any other projection.

Patterns are deliberately RE2-compatible (no backreferences or
lookaround) so the DuckDB oracle runs the IDENTICAL pattern: Java regex
and RE2 agree on this subset, which is what makes the counts and the
redacted-text hash bit-exact cross-engine.

Pattern order matters for redaction: longer/more-specific classes first
(a credit card contains phone-shaped digit runs only if a shorter class
could match inside it — these patterns are mutually disjoint, but the
order is fixed so the output is well-defined regardless).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: most specific first; all RE2- and Java-regex compatible
PII_PATTERNS: dict[str, str] = {
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts, e.g. ``{"email": n_emails, ...}``."""
    return {k: F.regexp_count(text, F.lit(p)) for k, p in PII_PATTERNS.items()}


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its class placeholder (``[EMAIL]``,
    ``[PHONE]``, ...), applying the bank in declaration order."""
    out = text
    for k, p in PII_PATTERNS.items():
        out = F.regexp_replace(out, p, f"[{k.upper()}]")
    return out


def pii_count_sql(expr: str, key: str) -> str:
    """DuckDB rendering of one class count."""
    return f"len(regexp_extract_all({expr}, '{PII_PATTERNS[key]}'))"


def redact_pii_sql(expr: str) -> str:
    """DuckDB rendering of :func:`redact_pii` (global replace per class,
    same order)."""
    out = expr
    for k, p in PII_PATTERNS.items():
        out = f"regexp_replace({out}, '{p}', '[{k.upper()}]', 'g')"
    return out
