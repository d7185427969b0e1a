"""Portable (cross-engine deterministic) hashing helpers.

Spark's xxhash64/murmur and DuckDB's hash() disagree, so every operator whose
output must hash-match the DuckDB oracle builds its hashes from md5 — identical
everywhere — truncated to 60 bits (15 hex chars, safely inside a signed int64).

At scale this stays JVM-side: `md5`, `substring`, `conv` are all codegen'd
built-ins; no Python is involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex chars = 60 bits < 63, so the bigint is always non-negative.
HEX_CHARS = 15


def md5_bigint(col: Column, salt: str | None = None) -> Column:
    """Deterministic 60-bit hash of a string column, optionally salted.

    DuckDB equivalent: ``('0x' || substr(md5(salt || x), 1, 15))::BIGINT``.
    """
    x = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(x), 1, HEX_CHARS), 16, 10).cast("bigint")


def md5_bigint_sql(expr: str, salt: str | None = None) -> str:
    """The DuckDB-side rendering of :func:`md5_bigint` for oracle SQL."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"(('0x' || substr(md5({inner}), 1, {HEX_CHARS}))::BIGINT)"
