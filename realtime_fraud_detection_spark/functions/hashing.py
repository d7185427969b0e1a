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


def md5_bigint(col: Column, salt: str | Column | None = None) -> Column:
    """Deterministic 60-bit hash of a string column, optionally salted.
    The salt may be a COLUMN (r14 — lets a per-row salt like the CM depth
    prefix hash in one md5 instead of one per member of a computed array).

    DuckDB equivalent: ``('0x' || substr(md5(salt || x), 1, 15))::BIGINT``.
    """
    if isinstance(salt, Column):
        x = F.concat(salt, col)
    elif salt:
        x = F.concat(F.lit(salt), col)
    else:
        x = col
    return F.conv(F.substring(F.md5(x), 1, HEX_CHARS), 16, 10).cast("bigint")


def md5_bigint_sql(expr: str, salt: str | None = None) -> str:
    """The DuckDB-side rendering of :func:`md5_bigint` for oracle SQL."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"(('0x' || substr(md5({inner}), 1, {HEX_CHARS}))::BIGINT)"


def md5_bigint64(col: Column, salt: str | None = None) -> Column:
    """Full 64-bit deterministic hash (two's-complement signed bigint) from
    all 16 leading md5 hex chars — for signatures that need every bit
    position populated (e.g. 64-bit SimHash, where the 60-bit form leaves
    bits 60-63 permanently unset).

    Built from two 32-bit halves: ``conv`` of the full 16 chars would yield
    an unsigned decimal string that overflows a signed cast for values
    >= 2^63, while ``shiftleft`` on a long wraps into the sign bit exactly
    as two's-complement requires. Still all codegen'd built-ins.
    """
    x = F.concat(F.lit(salt), col) if salt else col
    hx = F.md5(x)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("bigint")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def md5_bigint64_sql(expr: str, salt: str | None = None) -> str:
    """DuckDB rendering of :func:`md5_bigint64`. DuckDB's ``<<`` raises on
    overflow instead of wrapping, so the sign bit is folded in arithmetically:
    hi is re-signed as a 32-bit two's-complement value before scaling."""
    inner = f"'{salt}' || {expr}" if salt else expr
    hi = f"('0x' || substr(md5({inner}), 1, 8))::BIGINT"
    lo = f"('0x' || substr(md5({inner}), 9, 8))::BIGINT"
    return (
        f"((CASE WHEN {hi} >= 2147483648 THEN {hi} - 4294967296 ELSE {hi} END)"
        f" * 4294967296 + {lo})"
    )
