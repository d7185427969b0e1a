"""Pure-expression Bloom filter — a fixed-size set sketch for map-side
membership probes (Bloom CACM'70; double hashing per Kirsch &
Mitzenmacher ESA'06).

Why here: the decontamination / set-probe operators broadcast the probe
set exactly (`operators/quality.contamination_stats`), which is right
while the eval-gram set is small. When the probe set grows to hundreds of
millions of keys, the exact broadcast stops fitting; a Bloom filter
caps the broadcast at m/8 bytes chosen up front, with a false-POSITIVE
rate you pick — and for decontamination a false positive only
over-flags a training doc (the safe direction). Spark's own runtime
bloom pruning (`bloom_filter_agg` / `might_contain`) is not exposed as a
public SQL routine in this build, so this module re-expresses the sketch
with engine-portable md5 hashing and plain integer/bit expressions:

* BUILD is distributed: each key expands to k bit positions, positions
  group into 64-bit words, and `bit_or` aggregates each word — map-side
  combined, shuffling only (word_idx, word) pairs. The collected bitmap
  is m/64 longs — MODEL-sized (chosen, not data-sized), the same
  "train small, apply as a scan" shape as the LSH planes and quantizer
  grids.
* PROBE folds the bitmap into the plan as ONE array<long> literal and
  tests the k bits with `getbit` — zero joins, zero Python, fully
  codegen'd.

Determinism: positions derive from two salted md5s (the engine-wide
portable hash), so the bitmap is bit-identical on any engine or
partitioning — pinned by a pure-Python replay test.

Arithmetic stays overflow-safe under ANSI mode: both hashes reduce mod m
BEFORE the double-hash combination, so h1 + i*h2 never leaves [0, (k+1)m]
— no 64-bit wrap, no ANSI ARITHMETIC_OVERFLOW.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import md5_bigint


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for `n_items` keys at false-positive rate
    `fpp`: m = -n·ln p / (ln 2)², k = (m/n)·ln 2. m rounds up to a
    multiple of 64 (whole words)."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0,1): {fpp}")
    n = max(1, n_items)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(
    col: Column, m_bits: int, k: int, portable: bool = True
) -> list[Column]:
    """k bit positions in [0, m_bits) via double hashing: pos_i =
    (h1 + i·h2) mod m with h2 forced non-zero (never 0, so the k probes
    never collapse onto one position).

    portable=True hashes with salted md5 — bit-identical on any engine
    (required when the bitmap itself is an artifact another engine may
    probe, e.g. decontamination). portable=False uses xxhash64 with two
    seed variants on the RAW column (no string cast) — ~5× cheaper per
    probe and exactly as correct when build and probe happen inside the
    same Spark job (the runtime join-pruning case): the sketch's law is
    no-false-negatives for ANY fixed hash pair."""
    if portable:
        h1 = F.pmod(md5_bigint(col, salt="bloomA:"), F.lit(m_bits))
        h2 = (
            F.pmod(md5_bigint(col, salt="bloomB:"), F.lit(max(1, m_bits - 1)))
            + 1
        )
    else:
        h1 = F.pmod(F.xxhash64(col), F.lit(m_bits))
        h2 = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(max(1, m_bits - 1))) + 1
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_build(
    keys: DataFrame, col: str, m_bits: int, k: int, portable: bool = True
) -> list[int]:
    """Distributed bitmap build → m_bits/64 longs on the driver.

    One explode (k positions per key) + one map-side-combined `bit_or`
    shuffle keyed by word index (at most m/64 distinct keys). The
    result is the sketch itself — pass it to
    :func:`bloom_might_contain`."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64: {m_bits}")
    pos = F.explode(
        F.array(*_positions(F.col(col), m_bits, k, portable))
    ).alias("p")
    words = (
        keys.select(pos)
        .select(
            F.floor(F.col("p") / 64).cast("int").alias("w"),
            F.pmod(F.col("p"), F.lit(64)).cast("int").alias("b"),
        )
        .select("w", F.expr("shiftleft(1L, b)").alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .collect()
    )
    sparse = {r["w"]: r["word"] for r in words}
    return [sparse.get(i, 0) for i in range(m_bits // 64)]


def bloom_might_contain(
    bitmap: list[int], col: Column, k: int, portable: bool = True
) -> Column:
    """Boolean probe column: true iff all k bits for `col` are set.

    The bitmap folds in as a single array<long> literal (one plan node
    regardless of size); each probe is 2 md5s + k getbit lookups, all
    JVM-side. No false negatives ever; false positives at the rate the
    (m, k) choice bought."""
    m_bits = len(bitmap) * 64
    arr = F.lit(bitmap)
    cond = F.lit(True)
    for p in _positions(col, m_bits, k, portable):
        word = F.element_at(arr, (F.floor(p / 64) + 1).cast("int"))
        cond = cond & (F.getbit(word, F.pmod(p, F.lit(64)).cast("int")) == 1)
    return cond
