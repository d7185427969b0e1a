"""Multi-dimensional data layout (Z-order clustering) for scan pruning.

THE 100 TB lever this repo's other operators assume: parquet scans prune
at file/row-group granularity from footer min/max stats, but stats only
bind when the data is CLUSTERED on the filtered columns. A corpus sorted
by one key prunes that key only; training-data scans filter on several
(language AND quality band AND date; user AND merchant) — exactly the
multi-column case Z-ordering serves (Delta's OPTIMIZE ZORDER BY,
Iceberg's sort-order rewrite; Morton 1966). Interleaving the bits of the
rank-quantized columns gives a single sort key whose locality is shared
across dimensions: a box predicate touches O(few) files instead of all
of them, in every filtered dimension at once.

Spark-first shape: the key is a pure bit-arithmetic Column (codegen'd —
no UDF), the layout is one `repartitionByRange` on the key (the only
shuffle) + `sortWithinPartitions`, and the bounds used for quantization
are a one-pass min/max aggregate (driver state: 2 floats per column —
at production scale pass fixed domain bounds instead and skip the pass).
Everything downstream is ordinary parquet: no index, no sidecar — the
pruning lives in the footers every engine already reads.

A Hilbert curve (Iceberg's other option) has marginally better locality
but needs stateful bit transposition that no longer folds into plain
column arithmetic; Z-order captures most of the skip rate at none of the
cost, which is why it is also Delta's default. Tests pin the skip-rate
advantage over single-column layouts from the written files' actual
footer statistics (tests/test_layout.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZKEY = "_zkey"


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One-pass (min, max) per layout column — the quantization domain.
    Driver state is 2 floats per column. At 100 TB either run it (one
    map-side-combined aggregate) or pass known domain bounds to
    :func:`with_zorder_key` and skip the scan entirely."""
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{c}") for c in cols],
    ).first()
    return {c: (row[f"_mn_{c}"], row[f"_mx_{c}"]) for c in cols}


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Rank-quantize a numeric column into [0, 2^bits): linear over the
    [lo, hi] domain, clamped (values outside the declared bounds land on
    the edge cells — correct for pruning, which only needs monotonicity).
    NULLs quantize to 0: they cluster into the lowest files rather than
    scattering everywhere (a NULL-filter then prunes to those files)."""
    top = (1 << bits) - 1
    if lo is not None and hi is not None and hi < lo:
        # inverted bounds can only come from caller-supplied `bounds` (a
        # computed min/max always has lo <= hi) — a swapped tuple would
        # silently flatten this dimension to a constant, destroying its
        # clustering with no signal, so it's an error, not a degenerate
        raise ValueError(f"inverted bounds: hi={hi} < lo={lo}")
    if lo is None or hi is None or hi - lo <= 0:
        # all-NULL or constant column — contributes nothing to the order
        return F.lit(0).cast("bigint")
    span = hi - lo
    q = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top + 1))
    # NULL must be handled with an explicit branch: greatest/least SKIP
    # nulls (greatest(0, NULL) = 0 but least(top, NULL) = top — a null
    # input would quantize to the TOP cell, not the bottom)
    return (
        F.when(col.isNull(), F.lit(0))
        .otherwise(F.greatest(F.lit(0), F.least(F.lit(top), q)))
        .cast("bigint")
    )


def zorder_key(
    quantized: list[Column],
    bits: int,
) -> Column:
    """Interleave the bits of the quantized columns (Morton code): bit i
    of column j lands at position i*k + j, so every column contributes
    to every level of the sort hierarchy. Pure bigint shift/mask
    arithmetic — k*bits terms, whole-stage-codegen'd, and k*bits must
    stay <= 63 (signed bigint; the key is never negative)."""
    k = len(quantized)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds the 63-bit key")
    terms = [
        F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * k + j)
        for i in range(bits)
        for j, q in enumerate(quantized)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Append the Z-order key column (`_zkey`). `bounds` overrides the
    one-pass min/max scan — the production path when the domain is known
    (dates, scores in [0,1], hash buckets)."""
    bounds = bounds or column_bounds(df, cols)
    qs = [_quantize(F.col(c), *bounds[c], bits) for c in cols]
    return df.withColumn(_ZKEY, zorder_key(qs, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write `df` as `n_files` parquet files clustered on the Z-order of
    `cols`: one range shuffle on the key (range, not hash — files must
    own disjoint key intervals for footer min/max to bind), an in-task
    sort, and a plain parquet write (each range partition emits one
    file). The key column itself is dropped — the clustering is carried
    entirely by the footer stats of the layout columns.

    Scale: RangePartitioner's boundary sampling is one extra pass over
    the key expression; skewed keys cost nothing (boundaries equalize
    rows per file). Pick `n_files` as data_size / target_file_size
    (~256 MB-1 GB at corpus scale)."""
    (
        with_zorder_key(df, cols, bits=bits, bounds=bounds)
        .repartitionByRange(n_files, F.col(_ZKEY))
        .sortWithinPartitions(_ZKEY)
        .drop(_ZKEY)
        .write.mode("overwrite")
        .parquet(path)
    )
