"""Time-series resampling and gap filling — the hypertable-style operator
family (continuous-aggregate rollups live in suite/eventtime_q.py and
streaming/sinks.py; this module adds the regular-grid form).

The reference keeps per-entity rolling state in Redis sorted sets and
recomputes velocity on demand (RedisService.java rolling counters) — it has
no notion of a regular time grid. Gap filling is what a downstream
forecasting/feature consumer needs: a dense per-key bucket spine with
carried-forward or interpolated values.

Scale design: the spine is generated per key with `sequence()` over that
key's own [min_bucket, max_bucket] span — rows produced = active span /
step per key, never a cross join against a global calendar. The generator
expression is two scalar columns (cheap — safe under Generate's
per-output-element re-evaluation, see CLAUDE.md). Fill is one
key-partitioned ordered window over the spine: same single-shuffle shape
as any per-entity window feature, so a 1000-executor run distributes by
key exactly like the rest of the window library.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "15 minutes",
    agg: str = "avg",
) -> DataFrame:
    """Aggregate an irregular series onto an epoch-aligned regular grid:
    one row per (key, bucket) that has data. `agg` ∈ {avg, sum, min, max,
    count, last}. avg/sum go through DECIMAL (exact, order-insensitive —
    suite determinism rule); `last` tie-breaks by (ts, value) max-struct so
    it is deterministic without a sort."""
    bucket = F.window(ts_col, step)["start"].alias("bucket")
    g = df.groupBy(F.col(key), bucket)
    dec = F.sum(F.col(value_col).cast("decimal(18,2)"))
    if agg == "avg":
        # double(decimal sum) / count, NOT decimal division — Spark and
        # DuckDB disagree on result scale/rounding of decimal division
        out = g.agg(
            (dec.cast("double") / F.count(value_col)).alias(value_col)
        )
    elif agg == "sum":
        out = g.agg(dec.cast("double").alias(value_col))
    elif agg in ("min", "max", "count"):
        out = g.agg(getattr(F, agg)(value_col).alias(value_col))
    elif agg == "last":
        out = g.agg(
            F.max(F.struct(ts_col, value_col))[value_col].alias(value_col)
        )
    else:
        raise ValueError(f"unsupported agg: {agg}")
    return out


def gap_fill(
    bucketed: DataFrame,
    key: str,
    bucket_col: str = "bucket",
    value_col: str = "value",
    step: str = "15 minutes",
    interpolate: bool = True,
) -> DataFrame:
    """Densify a bucketed series: emit EVERY step-bucket between each key's
    first and last observed bucket, with

      * ``<value>``        — the observed value (NULL in gaps),
      * ``<value>_ffill``  — last observation carried forward,
      * ``<value>_interp`` — linear interpolation between the surrounding
        observations (only when ``interpolate=True``; equals the
        observation where one exists, stays NULL before the first one),
      * ``is_gap``         — whether the bucket was absent in the input.

    Interpolation divides by the surrounding-observation time delta, so the
    result is rounded to 6 dp (cross-engine transcendental rule)."""
    span = bucketed.groupBy(key).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    # Stage the spine array BEFORE the explode (r14): Generate re-evaluates
    # its generator expression per OUTPUT element, so exploding a computed
    # sequence() is O(span_length²) per key — harmless on short spans, a
    # scale killer for a key spanning years (35k buckets → 1.2e9 sequence()
    # builds). The span table is keys-sized, so materializing it with the
    # arrays attached is model-sized; the explode then iterates a stored
    # array (O(span_length)). Streaming frames can't checkpoint — they keep
    # the inline form (bounded spans under a watermark).
    seq = F.sequence(F.col("_mn"), F.col("_mx"), F.expr(f"interval {step}"))
    if bucketed.isStreaming:
        spine = span.select(key, F.explode(seq).alias(bucket_col))
    else:
        staged = span.select(key, seq.alias("_spine")).localCheckpoint(
            eager=False
        )
        spine = staged.select(key, F.explode("_spine").alias(bucket_col))
    dense = spine.join(bucketed, [key, bucket_col], "left").withColumn(
        "is_gap", F.col(value_col).isNull()
    )
    w_back = (
        Window.partitionBy(key)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = dense.withColumn(
        f"{value_col}_ffill", F.last(value_col, ignorenulls=True).over(w_back)
    )
    if not interpolate:
        return out
    # the forward-looking "next observation" runs over a DESCENDING sort
    # with an unbounded-PRECEDING frame: Spark evaluates
    # (currentRow, unboundedFollowing) frames non-incrementally — the
    # aggregate recomputes from scratch per row, O(n²) per key (measured
    # 18 s → 2.6 s on a 920k-row spine at sf0.1; 115 s → 7 s at 10x).
    # last(ignorenulls) over the reversed prefix is the same value.
    w_rev = (
        Window.partitionBy(key)
        .orderBy(F.col(bucket_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_v = F.last(value_col, ignorenulls=True).over(w_back)
    prev_t = F.last(
        F.when(~F.col("is_gap"), F.col(bucket_col)), ignorenulls=True
    ).over(w_back)
    next_v = F.last(value_col, ignorenulls=True).over(w_rev)
    next_t = F.last(
        F.when(~F.col("is_gap"), F.col(bucket_col)), ignorenulls=True
    ).over(w_rev)
    # cast through TIMESTAMP: unix_micros rejects TIMESTAMP_NTZ inputs, and
    # only the differences are used, so the session-zone reinterpretation
    # cancels out
    def _us(c: Column) -> Column:
        return F.unix_micros(c.cast("timestamp"))

    frac = (_us(F.col(bucket_col)) - _us(prev_t)) / (_us(next_t) - _us(prev_t))
    # explicit floor-based half-up rounding to 6 dp: engine round() tie
    # handling differs between Spark (decimal HALF_UP) and DuckDB (binary)
    # and interpolation of 2-dp inputs lands on exact .xxxxxx5 ties often;
    # floor(x*1e6 + 0.5)/1e6 is bit-deterministic given identical input
    # doubles (values are non-negative here)
    lerp = prev_v + (next_v - prev_v) * frac
    interp = (
        F.when(~F.col("is_gap"), F.col(value_col))
        .when(next_v.isNull(), prev_v)  # trailing gap: carry forward
        .when(prev_v.isNotNull(), F.floor(lerp * 1e6 + 0.5) / 1e6)
    )
    return out.withColumn(f"{value_col}_interp", interp)


_STEP_UNITS_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _parse_step_us(step: str) -> int:
    n, unit = step.split()
    return int(n) * _STEP_UNITS_US[unit.rstrip("s")]


def time_weighted_avg(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Time-weighted average per (key, bucket) with last-observation-
    carried-forward weighting (the hypertable `time_weight('LOCF')`
    aggregate): each observation's value holds from its timestamp until
    the NEXT observation of the same key, the hold segment is split
    across every step-bucket it spans, and each bucket averages the
    values weighted by held duration within that bucket. The trailing
    observation (no successor) contributes a point reading to its own
    bucket via a zero-length segment handled as a 1-µs floor.

    Scale: one key-partitioned window (lead), then the same
    sequence()-explode spine as :func:`gap_fill` bounded by segment
    span / step, then one (key, bucket) aggregate — no range join.
    Division result is floor-rounded to 6 dp (cross-engine round-tie
    rule). Returns (key, bucket, twa, n_obs, covered_us).
    """
    step_us = _parse_step_us(step)
    step_us_expr = F.expr(f"interval {step}")
    w = Window.partitionBy(key).orderBy(ts_col)
    seg = df.select(
        F.col(key),
        # normalize to TIMESTAMP so comparisons against the (timestamp)
        # bucket column type-check for TIMESTAMP_NTZ inputs too
        F.col(ts_col).cast("timestamp").alias("_s"),
        F.coalesce(F.lead(ts_col).over(w), F.col(ts_col))
        .cast("timestamp")
        .alias("_e"),
        F.col(value_col).alias("_v"),
    )

    def _bucket(c: str) -> Column:
        # epoch-aligned floor — the same assignment window() makes, but
        # expressible twice in one projection (Spark rejects multiple
        # window() time expressions per select)
        us = F.unix_micros(F.col(c).cast("timestamp"))
        return F.timestamp_micros((us - us % step_us))

    seg = seg.select(
        key, "_s", "_e", "_v", _bucket("_s").alias("_b0"), _bucket("_e").alias("_b1")
    )
    spans = seg.select(
        key,
        "_s",
        "_e",
        "_v",
        F.explode(F.sequence(F.col("_b0"), F.col("_b1"), step_us_expr)).alias(
            "bucket"
        ),
    )

    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    bucket_end = F.col("bucket") + step_us_expr
    ov_start = F.greatest(F.col("_s"), F.col("bucket"))
    ov_end = F.least(F.col("_e"), bucket_end)
    # 1-µs floor ONLY for genuinely zero-length (trailing) segments — a
    # normal segment ending exactly on a bucket boundary must contribute
    # nothing to that boundary bucket, not a phantom microsecond
    zero_len = F.col("_s") == F.col("_e")
    weight_us = F.when(zero_len, F.lit(1)).otherwise(_us(ov_end) - _us(ov_start))
    # the weighted sum goes through DECIMAL (exact, order-insensitive —
    # suite determinism rule, same as resample): a double SUM(v * w_us)
    # depends on partial-agg accumulation order, which Spark does not fix.
    # decimal(12,2) * bigint stays within decimal-38 headroom exactly.
    wsum = F.sum(F.col("_v").cast("decimal(12,2)") * weight_us).cast("double")
    return (
        spans.filter(zero_len | (_us(ov_end) > _us(ov_start)))
        .groupBy(key, "bucket")
        .agg(
            (F.floor((wsum / F.sum(weight_us)) * 1e6 + 0.5) / 1e6).alias("twa"),
            F.count("*").alias("n_segments"),
            F.sum(weight_us).alias("covered_us"),
        )
    )


def seasonal_anomalies(
    series: DataFrame,
    key: str,
    bucket_col: str = "bucket",
    value_col: str = "value",
    baseline_until=None,
    phase: Column | None = None,
    z: float = 3.5,
) -> DataFrame:
    """Robust seasonal anomaly scores over a resampled series — the
    monitoring alarm on top of :func:`resample`: per (key, seasonal
    phase) the BASELINE window (buckets <= `baseline_until`, an explicit
    split so a spike never launders itself into its own baseline) yields
    a median and MAD; later buckets score
    |x − median| / (1.4826·MAD + eps), flagged above `z` (3.5 is the
    conventional robust-z cut, Iglewicz & Hoaglin '93).

    `phase` defaults to hour-of-day (daily seasonality for sub-daily
    buckets); pass e.g. ``F.dayofweek(F.col("bucket"))`` for weekly.
    Median/MAD are exact interpolated percentiles computed as two
    aggregations over the baseline (groups = |keys|·|phases| rows — tiny)
    joined back to the scored window; nothing here sorts the series, so
    the shape survives any corpus size. Medians are per-(key, phase)
    robust statistics — MAD 0 (constant baseline) makes any deviation
    score infinite, which is the correct alarm for a flatlined metric
    that moved; eps only guards the 0/0 row.
    """
    if baseline_until is None:
        raise ValueError("baseline_until is required (the train/score split)")
    ph = (phase if phase is not None else F.hour(F.col(bucket_col))).alias(
        "_phase"
    )
    base = series.filter(F.col(bucket_col) <= F.lit(baseline_until)).select(
        F.col(key), ph, F.col(value_col).alias("_v")
    )
    med = base.groupBy(key, "_phase").agg(
        F.expr("percentile(_v, 0.5)").alias("_med"),
        F.count(F.lit(1)).alias("n_baseline"),
    )
    mad = (
        base.join(med, [key, "_phase"])
        .groupBy(key, "_phase")
        .agg(F.expr("percentile(abs(_v - _med), 0.5)").alias("_mad"))
    )
    stats = med.join(mad, [key, "_phase"])
    scored = series.filter(F.col(bucket_col) > F.lit(baseline_until)).select(
        F.col(key), ph, F.col(bucket_col), F.col(value_col)
    )
    dev = F.abs(F.col(value_col) - F.col("_med"))
    denom = F.lit(1.4826) * F.col("_mad")
    # a (key, phase) with no baseline history scores NULL (unknown), not
    # 0 — the when-chain would otherwise fall through null conditions to
    # the 0.0 branch and silently declare novel phases normal
    score = F.when(
        F.col("_med").isNull(), F.lit(None).cast("double")
    ).when(denom > 0, dev / denom).otherwise(
        F.when(dev > 0, F.lit(float("inf"))).otherwise(F.lit(0.0))
    )
    return (
        scored.join(stats, [key, "_phase"], "left")
        .select(
            key,
            bucket_col,
            value_col,
            F.col("_phase").alias("phase"),
            F.col("_med").alias("expected"),
            F.col("n_baseline"),
            score.alias("score"),
            (score > z).alias("is_anomaly"),
        )
    )


def time_decayed_sum(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_col: str | None = "value",
    half_life: str = "1 hour",
    out_col: str = "decayed_sum",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Exponentially time-decayed running aggregate over IRREGULAR event
    times — the recency-weighted refinement of a fixed-window velocity
    counter (an event 3 half-lives ago contributes 1/8th, not 1 or 0):

        v(t_i) = Σ_{j <= i} x_j · 2^(−(t_i − t_j) / half_life)

    `value_col=None` sums 1 per event (a decayed COUNT). Appends
    `out_col` to every input row.

    Shape: NO recurrence and NO Python — the prefix factorization
    v(t_i) = 2^(−(t_i−t0)/H) · Σ_{j<=i} x_j·2^((t_j−t0)/H), with t0 the
    key's first event, turns the decay into ONE unbounded-preceding
    running sum over the same per-key sort every other window feature
    shares (incremental frame — the cheap direction; the forward-looking
    O(n²) trap does not apply). At 100 TB this is one shuffle on the key,
    identical to last_n/rolling_profile.

    Numerics: the staged exponent is bounded by (key's time span)/H —
    doubles overflow past ~1023 half-lives of span (e.g. H=1 hour → 42
    days). The limit is ENFORCED, not just documented: a per-key span
    check (max−min over the same key window the factorization already
    computes — no extra job, no extra sort) raises with guidance instead
    of silently emitting inf/NaN rows. Size H to the feature's horizon,
    or pre-bucket epochs, for longer histories. Rows at equal (key, ts)
    need `tiebreak_cols` for a fully deterministic accumulation order.
    """
    h_us = float(_parse_step_us(half_life))
    ticks = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w_all = Window.partitionBy(key)
    w_run = (
        Window.partitionBy(key)
        .orderBy(*ticks)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double")
    rel = (t - F.min(t).over(w_all)) / F.lit(h_us)
    span = (F.max(t).over(w_all) - F.min(t).over(w_all)) / F.lit(h_us)
    # assert_true returns NULL when the predicate holds and raises the
    # message otherwise — the when() keeps it in the plan per row without
    # perturbing the output value or type
    guard = F.assert_true(
        span <= 1000.0,
        F.lit(
            f"time_decayed_sum: a key's time span exceeds 1000 half-lives "
            f"(half_life={half_life}) — the staged 2^x term would overflow "
            f"double to inf. Use a larger half_life or segment epochs."
        ),
    )
    x = F.lit(1.0) if value_col is None else F.col(value_col).cast("double")
    staged = x * F.pow(F.lit(2.0), rel)
    return df.withColumn(
        out_col,
        F.when(guard.isNull(), F.pow(F.lit(2.0), -rel) * F.sum(staged).over(w_run)),
    )
