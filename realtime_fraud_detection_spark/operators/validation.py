"""Data-contract checks — the dbt-test / Deequ idiom as one Spark scan:
declare named row-level invariants as boolean Columns, get back (a) the
violation count per rule and (b) a frame of failing rows tagged with
every rule they broke. Ingest pipelines gate on the summary (fail the
batch when a hard rule fires) and quarantine the violations frame the
same way the corrupt-record readers quarantine unparseable lines.

Shape: ONE pass — every rule evaluates as a projected boolean in the
same scan, the summary is a single aggregate of negated flags, and the
violations frame is a filter over the same projection. R rules never
mean R scans; driver state is one row of counts.

Null semantics: a rule that evaluates to NULL on a row (e.g. a range
check on a NULL column) counts as a VIOLATION — an invariant that
cannot be confirmed is not satisfied. Express "nullable is fine" inside
the rule (`col.isNull() | (col > 0)`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_invariants(
    df: DataFrame,
    rules: dict[str, Column],
    id_cols: list[str] | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """(violations, summary) for named row-level invariants.

    summary maps rule name → number of violating rows (0 for clean
    rules). violations carries `id_cols` (default: every input column)
    plus `failed_rules` (array of the rule names the row broke) — one
    row per violating input row, empty when the contract holds.
    """
    if not rules:
        raise ValueError("need at least one rule")
    keep = list(id_cols) if id_cols else list(df.columns)
    ok = {
        name: F.coalesce(rule.cast("boolean"), F.lit(False))
        for name, rule in rules.items()
    }
    flagged = df.select(
        *keep, *[v.alias(f"_ok_{k}") for k, v in ok.items()]
    )
    row = flagged.agg(
        *[
            F.sum((~F.col(f"_ok_{k}")).cast("long")).alias(k)
            for k in rules
        ]
    ).collect()[0]
    summary = {k: int(row[k] or 0) for k in rules}
    failed = F.filter(
        F.array(
            *[
                F.when(~F.col(f"_ok_{k}"), F.lit(k))
                for k in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    violations = (
        flagged.withColumn("failed_rules", failed)
        .filter(F.size("failed_rules") > 0)
        .select(*keep, "failed_rules")
    )
    return violations, summary
