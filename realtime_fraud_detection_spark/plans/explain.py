"""Plan-inspection helpers — the "did Catalyst do what we designed for"
checks (SURVEY §4.2). Used by tests and perf work to assert that:

  * filters/projections reach the parquet scan (PushedFilters / ReadSchema),
  * dimension joins broadcast (BroadcastHashJoin),
  * hot expressions stay inside WholeStageCodegen,
  * no unexpected shuffle (Exchange) appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def exchange_count(df: DataFrame) -> int:
    return sum(
        1
        for line in formatted_plan(df).splitlines()
        if "Exchange" in line and "Reused" not in line and line.strip().startswith(("+- Exchange", "Exchange", "* Exchange"))
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning evidence)."""
    import re

    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [f.split(":")[0] for f in m.group(1).split(",") if f]
