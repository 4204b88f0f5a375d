"""Physical-plan inspection (SURVEY.md §4: the optimizer work is Catalyst's;
our job is to verify the plans are the ones we'd want and keep them that way).

Used by tests/test_plans.py to pin plan properties:
- dimension joins stay broadcast (no fact-table shuffle),
- scans prune columns (ReadSchema ⊂ table schema) and push filters,
- no row-at-a-time Python UDFs (BatchEvalPython) anywhere; Arrow-batched
  (ArrowEvalPython / MapInPandas) only where multimodal needs Python,
- shuffle (Exchange) counts don't regress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries (Exchange operators; AQE may later
    coalesce them, this counts the static plan). Counts only the detail
    headers '(N) Exchange' — formatted explain also repeats nodes in the
    summary tree."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange", line.strip())
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_row_python_udf(df: DataFrame) -> bool:
    """True if the plan contains a row-at-a-time Python UDF (the slow path —
    BatchEvalPython); Arrow-batched nodes don't count."""
    return "BatchEvalPython" in formatted_plan(df)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning evidence)."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip())
    return cols


def pushed_filters(df: DataFrame) -> str:
    import re

    plan = formatted_plan(df)
    return "; ".join(m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan))
