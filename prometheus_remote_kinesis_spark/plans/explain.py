"""Physical-plan introspection (SURVEY.md §4, M6).

At 100 TB the plan IS the performance: a filter that doesn't reach the
parquet scan re-reads the lake; a dimension join that degrades to
sort-merge shuffles the fact table. These helpers make plan properties
assertable so tests/test_plans.py pins them — regressions in plan shape
fail CI, not the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')``
    prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if at least one scan received pushed-down predicates."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "[]" not in line.split(":", 1)[-1]:
            return True
    return False


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema lines — what each parquet scan actually reads (column
    pruning check)."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema:" in line
    ]


def uses(df: DataFrame, operator: str) -> bool:
    """True if the physical plan contains the named operator (e.g.
    'BroadcastHashJoin', 'TakeOrderedAndProject', 'WindowGroupLimit')."""
    return operator in formatted_plan(df)
