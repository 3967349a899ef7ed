"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``prometheus_remote_kinesis_spark.registry``: every operator
from SURVEY.md §2 is registered there as a (queries[k], oracle_sql[k]) pair
(oracle omitted only for genuinely non-SQL-expressible ops — sketches, LSH,
stateful streaming — which take the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from prometheus_remote_kinesis_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: per-metric 5-minute tumbling rollup —
    the canonical downstream query of the reference's record stream
    (/root/reference/README.rst:6)."""
    from prometheus_remote_kinesis_spark.operators.time_windows import t5_tumbling_5min

    return t5_tumbling_5min(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return registry.oracle_sql()
