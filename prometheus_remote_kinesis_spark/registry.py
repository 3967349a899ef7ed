"""Query registry — the driver-facing queries()/oracle_sql() contract.

Every operator from SURVEY.md §2 ships as a registered ``Query``: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an equivalent
ANSI-SQL oracle that DuckDB runs on the same parquet tables. The driver
compares row-count + schema + order-insensitive value-hash at sf0.01
(``__spark_entry__.py``), so:

- every computed column is aliased IDENTICALLY in both forms;
- float aggregates are rounded IDENTICALLY in both forms (double addition is
  order-dependent; rounding collapses the ulp-level divergence between
  Spark's and DuckDB's accumulation orders);
- LIMIT/top-k queries order by a unique tie-break key in both forms.

Operators with no SQL-expressible oracle (sketches, LSH, stateful
streaming) register with ``oracle=None`` → driver's weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import (one per SURVEY.md §2 family).
_QUERY_MODULES = [
    "prometheus_remote_kinesis_spark.operators.relational",
    "prometheus_remote_kinesis_spark.operators.joins",
    "prometheus_remote_kinesis_spark.operators.aggregates",
    "prometheus_remote_kinesis_spark.operators.windows",
    "prometheus_remote_kinesis_spark.operators.setops",
    "prometheus_remote_kinesis_spark.functions.scalar",
    "prometheus_remote_kinesis_spark.functions.pandas_udfs",
    "prometheus_remote_kinesis_spark.operators.time_windows",
    "prometheus_remote_kinesis_spark.ingest_queries",
    "prometheus_remote_kinesis_spark.streaming.queries",
    "prometheus_remote_kinesis_spark.llm.dedup",
    "prometheus_remote_kinesis_spark.llm.similarity",
    "prometheus_remote_kinesis_spark.llm.text",
    "prometheus_remote_kinesis_spark.llm.multimodal",
    "prometheus_remote_kinesis_spark.llm.pipeline",
]


@dataclass(frozen=True)
class Query:
    name: str
    family: str  # SURVEY.md §2 row id, e.g. "A1", "J6", "L2"
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}
_LOADED = False


def register(
    name: str, family: str, oracle: str | None = None, bench: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a driver-checkable query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, family=family, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items() if q.bench}
