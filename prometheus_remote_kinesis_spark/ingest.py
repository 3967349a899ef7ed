"""Layer A ingest: prompb WriteRequest → flat metric records.

Re-expresses ``parseRecords`` (``/root/reference/prometheus.go:10-37``) as a
declarative DataFrame transform — no row-at-a-time Python. Semantics pinned
to the reference, each cited:

- label-map build: ``[]prompb.Label`` → ``map[string]string``
  (prometheus.go:14-17) → ``map_from_entries``.
- name projection: ``Name = labels["__name__"]``, empty string when the
  label is absent (prometheus.go:19) → ``element_at`` + ``coalesce('')``.
- sample flatten: one row per (series × sample), the full label map copied
  onto every row (prometheus.go:25-34) → ``explode``.
- empty-series passthrough: a series with zero samples still emits ONE
  labels-only row with ``time = 0`` and NULL ``value``
  (prometheus.go:20-23) → ``explode_outer`` + ``coalesce(time, 0)``.
- NaN→NULL: Prometheus stale-marker NaN becomes JSON null
  (prometheus.go:28-32; marshal side record.go:21-27) → explicit
  ``isnan`` coercion (Spark distinguishes NaN from NULL, so this must be
  explicit exactly like the Go code).

Scale note: the transform is narrow (no shuffle) — explode + projection
pipelines inside a single WholeStageCodegen stage, so ingest parallelism
equals source parallelism at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nan_to_null(col: Column) -> Column:
    """NaN → NULL, exactly ``prometheus.go:28-32`` (JSON has no NaN)."""
    return F.when(F.isnan(col), F.lit(None).cast("double")).otherwise(col)


def flatten_write_requests(df: DataFrame, timeseries_col: str = "timeseries") -> DataFrame:
    """``WriteRequest`` rows → RECORD_SCHEMA rows (name, time, value, labels).

    Input: a DataFrame with ``timeseries_col`` of
    ``array<struct<labels: array<struct<name,value>>, samples: array<struct<value,timestamp>>>>``
    (see ``schema.WRITE_REQUEST_SCHEMA``). Output columns exactly
    RECORD_SCHEMA, field order preserved for wire fidelity.
    """
    series = df.select(F.explode(F.col(timeseries_col)).alias("ts"))
    exploded = series.select(
        F.map_from_entries(F.col("ts.labels")).alias("labels"),
        # explode_outer keeps the zero-sample series as one row with a NULL
        # sample — the reference's labels-only record (prometheus.go:20-23).
        F.explode_outer(F.col("ts.samples")).alias("sample"),
    )
    return exploded.select(
        F.coalesce(F.element_at(F.col("labels"), "__name__"), F.lit("")).alias("name"),
        F.coalesce(F.col("sample.timestamp"), F.lit(0).cast("long")).alias("time"),
        nan_to_null(F.col("sample.value")).alias("value"),
        F.col("labels"),
    )


def records_from_columns(
    df: DataFrame,
    name: Column,
    time_ms: Column,
    value: Column,
    labels: Column,
) -> DataFrame:
    """Assemble RECORD_SCHEMA rows from arbitrary source columns.

    Applies the same NaN→NULL and missing-name normalization as the full
    ingest path, so any table (e.g. the driver's ``events``) can be lifted
    into the record model.
    """
    return df.select(
        F.coalesce(name, F.lit("")).alias("name"),
        F.coalesce(time_ms, F.lit(0).cast("long")).alias("time"),
        nan_to_null(value.cast("double")).alias("value"),
        labels.alias("labels"),
    )
