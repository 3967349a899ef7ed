"""T-family batch equivalents: event-time windows (SURVEY.md §2.8 T5-T7).

The same ``window()`` / ``session_window()`` expressions run unchanged under
``readStream`` (streaming/pipeline.py adds triggers + watermarks); here they
run as batch queries so the driver's DuckDB oracle can check them exactly.

Spark aligns tumbling/sliding windows to the 1970-01-01 UTC epoch; DuckDB
``time_bucket`` aligns to 2000-01-03 — a whole number of days apart, so for
divisor-of-a-day widths (5 m / 10 m) the grids coincide exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table

T5_ORACLE = """
    SELECT time_bucket(INTERVAL '5 minutes', ts)                        AS window_start,
           time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
           event_type,
           count(*)              AS n,
           round(sum(value), 2)  AS sum_value,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 4)  AS avg_value
    FROM events
    GROUP BY 1, 2, 3
"""


def tumbling_rollup_5min(events: DataFrame) -> DataFrame:
    """Shared t5 aggregation body — the SAME expression tree runs as a
    batch query (t5, DuckDB-oracle-checked) and under ``readStream``
    (streaming/queries.py t5s), which is the point of Structured
    Streaming's unified model."""
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
            "avg_value",
        )
    )


@register("t5_tumbling_5min", family="T5", bench=True, oracle=T5_ORACLE)
def t5_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric 5-minute tumbling rollup — the canonical downstream
    query of the reference's stream (README.rst:6), and the engine's
    flagship/entry query.

    avg is computed as exact-decimal sum ÷ count (one double division),
    not double avg: the source values are 2-decimal quantized, so a true
    average can land exactly ON a round-half boundary at 4 decimals, where
    double accumulation ORDER (which differs between engines and between
    partition counts) decides the rounded cell. The decimal sum is exact
    and order-independent in both engines, so the divided double — and its
    rounding — is bit-identical. (Observed: 1 cell in 39k rows at sf0.1.)
    round(sum, 2) needs no such treatment: accumulated double error
    (~1e-8) cannot reach the 0.005 boundary distance of 2-decimal data."""
    return tumbling_rollup_5min(load_table(spark, sf_dir, "events"))


T6_ORACLE = """
    WITH assigned AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value
        FROM events
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           count(*)             AS n,
           round(sum(value), 2) AS sum_value
    FROM assigned
    GROUP BY 1, 2
"""


def sliding_rollup_10min(events: DataFrame) -> DataFrame:
    """Shared t6 aggregation body (batch t6 + streaming t6s)."""
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "sum_value",
        )
    )


@register("t6_sliding_10min", family="T6", oracle=T6_ORACLE)
def t6_sliding_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 m width / 5 m slide) — every event lands in
    exactly two windows; the oracle materializes that assignment as a
    two-way UNION ALL of shifted 5-minute buckets."""
    return sliding_rollup_10min(load_table(spark, sf_dir, "events"))


T7_ORACLE = """
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sessions AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               min(ts)                          AS session_start,
               max(ts) + INTERVAL '30 minutes'  AS session_end,
               count(*)                         AS n_events,
               round(sum(value), 2)             AS sum_value
        FROM sessions
        GROUP BY user_id, session_id
"""


def user_sessions(events: DataFrame) -> DataFrame:
    """Shared t7 sessionization body (batch t7 + streaming t7s)."""
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register("t7_user_sessions", family="T7", bench=True, oracle=T7_ORACLE)
def t7_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) via ``session_window``.

    Spark merges events whose windows overlap: a new session starts when
    the gap is >= 30 m (strictly-less merges); session end = last event
    + gap. The oracle reproduces exactly that with the classic
    lag/cumulative-sum sessionization."""
    return user_sessions(load_table(spark, sf_dir, "events"))
